import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from local_search_engine_spark.session import get_spark

    s = get_spark("lse-tests", cores=8, shuffle_partitions=8, driver_memory="16g")
    yield s
    s.stop()
