"""Registry lint (r05, VERDICT #2): the driver's correctness gate
canonicalizes each queries() output with a pandas multi-column sort,
which crashes (TypeError: unhashable type) on array/map/struct cells.
Three r04 gates shipped with array columns and erred at the driver even
though their values were correct. This lint makes that class of bug a
local test failure:

  * lint_schema() rejects any ArrayType / MapType / StructType column;
  * the full queries() registry must lint clean at sf0.001;
  * a deliberately array-typed dummy gate must FAIL the lint (so the
    lint itself is known-live);
  * the driver-faithful canon in scripts/check_gate.py must raise on an
    array-typed result exactly as the driver does.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("LSE_TEST_SF_DIR", "/root/testdata/sf0.001")


def lint_schema(schema):
    """Return the list of driver-canon-unsafe columns in a StructType."""
    from pyspark.sql import types as T

    bad = []
    for f in schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            bad.append(f"{f.name}: {f.dataType.simpleString()}")
    return bad


def test_lint_catches_array_dummy_gate(spark):
    from pyspark.sql import functions as F

    dummy = spark.range(3).select(
        F.col("id"), F.array(F.lit(1), F.lit(2)).alias("doc_ids")
    )
    bad = lint_schema(dummy.schema)
    assert bad == ["doc_ids: array<int>"]


def test_check_gate_canon_crashes_on_array_cells():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from check_gate import rows_to_multiset

    # scalar rows canonicalize fine
    ok = rows_to_multiset(["b", "a"], [(1.5, "x"), (None, "y")])
    assert len(ok) == 2
    # array cells must raise, as the driver's pandas _canon does
    with pytest.raises(TypeError):
        rows_to_multiset(["a", "ids"], [(1, [1, 2]), (2, [3])])


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_registry_schemas_are_canon_safe(spark):
    import __spark_entry__ as E

    os.environ["LSE_ORACLE_SF_DIR"] = SF_DIR
    failures = {}
    for name, fn in E.queries().items():
        df = fn(spark, SF_DIR)
        bad = lint_schema(df.schema)
        if bad:
            failures[name] = bad
    assert not failures, f"driver-canon-unsafe gate outputs: {failures}"
