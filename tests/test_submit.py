"""The literal spark-submit --py-files deployment path (north rule):
zip the package, submit scripts/submit_smoke.py to a REAL 2-executor
local-cluster from a neutral cwd with PYTHONPATH scrubbed, and assert
the app's success marker. Everything the executors run — mapInPandas
corpus generation, tokenize, hash-agg build, Arrow signature kernels —
must come from the zip."""

from __future__ import annotations

import os
import shutil
import subprocess


def test_spark_submit_py_files(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    archive = shutil.make_archive(
        str(tmp_path / "engine"),
        "zip",
        root_dir=root,
        base_dir="local_search_engine_spark",
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local-cluster[2,2,1536]",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            archive,
            os.path.join(root, "scripts", "submit_smoke.py"),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "SUBMIT_SMOKE_OK" in proc.stdout, (
        proc.stdout[-2000:] + "\n" + proc.stderr[-2000:]
    )
