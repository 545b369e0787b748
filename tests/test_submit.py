"""North-rule launch mode: `spark-submit --py-files linkgraph.zip job.py`.

Packages the engine with tools/build_pyfiles.py and actually launches a
PageRank job through spark-submit in a separate JVM — the exact cluster
submission path (on a real cluster only --master changes). Asserts the
engine imports from the zip (not from the repo checkout) and computes.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """\
import sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
import linkgraph
assert ".zip" in linkgraph.__file__, f"engine must load from the --py-files zip, got {linkgraph.__file__}"
from linkgraph import pagerank

edges = spark.createDataFrame(
    [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long"
)
res = pagerank(edges, damping=0.85, max_iter=5)
rows = sorted((r["id"], round(r["rank"], 6)) for r in res.scores.collect())
print("PYFILES_OK", len(rows), rows[0][0], flush=True)
spark.stop()
"""


def test_spark_submit_pyfiles(tmp_path):
    submit = shutil.which("spark-submit")
    if submit is None:
        pytest.skip("spark-submit not on PATH")
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from build_pyfiles import build

    zip_path = build(str(tmp_path / "linkgraph.zip"))
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # run from tmp_path so the repo's linkgraph/ package cannot shadow
    # the zip — the job's assert proves the zip is what executes
    out = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.local.dir=/dev/shm/spark-submit-test",
            "--py-files", zip_path,
            str(job),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "PYFILES_OK 4 0" in out.stdout, out.stdout[-2000:]
