"""The north-rule deployment surface (BASELINE.json:14): the engine must run
via ``spark-submit --py-files``. Packages the zip, submits the crawl job in
a fresh JVM, then resubmits to exercise snapshot resume."""

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_crawl_and_resume():
    subprocess.run(["sh", os.path.join(ROOT, "jobs", "package.sh")], check=True)
    store = tempfile.mkdtemp(prefix="spidersubmit-")
    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )

    def submit(rounds):
        out = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--py-files", os.path.join(ROOT, "dist", "spiderspark.zip"),
                os.path.join(ROOT, "jobs", "crawl_job.py"),
                "--rounds", str(rounds),
                "--corpus", "200",
                "--store", store,
            ],
            capture_output=True, text=True, timeout=600, env=env, cwd=ROOT,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    first = submit(2)
    assert first["scheduled"] > 0 and first["seen"] > 0
    assert first["snapshot"] == 2

    resumed = submit(1)  # store has HEAD → resume path
    assert resumed["snapshot"] == 3
    assert resumed["seen"] >= first["seen"]
    shutil.rmtree(store, ignore_errors=True)
