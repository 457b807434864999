"""The ordering invariant across parallelism levels (SURVEY.md §5.2): the
session fixture runs at local[4]; this test re-runs the golden-fixture crawl
in a FRESH local[2] JVM and compares against the same checked-in fixture.
(The bench additionally proves digest equality at local[8] vs local[32].)"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import json, os, sys
sys.path.insert(0, %(root)r)
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
import numpy as np
from spiderspark.session import get_spark
from spiderspark.crawl import CrawlConfig, crawl
from spiderspark.pages import gen_pages_pdf, robots_pdf, seeds_pdf
from spiderspark.politeness import HostPolicy
from spiderspark.schemas import ROBOTS_TXT, SEEDS

spark = get_spark("invariance", cores=2, shuffle_partitions=2)
cfg = {"corpus": 300, "seeds": 20, "budget": 2.0, "rounds": 4}
pages = spark.createDataFrame(
    gen_pages_pdf(np.arange(cfg["corpus"]), cfg["corpus"]),
    schema="url string, warc_ts timestamp, html binary, text string, lang string",
)
seeds = spark.createDataFrame(seeds_pdf(cfg["seeds"], cfg["corpus"]), schema=SEEDS)
robots = spark.createDataFrame(robots_pdf(), schema=ROBOTS_TXT)
state, schedules, _ = crawl(
    spark, seeds, pages, robots, rounds=cfg["rounds"],
    config=CrawlConfig(policy=HostPolicy(default_budget=cfg["budget"])),
)
out = [[r["url_hash"] for r in s.orderBy("rank").collect()] for s in schedules]
print("RESULT:" + json.dumps(out))
spark.stop()
"""


def test_local2_matches_golden_fixture():
    with open(os.path.join(ROOT, "tests", "fixtures", "crawl_small_b2.json")) as f:
        golden = json.load(f)
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"root": ROOT}],
        capture_output=True, text=True, timeout=600, env=env, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT:")][-1]
    got = json.loads(line[len("RESULT:"):])
    assert got == golden["ordering"], "ordering diverged at local[2]"
