"""Golden-fixture guards (SURVEY.md §5.2): the oracle must keep producing
the checked-in schedules/digests (pure python — catches accidental drift of
the pinned kernels), and the Spark engine must reproduce the mid-size
fixture end-to-end."""

import json
import os

import numpy as np
import pytest

from tests.gen_fixtures import CONFIGS, FIXTURE_DIR, build


def _load(name):
    with open(os.path.join(FIXTURE_DIR, f"crawl_{name}.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c["name"] for c in CONFIGS])
def test_oracle_matches_golden(cfg):
    golden = _load(cfg["name"])
    fresh = build(cfg)
    assert fresh["ordering"] == golden["ordering"]
    assert fresh["seen_digest"] == golden["seen_digest"]


def test_spark_matches_golden_fixture(spark):
    cfg = CONFIGS[1]  # small_b2: tight budget → politeness binds for 4 rounds
    golden = _load(cfg["name"])

    from spiderspark.crawl import CrawlConfig, crawl
    from spiderspark.pages import gen_pages_pdf, robots_pdf, seeds_pdf
    from spiderspark.politeness import HostPolicy
    from spiderspark.schemas import ROBOTS_TXT, SEEDS

    pages = spark.createDataFrame(
        gen_pages_pdf(np.arange(cfg["corpus"]), cfg["corpus"]),
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    seeds = spark.createDataFrame(seeds_pdf(cfg["seeds"], cfg["corpus"]), schema=SEEDS)
    robots = spark.createDataFrame(robots_pdf(), schema=ROBOTS_TXT)
    state, schedules, _ = crawl(
        spark, seeds, pages, robots,
        rounds=cfg["rounds"],
        config=CrawlConfig(policy=HostPolicy(default_budget=cfg["budget"])),
    )
    got = [[r["url_hash"] for r in s.orderBy("rank").collect()] for s in schedules]
    assert got == golden["ordering"]

    import hashlib

    from spiderspark.schemas import SEEN
    seen = sorted(
        r["url_hash"] for r in state.seen.df(spark, SEEN).collect()
    )
    digest = hashlib.sha256(",".join(str(h) for h in seen).encode()).hexdigest()
    assert digest == golden["seen_digest"]


def test_retry_semantics_oracle():
    """A dead URL (not in the corpus) is scheduled exactly max_attempts
    times, then enters the seen set as exhausted — mirroring the
    reference's requeue-on-failure behavior."""
    from spiderspark.hashing import xxhash64_int
    from tests.oracle_crawler import OracleConfig, OracleCrawler

    dead = "http://deadhost.example/gone"
    oracle = OracleCrawler(
        [(dead, 0.0)], pages={}, robots=None,
        config=OracleConfig(default_budget=5.0, max_attempts=3),
    )
    h = xxhash64_int("http://deadhost.example/gone")
    rounds = oracle.run(5)
    appearances = sum(1 for r in rounds for it in r if it.url_hash == h)
    assert appearances == 3
    assert h in oracle.seen
    assert oracle.frontier == []
