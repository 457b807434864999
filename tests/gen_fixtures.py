"""Regenerate the golden crawl fixtures (FIXTURES.md §A4) from the pure
oracle. Run manually: ``python tests/gen_fixtures.py``. The checked-in
fixtures pin the SEMANTICS — if an intentional kernel change moves them,
regenerate and commit; an unintentional move is a regression caught by
tests/test_fixtures.py (no Spark needed)."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spiderspark.pages import gen_pages_pdf, robots_pdf, seeds_pdf  # noqa: E402
from tests.oracle_crawler import OracleConfig, OracleCrawler, schedule_hashes  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

CONFIGS = [
    {"name": "small_b5", "corpus": 300, "seeds": 20, "budget": 5.0, "rounds": 3},
    {"name": "small_b2", "corpus": 300, "seeds": 20, "budget": 2.0, "rounds": 4},
    {"name": "mid_b8", "corpus": 1000, "seeds": 50, "budget": 8.0, "rounds": 3},
]


def build(cfg):
    pages_pdf = gen_pages_pdf(np.arange(cfg["corpus"]), cfg["corpus"])
    pages = dict(zip(pages_pdf["url"], pages_pdf["html"]))
    seeds = list(
        seeds_pdf(cfg["seeds"], cfg["corpus"]).itertuples(index=False, name=None)
    )
    robots = dict(zip(robots_pdf()["host"], robots_pdf()["body"]))
    oracle = OracleCrawler(
        seeds, pages, robots,
        OracleConfig(default_budget=cfg["budget"], round_seconds=60.0),
    )
    rounds = [schedule_hashes(s) for s in oracle.run(cfg["rounds"])]
    return {
        "config": cfg,
        "ordering": rounds,
        "seen_digest": oracle.seen_digest(),
        "n_seen": len(oracle.seen),
    }


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for cfg in CONFIGS:
        out = build(cfg)
        path = os.path.join(FIXTURE_DIR, f"crawl_{cfg['name']}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(path, "rounds:", [len(r) for r in out["ordering"]], "seen:", out["n_seen"])


if __name__ == "__main__":
    main()
