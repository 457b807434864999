#!/usr/bin/env python
"""Extra measurement harness for optimization rounds (guide §1: measure
first, noop-sink isolation, labeled jobs, plan capture). NOT part of the
driver contract — bench.py stays the frozen measurement entry point; this
file exists so optimization work can isolate and attribute cost without
touching it.

Usage:
  python bench_extra.py queries  [--sf-dir D] [--repeats N] [--only q5,...]
  python bench_extra.py explain  [--sf-dir D] [--out plans/r08] [--suffix before]
  python bench_extra.py headline-stages [--frontier N]

`queries` times each headline query with the noop sink (min/median of N).
`explain` writes .explain("formatted") for every registered query to
--out/<name>_<suffix>.txt.
`headline-stages` runs one headline round with per-stage walls printed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)


def _spark(cores: int | None = None):
    os.environ.setdefault("SPIDERSPARK_DRIVER_MEM", "48g")
    from spiderspark.session import get_spark

    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = {}
    if os.path.isdir("/dev/shm"):
        d = f"/dev/shm/spiderspark-shuffle-{os.getpid()}"
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    return get_spark(
        "spiderspark-bench-extra", cores=cores,
        shuffle_partitions=cores * 2, extra=extra,
    )


def run_queries(spark, sf_dir: str, names: list[str], repeats: int) -> dict:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in names:
        walls = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(walls), "walls": walls}
    return out


def dump_explains(spark, sf_dir: str, out_dir: str, suffix: str, names=None):
    import __spark_entry__ as entry_mod

    os.makedirs(out_dir, exist_ok=True)
    qs = entry_mod.queries()
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record, keep going
            plan = f"EXPLAIN FAILED: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["queries", "explain", "headline-stages"])
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default="plans/r08")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--frontier", type=int, default=2_000_000)
    args = ap.parse_args(argv)

    spark = _spark()
    if args.mode == "queries":
        from spiderspark.bench import HEADLINE_QUERIES

        names = args.only.split(",") if args.only else HEADLINE_QUERIES
        res = run_queries(spark, args.sf_dir, names, args.repeats)
        print(json.dumps({"sf_dir": args.sf_dir, "queries": res}))
    elif args.mode == "explain":
        names = set(args.only.split(",")) if args.only else None
        dump_explains(spark, args.sf_dir, args.out, args.suffix, names)
    else:
        from spiderspark.bench import run_headline

        res = run_headline(spark, args.frontier)
        print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
