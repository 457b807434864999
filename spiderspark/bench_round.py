"""One timed headline round, factored out so the harness can repeat it.

Sandbox wall-clock is noisy (shared box): repeating the identical round in
one process and taking the fastest repeat removes transient contention from
the scaling comparison. On a quiet cluster the repeats agree.
"""

from __future__ import annotations

import time


def one_round(spark, raw, seen, policy, use_bloom: bool, n_buckets: int, cap: int) -> dict:
    from pyspark.sql import functions as F

    from .frontier import build_bloom, dedup_against_seen, dedup_within_batch, seeds_to_frontier
    from .politeness import join_host_state, robots_gate
    from .schedule import assign_salts, per_host_topk, to_schedule
    from .schemas import HOST_STATE

    t0 = time.time()
    frontier = dedup_within_batch(seeds_to_frontier(spark, raw, batch_id=0)).persist()
    frontier.count()
    t_canon = time.time() - t0

    t_b = time.time()
    bloom = build_bloom(seen, n_buckets=n_buckets, capacity_per_bucket=cap) if use_bloom else None
    t_bloom = time.time() - t_b

    t2 = time.time()
    candidates = dedup_against_seen(spark, frontier, seen, bloom)
    budgeted = join_host_state(candidates, spark.createDataFrame([], HOST_STATE), policy)
    gated = robots_gate(budgeted).filter(F.col("host_budget") > 0)
    selected = per_host_topk(
        assign_salts(gated, skew_threshold=20_000),
        "host_budget",
        k_cap=int(policy.default_budget),
    )
    schedule = to_schedule(selected, batch_id=1)
    digest_row = schedule.agg(
        F.count(F.lit(1)).alias("n"),
        # xor of hash(rank:url_hash): order-insensitive, overflow-free, and
        # sensitive to any change in the rank→url assignment
        F.expr("bit_xor(xxhash64(concat(rank, ':', url_hash)))").alias("d"),
    ).collect()[0]
    t_sched = time.time() - t2
    wall = time.time() - t0

    frontier.unpersist()
    return {
        "wall_s": round(wall, 3),
        "canon_dedup_s": round(t_canon, 3),
        "bloom_build_s": round(t_bloom, 3),
        "schedule_s": round(t_sched, 3),
        "n_scheduled": digest_row["n"],
        "schedule_digest": int(digest_row["d"] or 0),
    }
