"""The crawl loop: schedule → fetch → extract → discover → commit
(SURVEY.md §3.1) — the batch re-expression of the reference's
thread-pool-over-queues semantics.

One ``crawl_round`` is the unit of the throughput metric ("frontier URLs
scheduled+deduped/sec", BASELINE.json:2) and of the ordering invariant: the
returned schedule's (rank, url_hash) sequence must equal the pure-python
oracle's for the same seeds + politeness budget at any parallelism.

Iterative-loop hygiene: each round's state DataFrames are materialized
(store commit when a SnapshotStore is given, else ``localCheckpoint``) so
logical plans don't grow unboundedly across rounds — the standard Spark
iterative-algorithm pattern.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .canon import extract_outlinks_series, extract_text_series
from .frontier import (
    dedup_against_seen,
    dedup_within_batch,
    seeds_to_frontier,
    with_canonical,
)
from .politeness import (
    HostPolicy,
    init_host_state,
    join_host_state,
    robots_gate,
    update_host_state,
)
from .schedule import assign_salts, per_host_topk, to_schedule
from .schemas import FETCH_LOG, HOST_STATE, SEEN
from .sketch import BucketedBloom
from .snapshots import SnapshotStore


@dataclass(frozen=True)
class CrawlConfig:
    policy: HostPolicy = field(default_factory=HostPolicy)
    bloom_buckets: int = 16
    bloom_capacity_per_bucket: int = 1 << 16
    bloom_fpp: float = 0.01
    skew_threshold: int = 50_000
    use_bloom: bool = True
    max_depth: int = 64
    # reference parity: failed lookups are re-queued (SURVEY.md §0.3.5);
    # a URL is retried until it has been scheduled max_attempts times, then
    # enters the seen set as exhausted
    max_attempts: int = 2


@dataclass
class CrawlState:
    frontier: DataFrame
    seen: DataFrame
    host_state: DataFrame
    bloom: BucketedBloom | None
    batch_id: int
    snapshot_id: int | None = None


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_text_series(html)


@F.pandas_udf(T.ArrayType(T.StringType()))
def outlinks_udf(html: pd.Series, base: pd.Series) -> pd.Series:
    return extract_outlinks_series(html, base)


def _materialize(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def init_state(
    spark: SparkSession,
    seeds: DataFrame,
    robots: DataFrame | None,
    config: CrawlConfig,
) -> CrawlState:
    frontier = dedup_within_batch(seeds_to_frontier(spark, seeds, batch_id=0))
    seen = spark.createDataFrame([], SEEN)
    host_state = (
        init_host_state(robots, config.policy)
        if robots is not None
        else spark.createDataFrame([], HOST_STATE)
    )
    bloom = (
        BucketedBloom.for_capacity(
            config.bloom_buckets * config.bloom_capacity_per_bucket,
            config.bloom_buckets,
            config.bloom_fpp,
        )
        if config.use_bloom
        else None
    )
    return CrawlState(
        frontier=_materialize(frontier),
        seen=_materialize(seen),
        host_state=_materialize(host_state),
        bloom=bloom,
        batch_id=0,
    )


def keyed_pages(pages: DataFrame) -> DataFrame:
    """Pages table keyed by url_hash of the canonical url — computed once,
    outside the loop. Column pruning matters here: ``html`` is the fat
    column; downstream joins select it explicitly only at fetch time."""
    return with_canonical(pages).select("url_hash", "url_norm", "html")


def crawl_round(
    spark: SparkSession,
    state: CrawlState,
    pages: DataFrame,
    config: CrawlConfig,
    store: SnapshotStore | None = None,
) -> tuple[CrawlState, DataFrame, DataFrame]:
    """Run one round; returns (state', schedule, fetch_log)."""
    batch_id = state.batch_id + 1

    # 1-3. dedup: bloom pre-filter + exact anti join against seen
    candidates = dedup_against_seen(spark, state.frontier, state.seen, state.bloom)

    # 4. politeness + robots + budget, heavy-host salting, per-host top-k
    budgeted = join_host_state(candidates, state.host_state, config.policy)
    gated = robots_gate(budgeted).filter(F.col("host_budget") > 0)
    salted = assign_salts(gated, config.skew_threshold)
    # literal budget cap → Spark's WindowGroupLimit bounds the top-k sorts
    caps = state.host_state.agg(F.max("capacity").alias("m")).collect()
    k_cap = int(
        max(config.policy.default_budget, (caps[0]["m"] or 0) if caps else 0)
    )
    selected = per_host_topk(salted, "host_budget", k_cap=k_cap)

    # 5. deterministic total order → the round's schedule (the invariant unit)
    schedule = _materialize(to_schedule(selected, batch_id))

    # 6. "fetch" (sandbox: join pages on url_hash; cluster: swap a fetching
    #    mapInPandas here) + pinned text extraction + lineage/metrics
    fetched = _materialize(
        schedule.join(
            pages.select("url_hash", "html"), "url_hash", "left"
        ).withColumn("text", extract_text_udf("html"))
    )
    fetch_log = _materialize(
        fetched.select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            F.spark_partition_id().alias("partition_id"),
            "url_hash",
            "host",
            F.when(F.col("html").isNull(), F.lit("missing"))
            .otherwise(F.lit("fetched"))
            .alias("status"),
            F.coalesce(F.length("html"), F.lit(0)).cast("long").alias("bytes"),
            F.xxhash64("text").alias("text_hash"),
        )
    )

    # 7. discovery: outlinks of fetched pages → frontier rows at depth+1
    discovered = (
        fetched.filter(F.col("html").isNotNull() & (F.col("depth") < config.max_depth))
        .select(
            F.explode(outlinks_udf("html", "url")).alias("url"),
            F.col("priority").alias("parent_priority"),
            F.col("depth").alias("parent_depth"),
        )
    )
    new_frontier_rows = (
        with_canonical(discovered)
        .withColumn("priority", F.col("parent_priority"))
        .withColumn("depth", (F.col("parent_depth") + 1).cast("int"))
        .withColumn("salt", F.lit(0).cast("int"))
        .withColumn("discovered_batch", F.lit(batch_id).cast("long"))
        .withColumn("attempt", F.lit(0).cast("int"))
        .select(
            "url", "url_norm", "url_hash", "host", "host_bucket", "salt",
            "priority", "depth", "discovered_batch", "attempt",
        )
    )

    # 8. state update with retry semantics (reference re-queues failures):
    #    done = fetched OR attempts exhausted → seen; failed-with-budget-left
    #    → requeued at attempt+1. seen' = seen ∪ done; frontier' =
    #    (frontier ∖ scheduled) ∪ discovered ∪ requeued, deduped, ∖ seen'.
    done_cond = F.col("html").isNotNull() | (
        F.col("attempt") + 1 >= F.lit(config.max_attempts)
    )
    newly_seen = fetched.filter(done_cond).select(
        "url_hash", F.lit(batch_id).cast("long").alias("first_batch")
    )
    from .frontier import host_bucket_col

    requeued = fetched.filter(~done_cond).select(
        "url",
        "url_norm",
        "url_hash",
        "host",
        host_bucket_col(F.col("host")).alias("host_bucket"),
        F.lit(0).cast("int").alias("salt"),
        "priority",
        "depth",
        F.lit(batch_id).cast("long").alias("discovered_batch"),
        (F.col("attempt") + 1).cast("int").alias("attempt"),
    )
    seen = _materialize(state.seen.unionByName(newly_seen))

    remaining = state.frontier.join(
        schedule.select("url_hash"), "url_hash", "left_anti"
    )
    frontier = _materialize(
        dedup_within_batch(
            remaining.unionByName(new_frontier_rows).unionByName(requeued)
        ).join(seen.select("url_hash"), "url_hash", "left_anti")
    )

    # 9. bloom': OR-merge a distributed partial built from this round's
    #    newly-seen hashes (same params as the state sketch) — the rows
    #    never visit the driver, only the bucket bit-arrays do
    bloom = state.bloom
    if bloom is not None:
        from .frontier import build_bloom_like

        bloom = bloom.merge(build_bloom_like(newly_seen, bloom))

    # 10. politeness accounting
    sched_counts = schedule.groupBy("host").agg(F.count(F.lit(1)).alias("scheduled"))
    host_state = _materialize(
        update_host_state(state.host_state, sched_counts, config.policy)
    )

    new_state = CrawlState(
        frontier=frontier,
        seen=seen,
        host_state=host_state,
        bloom=bloom,
        batch_id=batch_id,
    )

    if store is not None:
        new_state = commit_state(spark, new_state, schedule, fetch_log, store)
    return new_state, schedule, fetch_log


def commit_state(
    spark: SparkSession,
    state: CrawlState,
    schedule: DataFrame,
    fetch_log: DataFrame,
    store: SnapshotStore,
) -> CrawlState:
    """S5/S6: atomic snapshot of the full state + this round's outputs."""
    tables = {
        "frontier": state.frontier,
        "seen": state.seen,
        "host_state": state.host_state,
        "schedule": schedule,
        "fetch_log": fetch_log,
    }
    if state.bloom is not None:
        tables["seen_sketch"] = spark.createDataFrame(
            pd.DataFrame(list(state.bloom.bucket_rows())).assign(
                n_bits=lambda d: d.n_bits.astype("int64")
            )
        )
    snapshot_id = store.commit(tables, state.batch_id, store.head())
    return replace(state, snapshot_id=snapshot_id)


def resume(spark: SparkSession, store: SnapshotStore, config: CrawlConfig) -> CrawlState:
    """§3.3 exact resume: validate lineage, rebuild the sketch from the
    stored per-bucket rows (NO rescan of seen), continue at batch N+1."""
    snapshot_id = store.head()
    assert snapshot_id is not None, "nothing to resume from"
    assert store.validate(snapshot_id, spark), "lineage validation failed"
    m = store.manifest(snapshot_id)
    bloom = None
    if config.use_bloom and "seen_sketch" in m["tables"]:
        rows = [
            r.asDict() for r in store.read(spark, snapshot_id, "seen_sketch").collect()
        ]
        bloom = BucketedBloom.from_bucket_rows(rows)
    return CrawlState(
        frontier=store.read(spark, snapshot_id, "frontier"),
        seen=store.read(spark, snapshot_id, "seen"),
        host_state=store.read(spark, snapshot_id, "host_state"),
        bloom=bloom,
        batch_id=int(m["batch_id"]),
        snapshot_id=snapshot_id,
    )


def crawl(
    spark: SparkSession,
    seeds: DataFrame,
    pages: DataFrame,
    robots: DataFrame | None = None,
    rounds: int = 3,
    config: CrawlConfig | None = None,
    store: SnapshotStore | None = None,
    state: CrawlState | None = None,
):
    """Convenience driver: run ``rounds`` rounds; returns (state, schedules,
    fetch_logs) with schedules as a list of per-round DataFrames."""
    config = config or CrawlConfig()
    # key + persist the pages side ONCE: the fetch join probes it every
    # round; without this the corpus scan + canonicalization re-runs per round
    pages_k = keyed_pages(pages).persist()
    if state is None:
        state = init_state(spark, seeds, robots, config)
    schedules, logs = [], []
    for _ in range(rounds):
        state, schedule, fetch_log = crawl_round(spark, state, pages_k, config, store)
        schedules.append(schedule)
        logs.append(fetch_log)
    pages_k.unpersist()
    return state, schedules, logs
