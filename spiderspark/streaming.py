"""Streaming-equivalent operators (SURVEY.md §2.9) — the live-feed
deployment mode. The crawl itself is an iterative batch loop (the reference
is a batch queue drainer); these operators exist for deployments that feed
fetch results / frontier discoveries through Structured Streaming.

ST1 tumbling-window rate accounting   → fetch throughput metric
ST2 sliding-window throughput         → smoothed rate
ST3 per-host session windows          → host activity bursts
ST4 watermark + late data             → late fetch results drop out of
                                        windowed metrics only (seen-set
                                        merge stays idempotent)
ST5 stateful per-host token bucket    → applyInPandasWithState
ST6 snapshot-commit sink              → foreachBatch → SnapshotStore
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_rate(events: DataFrame, ts_col: str = "fetched_ts", every: str = "60 seconds") -> DataFrame:
    """ST1: per-window fetch counts + bytes (works on batch or stream)."""
    return events.groupBy(F.window(ts_col, every).alias("w"), "host").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum("bytes").alias("total_bytes"),
    )


def sliding_rate(events: DataFrame, ts_col: str = "fetched_ts") -> DataFrame:
    """ST2: 60s windows sliding every 10s."""
    return events.groupBy(F.window(ts_col, "60 seconds", "10 seconds").alias("w")).agg(
        F.count(F.lit(1)).alias("n_fetches")
    )


def host_sessions(events: DataFrame, ts_col: str = "fetched_ts", gap: str = "30 seconds") -> DataFrame:
    """ST3: per-host activity bursts via session_window."""
    return events.groupBy(F.session_window(ts_col, gap).alias("s"), "host").agg(
        F.count(F.lit(1)).alias("n_in_session")
    )


def with_watermark_rate(stream: DataFrame, ts_col: str = "fetched_ts") -> DataFrame:
    """ST4: watermarked tumbling rate — late rows are dropped from the
    windowed metric (the seen-set path is idempotent, so correctness of the
    crawl does not depend on them arriving)."""
    return (
        stream.withWatermark(ts_col, "10 minutes")
        .groupBy(F.window(ts_col, "60 seconds").alias("w"), "host")
        .agg(F.count(F.lit(1)).alias("n_fetches"))
    )


# -- ST5: stateful per-host token bucket -------------------------------------

TOKEN_OUTPUT_SCHEMA = (
    "host string, batch_ts timestamp, requested long, granted long, tokens double"
)
TOKEN_STATE_SCHEMA = "tokens double"


def make_token_bucket_fn(capacity: float, refill: float):
    """applyInPandasWithState function: same pinned arithmetic as the batch
    tier (politeness.py) — refill at round start, grant up to floor(avail)."""

    def fn(key, pdfs, state: GroupState):
        (host,) = key
        (tokens,) = state.get if state.exists else (0.0,)
        total_requested = 0
        total_granted = 0
        last_ts = None
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                avail = min(capacity, tokens + refill)
                want = int(row["requested"])
                grant = min(want, int(avail))
                tokens = avail - grant
                total_requested += want
                total_granted += grant
                last_ts = row["batch_ts"]
        state.update((tokens,))
        yield pd.DataFrame(
            {
                "host": [host],
                "batch_ts": [last_ts],
                "requested": [total_requested],
                "granted": [total_granted],
                "tokens": [tokens],
            }
        )

    return fn


def streaming_token_bucket(
    requests: DataFrame, capacity: float = 10.0, refill: float = 10.0
) -> DataFrame:
    """ST5: keyed stateful politeness over a stream of
    (host, batch_ts, requested) rows."""
    return requests.groupBy("host").applyInPandasWithState(
        make_token_bucket_fn(capacity, refill),
        outputStructType=TOKEN_OUTPUT_SCHEMA,
        stateStructType=TOKEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- ST6: snapshot-commit sink ------------------------------------------------


def snapshot_sink(stream: DataFrame, store, table: str, checkpoint_dir: str):
    """ST6: exactly-once-per-epoch snapshot commits via foreachBatch."""

    def commit(batch_df: DataFrame, epoch_id: int):
        store.commit({table: batch_df}, batch_id=epoch_id, parent_id=store.head())

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(commit)
    )
