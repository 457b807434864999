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


# -- driver-contract registration: a REAL streaming query, DuckDB-checked ----


from .queries import q


@q(
    "stream_tumbling_counts",
    "SELECT date_trunc('hour', ts) AS w_start, event_type, count(*) AS n, "
    "round(sum(value), 4) AS total FROM events GROUP BY 1, 2",
)
def stream_tumbling_counts(spark, sf_dir):
    """ST1 as an actual Structured Streaming query (not the batch
    equivalent): readStream over the events parquet → tumbling event-time
    window agg → availableNow trigger → memory sink. The bounded run is
    exactly equivalent to the batch GROUP BY, so the same DuckDB oracle
    checks a genuinely streaming execution."""
    import os
    import uuid

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    # the file streaming source wants a DIRECTORY; the testdata table is a
    # single file, so stream a temp dir holding a symlink to it (testdata
    # itself is read-only — never modified)
    import tempfile

    import shutil

    stream_dir = tempfile.mkdtemp(prefix="spiderstream-events-")
    query = None
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    try:
        os.symlink(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(stream_dir, "events.parquet"),
        )
        stream = spark.readStream.schema(schema).parquet(stream_dir)
        agg = stream.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        query = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        # detach the result from the memory sink (localCheckpoint survives
        # dropping the sink table) so repeated invocations in one session —
        # contract checks, bench loops — don't accumulate sink tables,
        # stopped queries, or temp dirs
        return (
            spark.table(name)
            .select(F.col("w.start").alias("w_start"), "event_type", "n", "total")
            .localCheckpoint(eager=True)
        )
    finally:
        if query is not None:
            query.stop()
        spark.catalog.dropTempView(name)
        shutil.rmtree(stream_dir, ignore_errors=True)


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
