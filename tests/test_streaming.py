"""Streaming operators (SURVEY.md §2.9): drive each through a real
Structured Streaming query (memory sink + processAllAvailable) — batch-mode
shortcuts don't exercise state stores or watermarks."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from spiderspark.streaming import (
    host_sessions,
    sliding_rate,
    snapshot_sink,
    streaming_token_bucket,
    tumbling_rate,
    with_watermark_rate,
)

SCHEMA = "host string, fetched_ts timestamp, bytes long"


@pytest.fixture(scope="module")
def fetch_rows(spark):
    rows = []
    for m in range(5):
        for i in range(4):
            rows.append(("host0.example", f"2024-01-01 00:{m:02d}:{i * 13:02d}", 100))
        rows.append(("host1.example", f"2024-01-01 00:{m:02d}:30", 50))
    return rows


@pytest.fixture(scope="module")
def stream_dir(spark, fetch_rows):
    d = tempfile.mkdtemp(prefix="spiderstream-")
    df = spark.createDataFrame(
        fetch_rows, "host string, fetched_ts string, bytes long"
    ).select("host", F.col("fetched_ts").cast("timestamp"), "bytes")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "in"))
    return d


def _run_stream(spark, stream_dir, transform, name, output_mode="complete"):
    src = (
        spark.readStream.schema(SCHEMA)
        .parquet(os.path.join(stream_dir, "in"))
    )
    q = (
        transform(src)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


def test_tumbling_rate_stream(spark, stream_dir):
    rows = _run_stream(spark, stream_dir, tumbling_rate, "t_tumble")
    got = {(r["w"]["start"].minute, r["host"]): r["n_fetches"] for r in rows}
    assert got[(0, "host0.example")] == 4
    assert got[(3, "host1.example")] == 1
    total = sum(r["n_fetches"] for r in rows)
    assert total == 25


def test_sliding_rate_stream(spark, stream_dir):
    rows = _run_stream(spark, stream_dir, sliding_rate, "t_slide")
    # 60s windows every 10s: each event lands in 6 windows
    assert sum(r["n_fetches"] for r in rows) == 25 * 6


def test_session_window_stream(spark, stream_dir):
    rows = _run_stream(spark, stream_dir, host_sessions, "t_sess")
    h0 = [r for r in rows if r["host"] == "host0.example"]
    # host0 fetches at :00 :13 :26 :39 within each minute; gap to the next
    # minute's :00 is 21s < 30s → ONE continuous session of 20
    assert sum(r["n_in_session"] for r in h0) == 20
    assert len(h0) == 1


def test_watermark_stream(spark, stream_dir):
    rows = _run_stream(
        spark, stream_dir, with_watermark_rate, "t_wm", output_mode="append"
    )
    # single micro-batch: windows close only after watermark advances past
    # them; with one batch nothing is emitted yet in append mode — the point
    # is the watermark operator runs in a real streaming plan
    assert isinstance(rows, list)


def test_streaming_token_bucket(spark):
    reqs = [
        ("host0.example", "2024-01-01 00:00:00", 7),
        ("host0.example", "2024-01-01 00:01:00", 7),
        ("host1.example", "2024-01-01 00:00:00", 3),
    ]
    d = tempfile.mkdtemp(prefix="spidertokens-")
    spark.createDataFrame(
        reqs, "host string, batch_ts string, requested long"
    ).select(
        "host", F.col("batch_ts").cast("timestamp"), "requested"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "in"))
    src = spark.readStream.schema(
        "host string, batch_ts timestamp, requested long"
    ).parquet(os.path.join(d, "in"))
    q = (
        streaming_token_bucket(src, capacity=10.0, refill=10.0)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_tokens")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r["host"]: r for r in spark.sql("SELECT * FROM t_tokens").collect()}
    finally:
        q.stop()
    # host0: round1 avail=10 grant 7 → tokens 3; round2 avail=min(10,13)=10
    # grant 7 → tokens 3  (both requests in one micro-batch → summed output)
    assert rows["host0.example"]["granted"] == 14
    assert rows["host0.example"]["tokens"] == 3.0
    assert rows["host1.example"]["granted"] == 3


def test_snapshot_sink_stream(spark, stream_dir):
    from spiderspark.snapshots import ParquetManifestStore

    store = ParquetManifestStore(tempfile.mkdtemp(prefix="spidersink-"))
    src = spark.readStream.schema(SCHEMA).parquet(os.path.join(stream_dir, "in"))
    q = snapshot_sink(
        src, store, "fetch_log", tempfile.mkdtemp(prefix="spiderckpt-")
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    head = store.head()
    assert head is not None
    df = store.read(spark, head, "fetch_log")
    assert df.count() == 25
