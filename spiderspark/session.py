"""SparkSession factory with the engine's scale-oriented defaults.

All knobs are Spark-public configs. Defaults target the sandbox
(local[N], single JVM); on a real cluster the same builder is used by
``spark-submit --py-files`` with master/memory supplied externally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spiderspark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    - AQE on (runtime re-plan, partition coalescing, skew-join split).
    - Arrow on (pandas UDFs stream Arrow batches; engine mandate).
    - UTC session timezone (duckdb-oracle comparability).
    - shuffle partitions ≈ cores by default: at sandbox scale the default
      200 over-parallelizes tiny shuffles; at cluster scale callers size it
      to 2-3× total executor cores.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    master = os.environ.get("SPIDERSPARK_MASTER", f"local[{cores}]")
    shuffle = shuffle_partitions or cores

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE rewrite sort-merge → shuffled-hash when every post-shuffle
        # partition's build side fits the threshold (guide §3.1): drops both
        # sorts from large×large equi joins (measured on q2 at sf1.0 — the
        # final plan's SortMergeJoin becomes ShuffledHashJoin). Scale-safe
        # BY CONSTRUCTION: the rewrite fires only when AQE has measured
        # every partition below the 64 MB bound, so per-task build memory
        # is capped no matter the input size; bigger partitions keep SMJ.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # the state-layout contract joins stored segments on a SUPERSET of
        # their partition keys ((host_bucket, salt, url_hash) against the
        # (host_bucket, salt) layout). Since Spark 3.3 co-partitioned joins
        # demand a FULL-key partitioning match by default, which would
        # re-exchange BOTH sides; subset-key co-partitioning is exactly the
        # hash-partitioning guarantee (equal full keys ⇒ equal subset hash),
        # so relax it — groupBy/window already accept subset keys.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPIDERSPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    # ad-hoc conf overrides without code changes (experiments / cluster
    # tuning): SPIDERSPARK_EXTRA_CONF="k1=v1;k2=v2"
    for pair in os.environ.get("SPIDERSPARK_EXTRA_CONF", "").split(";"):
        if "=" in pair:
            k, _, v = pair.partition("=")
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """S1 parquet scan: vectorized reader; pushdown/pruning via Catalyst."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def fanout(df, *keys: str):
    """Spread a NARROW input across the cluster before per-row-heavy work
    (Arrow/pandas UDF passes), scale-adaptively (guide §2.5 input skew).

    A small parquet table (one file, one row group) scans as 1-2 effective
    tasks no matter the core count, so a UDF pass downstream of it runs
    nearly serially — measured 8.9 s → 2.7 s on the sf1.0 minhash query at
    32 cores. The repartition is a DETERMINISTIC hash exchange on ``keys``
    (never round-robin: no sort-before-repartition pass, and task retries
    are reproducible — guide §2.5), and fires ONLY when the input's
    parallelism is below the cluster's, so large inputs — whose scans are
    already parallel — never pay an extra exchange. Results are unchanged
    either way (per-row functions; all downstream consumers are
    partitioning-agnostic)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *keys) if keys else df.repartition(n)
