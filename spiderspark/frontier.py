"""Frontier pipeline: canonicalize → hash → bucket → dedup (SURVEY.md §2.2-2.4).

Scale notes (the parts that must survive 1000 executors × 100 TB):

- Canonicalization + hashing + host extraction happen in ONE select so the
  whole batch crosses the JVM↔Python Arrow boundary once (SURVEY.md §4:
  each ArrowEvalPython node breaks WholeStageCodegen — batch the UDF work).
- ``url_hash`` is Spark's built-in ``xxhash64`` (JVM-side, codegen'd), NOT a
  UDF — only the RFC-3986 string rewrite needs Python.
- The exact-tier dedup is a left_anti join hash-partitioned on url_hash;
  Catalyst/AQE picks SMJ or shuffled-hash. The bloom pre-filter (broadcast
  bits + vectorized membership) runs FIRST so only the "maybe-seen" sliver
  pays the shuffle — at 10^10 seen URLs with 1% fpp, 99% of genuinely-new
  URLs skip the exact join entirely.
- The bloom build is per-partition (one partial filter per Spark partition)
  merged via ``treeAggregate`` (BASELINE.json:6) — log-depth reduction, no
  driver hot-spot. Partials are built Arrow-side in mapInPandas (vectorized
  numpy), so treeAggregate only ever moves already-built bit arrays.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from .canon import canonicalize_series, host_of_series
from .sketch import Bloom, BucketedBloom, optimal_params

N_HOST_BUCKETS = 64  # frontier partition count at sandbox scale; cluster: O(cores)


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return canonicalize_series(urls)


@F.pandas_udf(T.StringType())
def host_udf(url_norm: pd.Series) -> pd.Series:
    return host_of_series(url_norm)


_CANON_STRUCT = T.StructType(
    [
        T.StructField("url_norm", T.StringType()),
        T.StructField("host", T.StringType()),
    ]
)


@F.pandas_udf(_CANON_STRUCT)
def canon_host_udf(urls: pd.Series) -> pd.DataFrame:
    """canonicalize + host in ONE Arrow crossing (the hot path pays a single
    ArrowEvalPython stage; host_of runs on the already-normalized strings)."""
    norm = canonicalize_series(urls)
    return pd.DataFrame({"url_norm": norm, "host": host_of_series(norm)})


def host_bucket_col(host: Column, n_buckets: int = N_HOST_BUCKETS) -> Column:
    """host-hash bucket (BASELINE.json:6) — JVM-side, no Python."""
    return F.pmod(F.xxhash64(host), F.lit(n_buckets)).cast("int")


def with_canonical(df: DataFrame, url_col: str = "url") -> DataFrame:
    """P2+P3+P4+bucket in one pass; invalid/non-http(s) URLs filtered (P5)."""
    out = (
        df.withColumn("_c", canon_host_udf(F.col(url_col)))
        .withColumn("url_norm", F.col("_c.url_norm"))
        .withColumn("host", F.col("_c.host"))
        .drop("_c")
        .withColumn("url_hash", F.xxhash64("url_norm"))
        .withColumn("host_bucket", host_bucket_col(F.col("host")))
    )
    return out.filter(
        (F.col("host") != "")
        & F.col("url_norm").startswith("http")
        & (F.length("url_norm") <= 2048)
    )


def seeds_to_frontier(spark, seeds: DataFrame, batch_id: int = 0) -> DataFrame:
    """S3: seed rows (url, priority) → frontier rows at depth 0."""
    return (
        with_canonical(seeds)
        .withColumn("priority", F.coalesce(F.col("priority"), F.lit(0.0)).cast("double"))
        .withColumn("salt", F.lit(0).cast("int"))
        .withColumn("depth", F.lit(0).cast("int"))
        .withColumn("discovered_batch", F.lit(batch_id).cast("long"))
        .withColumn("attempt", F.lit(0).cast("int"))
        .select(
            "url", "url_norm", "url_hash", "host", "host_bucket", "salt",
            "priority", "depth", "discovered_batch", "attempt",
        )
    )


def dedup_within_batch(frontier: DataFrame) -> DataFrame:
    """A2: keep ONE row per url_hash — deterministically the best one by the
    engine's total order (priority, depth, discovered_batch, url).

    ``dropDuplicates`` keeps an arbitrary row under parallelism, which would
    break the ordering fixture; a min_by-style groupBy keeps determinism AND
    map-side partial aggregation (vs a window over a full shuffle+sort).
    """
    ordered_struct = F.struct(
        F.col("priority"), F.col("depth"), F.col("discovered_batch"),
        F.col("url"),  # total tie-break: url string is unique per row
        *[F.col(c) for c in frontier.columns if c not in
          ("priority", "depth", "discovered_batch", "url", "url_hash")],
    )
    best = frontier.groupBy("url_hash").agg(F.min(ordered_struct).alias("r"))
    return best.select("url_hash", "r.*").select(*frontier.columns)


def anti_join_seen(frontier: DataFrame, seen: DataFrame) -> DataFrame:
    """J1 exact tier: frontier ∖ seen on url_hash (left_anti)."""
    return frontier.join(seen.select("url_hash"), "url_hash", "left_anti")


def build_bloom(
    df: DataFrame,
    n_buckets: int,
    capacity_per_bucket: int,
    fpp: float = 0.01,
    depth: int = 2,
    _params: tuple[int, int] | None = None,
) -> BucketedBloom:
    """A4: per-partition partial Blooms merged via treeAggregate.

    Stage 1 (Arrow, vectorized): mapInPandas builds ONE partial BucketedBloom
    per Spark partition and emits its buckets as (bucket, bits) rows.
    Stage 2 (RDD, tiny): treeAggregate OR-merges the partials in a log-depth
    tree — the mandated seam (BASELINE.json:6); inputs are bit arrays, never
    row data.
    """
    n_bits, n_hashes = _params or optimal_params(max(1, capacity_per_bucket), fpp)

    out_schema = T.StructType(
        [
            T.StructField("bucket", T.IntegerType()),
            T.StructField("bits", T.BinaryType()),
        ]
    )

    def partials(batches):
        # the input is hash-partitioned by bucket, so this partition sees a
        # small, fixed set of buckets — build ONLY those filters. Total
        # partial-sketch volume is therefore n_buckets × bucket_bits,
        # INDEPENDENT of parallelism (at 10^10 keys this is what keeps the
        # merge from moving hundreds of GB).
        local: dict[int, Bloom] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf["url_hash"].to_numpy()
            buckets = pdf["_bucket"].to_numpy()
            for b in pd.unique(buckets):
                f = local.get(int(b))
                if f is None:
                    f = local[int(b)] = Bloom(n_bits, n_hashes)
                f.add(keys[buckets == b])
        if local:
            yield pd.DataFrame(
                {
                    "bucket": list(local.keys()),
                    "bits": [f.to_bytes() for f in local.values()],
                }
            )

    partial_rows = (
        df.select("url_hash")
        .withColumn("_bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int"))
        .repartition(n_buckets, "_bucket")
        .mapInPandas(partials, schema=out_schema)
    )

    def seq_op(acc: BucketedBloom, row) -> BucketedBloom:
        acc.filters[row["bucket"]].merge(
            Bloom.from_bytes(bytes(row["bits"]), n_bits, n_hashes)
        )
        return acc

    def comb_op(a: BucketedBloom, b: BucketedBloom) -> BucketedBloom:
        return a.merge(b)

    zero = BucketedBloom(n_buckets, n_bits, n_hashes)
    return partial_rows.rdd.treeAggregate(zero, seq_op, comb_op, depth=depth)


def build_bloom_like(df: DataFrame, proto: BucketedBloom, depth: int = 2) -> BucketedBloom:
    """A4 variant: build a partial sketch with the SAME parameters as an
    existing one (so it can be OR-merged into it) from df.url_hash."""
    out = build_bloom(
        df,
        n_buckets=proto.n_buckets,
        capacity_per_bucket=1,
        depth=depth,
        _params=(proto.n_bits, proto.n_hashes),
    )
    return out


def bloom_maybe_seen_udf(spark, bloom: BucketedBloom):
    """J2: broadcast the merged sketch; vectorized membership pandas UDF.

    Returns a Column factory: col(url_hash) → boolean "maybe seen".
    False ⇒ DEFINITELY unseen (bloom has no false negatives).
    """
    bc = spark.sparkContext.broadcast(list(bloom.bucket_rows()))
    holder: list[BucketedBloom] = []  # rebuild once per python worker, not per batch

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(url_hash: pd.Series) -> pd.Series:
        if not holder:
            holder.append(BucketedBloom.from_bucket_rows(bc.value))
        return pd.Series(holder[0].contains(url_hash.to_numpy()))

    return maybe_seen


def dedup_against_seen(
    spark,
    frontier: DataFrame,
    seen: DataFrame,
    bloom: BucketedBloom | None = None,
) -> DataFrame:
    """J2+J1 composed: bloom pre-filter (if available) then exact residual.

    definite-new (bloom says unseen) ∪ (maybe-seen ∖ seen) — correct because
    bloom false negatives are impossible; false positives just take the
    exact path.
    """
    if bloom is None:
        return anti_join_seen(frontier, seen)
    maybe_seen = bloom_maybe_seen_udf(spark, bloom)
    flagged = frontier.withColumn("_maybe", maybe_seen(F.col("url_hash")))
    definite_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    residual = anti_join_seen(flagged.filter(F.col("_maybe")).drop("_maybe"), seen)
    return definite_new.unionByName(residual)
