"""Similarity search over embedding columns: brute-force cosine top-k
(baseline) and an LSH-bucketed variant (the scale path).

Scale notes:
- Brute force is exact: broadcast the (small) query set, score every corpus
  vector with ONE Arrow-vectorized matrix multiply per batch (numpy GEMM
  inside mapInPandas — no per-row Python), then per-query top-k via the same
  deterministic window pattern the scheduler uses. Cost O(|corpus|·|queries|)
  but embarrassingly parallel over corpus partitions: at 100 TB the corpus
  never shuffles; only (query, candidate, score) survivors do.
- The LSH variant buckets vectors by the sign pattern of r random
  hyperplane projections (signed random projections — the public SimHash-
  for-cosine construction). Neighbors are searched only within a bucket →
  equi-join on the bucket key; multi-probe (flipping one bit) trades recall
  for cost without re-scanning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from .queries import q, _t

_N_PLANES = 8  # 2^8 buckets; raise for bigger corpora (buckets ~ n/100)
_PLANES_SEED = 42


def _planes(dim: int, n_planes: int = _N_PLANES) -> np.ndarray:
    rng = np.random.RandomState(_PLANES_SEED)
    return rng.standard_normal((dim, n_planes))


def brute_force_topk(
    corpus: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    driver_collect_limit: int = 65_536,
    n_queries_hint: int | None = None,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Small query sets (≤ ``driver_collect_limit``) are collected + broadcast
    and scoring runs as one numpy GEMM per Arrow batch via mapInPandas —
    the fast path. A query set past the limit would be a driver-sized
    object, so it routes to :func:`brute_force_topk_blocked` instead —
    same exact result, fully distributed, no driver collect.
    ``n_queries_hint``: callers that already know the query-set size can
    pass it to skip the bounded probe collect when it exceeds the limit
    (the hint only short-circuits the routing; exactness is unaffected).
    Returns (q_id, n_id, cos) with deterministic (cos desc, n_id) top-k.
    """
    if n_queries_hint is not None and n_queries_hint > driver_collect_limit:
        return brute_force_topk_blocked(corpus, queries_df, k, id_col, vec_col)
    spark = corpus.sparkSession
    qrows = queries_df.select(id_col, vec_col).limit(
        driver_collect_limit + 1
    ).collect()
    if len(qrows) > driver_collect_limit:
        return brute_force_topk_blocked(corpus, queries_df, k, id_col, vec_col)
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    out_schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("n_id", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def score(batches):
        ids_q, mat_q = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            n_ids = pdf["_id"].to_numpy(dtype=np.int64)
            c = np.array(pdf["_vec"].tolist(), dtype=np.float64)
            c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
            sims = c @ mat_q.T  # (batch, n_queries) — one GEMM
            # per-partition pre-top-k under the SAME total order as the
            # final window (cos desc, n_id asc). O(n) argpartition selects
            # the top-k scores; because a bare argpartition keeps an
            # ARBITRARY member of cos-tied candidates at the k boundary
            # (partitioning-dependent result), the candidate set is widened
            # to every row scoring >= the k-th score, then only that small
            # slice is lexsorted for the deterministic tie-break.
            for qi in range(len(ids_q)):
                s = sims[:, qi]
                if len(s) > k:
                    thresh = s[np.argpartition(-s, k - 1)[:k]].min()
                    cand = np.flatnonzero(s >= thresh)
                else:
                    cand = np.arange(len(s))
                idx = cand[np.lexsort((n_ids[cand], -s[cand]))[:k]]
                yield pd.DataFrame(
                    {
                        "q_id": ids_q[qi],
                        "n_id": n_ids[idx],
                        "cos": s[idx],
                    }
                )

    scored = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    ).mapInPandas(score, schema=out_schema)

    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "n_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("q_id", "n_id", F.round("cos", 4).alias("cos"))
    )


def _cos_expr(a, b):
    """Exact cosine between two array<double> columns — pure JVM HOFs."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, v: acc + v)
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0),
                    lambda acc, v: acc + v)
    )
    # per-VECTOR clamp, matching the GEMM tier's np.maximum(norm, 1e-12)
    # normalization exactly: max(a,eps)*max(b,eps), NOT max(a*b,eps) — the
    # two differ by up to 1/eps for a subnormal-norm vector paired with a
    # large one, which would flip top-k between the tiers
    return dot / (
        F.greatest(norm(a), F.lit(1e-12)) * F.greatest(norm(b), F.lit(1e-12))
    )


def brute_force_topk_blocked(
    corpus: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """Exact brute-force top-k with NO driver-side query object — the
    large-query-set tier behind :func:`brute_force_topk`.

    The cross product is expressed as a distributed equi-join (the same
    probes→equi-join shape as the LSH/IVF paths): the corpus gets a block
    id, every query probes every block via a JVM explode, and each
    (query, corpus) pair meets exactly once. Top-k is the scheduler's
    two-phase pattern: rank within (q_id, block) first — the join output is
    already clustered by block, so phase 1 plans exchange-free and its
    LITERAL k bound keeps the WindowGroupLimit bounded-sort — then the
    global per-query window ranks only n_blocks × k rows per query.
    Shuffle volume is O(|C| + |Q|·n_blocks), never O(|C|·|Q|).
    """
    spark = corpus.sparkSession
    if n_blocks is None:
        n_blocks = max(spark.sparkContext.defaultParallelism, 8)
    corpus_b = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).cast("array<double>").alias("n_vec"),
    ).withColumn("block", F.pmod(F.hash("n_id"), F.lit(n_blocks)).cast("int"))
    probes = queries_df.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn("block", F.explode(F.array(*[F.lit(i) for i in range(n_blocks)])))
    scored = corpus_b.join(probes, "block").withColumn(
        "cos", _cos_expr(F.col("n_vec"), F.col("q_vec"))
    )
    w1 = Window.partitionBy("q_id", "block").orderBy(F.col("cos").desc(), "n_id")
    local = (
        scored.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.lit(int(k)))
        .drop("_r1")
    )
    w2 = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "n_id")
    return (
        local.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .select("q_id", "n_id", F.round("cos", 4).alias("cos"))
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = _N_PLANES,
) -> DataFrame:
    """Approximate cosine top-k: signed-random-projection buckets + exact
    rescoring within each bucket (plus 1-bit multi-probe for recall)."""
    spark = corpus.sparkSession

    first = corpus.select(vec_col).first()
    dim = len(first[0])
    planes = _planes(dim, n_planes)
    bc_planes = spark.sparkContext.broadcast(planes)

    @F.pandas_udf(T.IntegerType())
    def bucket_udf(vec: pd.Series) -> pd.Series:
        p = bc_planes.value
        m = np.array(vec.tolist(), dtype=np.float64)
        signs = (m @ p) > 0
        keys = (signs * (1 << np.arange(p.shape[1]))).sum(axis=1)
        return pd.Series(keys.astype(np.int32))

    corpus_b = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    ).withColumn("bucket", bucket_udf("n_vec"))

    # queries probe their own bucket + each 1-bit-flip neighbor bucket.
    # Query bucketing runs through the SAME distributed UDF as the corpus
    # and multi-probe expansion is a JVM explode — no driver-side collect,
    # so the query set may itself be a large table (it shuffles only as the
    # small side of the bucket equi-join).
    probes = (
        queries_df.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).cast("array<double>").alias("q_vec"),
        )
        .withColumn("_b0", bucket_udf("q_vec"))
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.col("_b0"),
                    *[
                        F.col("_b0").bitwiseXOR(F.lit(1 << i))
                        for i in range(n_planes)
                    ],
                )
            ),
        )
        .drop("_b0")
    )

    joined = corpus_b.join(probes, "bucket")  # AQE broadcasts a small side
    scored = joined.withColumn(
        "cos", _cos_expr(F.col("n_vec").cast("array<double>"), F.col("q_vec"))
    ).dropDuplicates(["q_id", "n_id"])
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "n_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("q_id", "n_id", F.round("cos", 4).alias("cos"))
    )


def _train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 8) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (normalized
    vectors, cosine ≡ dot). Sample is small by construction; the expensive
    assignment of the full corpus is distributed."""
    rng = np.random.RandomState(_PLANES_SEED)
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cents = sample[rng.choice(len(sample), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    n_probe: int = 4,
    train_sample: int = 10_000,
) -> DataFrame:
    """IVF (inverted-file) approximate cosine top-k.

    Train: k-means centroids on a deterministic driver-side sample.
    Index: one distributed pass assigns every corpus vector its nearest
    centroid (numpy GEMM per Arrow batch) — the inverted lists are just a
    ``list_id`` column, so at scale the index IS the table layout
    (partition/cluster by list_id; queries touch n_probe lists only).
    Search: each query probes its n_probe nearest centroids → equi-join on
    list_id → exact rescoring inside the probed lists.
    """
    spark = corpus.sparkSession

    sample_rows = corpus.select(vec_col).limit(train_sample).collect()
    sample = np.array([r[0] for r in sample_rows], dtype=np.float64)
    if n_centroids is None:
        n_centroids = max(2, min(256, int(np.sqrt(len(sample)) * 2)))
    n_probe = min(n_probe, n_centroids)
    cents = _train_centroids(sample, n_centroids)
    bc_cents = spark.sparkContext.broadcast(cents)

    @F.pandas_udf(T.IntegerType())
    def list_udf(vec: pd.Series) -> pd.Series:
        c = bc_cents.value
        m = np.array(vec.tolist(), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ c.T, axis=1).astype(np.int32))

    corpus_l = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    ).withColumn("list_id", list_udf("n_vec"))

    # query probes via the same distributed centroid assignment (top-n_probe
    # nearest lists per query, stable order) + a JVM posexplode — no driver
    # collect of the query set; only the small centroid matrix is broadcast
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_lists_udf(vec: pd.Series) -> pd.Series:
        c = bc_cents.value
        m = np.array(vec.tolist(), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ c.T), axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    probes = (
        queries_df.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).cast("array<double>").alias("q_vec"),
        )
        .withColumn("list_id", F.explode(probe_lists_udf("q_vec")))
    )

    joined = corpus_l.join(probes, "list_id")  # AQE broadcasts a small side
    scored = joined.withColumn(
        "cos", _cos_expr(F.col("n_vec").cast("array<double>"), F.col("q_vec"))
    ).dropDuplicates(["q_id", "n_id"])
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "n_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("q_id", "n_id", F.round("cos", 4).alias("cos"))
    )


# ---------------------------------------------------------------------------
# driver-contract registrations (brute force is EXACT → full DuckDB value
# oracle; the approximate variants stay rows-only with recall pinned by the
# planted-neighbor tests)
# ---------------------------------------------------------------------------


def _split(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") >= 10), emb.filter(F.col("vec_id") < 10)


@q(
    "ann_bruteforce",
    # explicit dot/norm formula (not list_cosine_similarity) so the engine's
    # zero-norm clamp is mirrored exactly: the GEMM kernel normalizes each
    # side by max(norm, 1e-12), so the denominator is the PRODUCT of
    # per-vector clamps — greatest(‖c‖,1e-12) * greatest(‖q‖,1e-12), not
    # greatest(‖c‖·‖q‖,1e-12) (those differ by up to 1/eps for a
    # subnormal-norm vector paired with a large one). A zero embedding
    # scores 0.0 on both sides instead of NaN in DuckDB only.
    # Both sides cast to DOUBLE[] so the only remaining divergence vs the
    # numpy-GEMM kernel is summation order (~1e-15 — absorbed by round 4; a
    # cosine sitting EXACTLY on a .00005 boundary could still flip the
    # rounded digit — accepted: probability ~0 for continuous test vectors);
    # top-k is deterministic under the shared (cos desc, n_id) order
    "SELECT q_id, n_id, round(cos, 4) AS cos FROM ("
    "SELECT q.vec_id AS q_id, c.vec_id AS n_id, "
    "list_dot_product(CAST(c.embedding AS DOUBLE[]), "
    "CAST(q.embedding AS DOUBLE[])) / ("
    "greatest(sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), "
    "CAST(c.embedding AS DOUBLE[]))), 1e-12) * "
    "greatest(sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), "
    "CAST(q.embedding AS DOUBLE[]))), 1e-12)) AS cos "
    "FROM embeddings c, embeddings q "
    "WHERE c.vec_id >= 10 AND q.vec_id < 10) "
    "QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) <= 10",
)
def ann_bruteforce(spark, sf_dir):
    corpus, queries_df = _split(spark, sf_dir)
    return brute_force_topk(corpus, queries_df, k=10)


@q("ann_approx")  # rows-only: both approximate ANN variants, tagged per
def ann_approx(spark, sf_dir):  # method (one registry row — the external
    """LSH-bucketed + IVF approximate top-k in one tagged result (the
    driver records at most 50 queries; recall for each method is pinned by
    the planted-neighbor tests in test_pipeline_ops)."""
    corpus, queries_df = _split(spark, sf_dir)
    lsh = lsh_bucketed_topk(corpus, queries_df, k=10)
    ivf = ivf_topk(corpus, queries_df, k=10)
    return lsh.select(F.lit("lsh").alias("method"), "q_id", "n_id", "cos").unionByName(
        ivf.select(F.lit("ivf").alias("method"), "q_id", "n_id", "cos")
    )
