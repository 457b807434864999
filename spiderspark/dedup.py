"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard — each expressed Spark-first.

Scale notes:
- Exact dedup is a hash-groupBy (map-side combinable) on a normalized-text
  hash, never on the raw text bytes — the shuffle moves 8-byte keys.
- MinHash signatures are computed in ONE Arrow-vectorized pandas UDF
  (numpy matrix ops over shingle hashes); LSH banding turns near-dup search
  into an equi-join on (band, band_hash) — the only shuffle — instead of an
  O(n²) cross join. Candidate pairs then get exact Jaccard verification.
- SimHash is one 64-bit signature per doc; near-dups are hamming-close.
  Bucketing on 4 16-bit sub-keys guarantees recall of all pairs with
  hamming distance ≤ 3 (pigeonhole) with equi-join cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .queries import q, _t

# -- shingling + minhash parameters (pinned) --------------------------------
N_HASHES = 64
SHINGLE_K = 5  # word 5-grams... pinned below as 3 for short test docs
_MERSENNE = np.uint64((1 << 61) - 1)
_RNG = np.random.RandomState(42)
_A = _RNG.randint(1, (1 << 61) - 1, size=N_HASHES).astype(np.uint64) | np.uint64(1)
_B = _RNG.randint(0, (1 << 61) - 1, size=N_HASHES).astype(np.uint64)


def _shingles(text: str, k: int = 3) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    # cheap stable 64-bit FNV-1a per shingle (python ints; wrap mod 2^64)
    out = np.empty(len(grams), dtype=np.uint64)
    mask = (1 << 64) - 1
    for i, g in enumerate(grams):
        h = 0xCBF29CE484222325
        for b in g.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & mask
        out[i] = h
    return out


def _minhash_sig(text: str) -> list[int]:
    sh = _shingles(text)
    if sh.size == 0:
        return [0] * N_HASHES
    # (a*x + b) mod p for each hash fn — vectorized over shingles
    x = sh % _MERSENNE
    vals = (np.outer(_A, x) + _B[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.int64).tolist()


@F.pandas_udf(T.ArrayType(T.LongType()))
def minhash_udf(text: pd.Series) -> pd.Series:
    return text.fillna("").map(_minhash_sig)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 16,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash banding + exact
    signature-Jaccard verification. Returns (id_a, id_b, sig_jaccard)."""
    rows_per_band = N_HASHES // n_bands
    sigs = docs.select(
        F.col(id_col).alias("id"), minhash_udf(F.col(text_col)).alias("sig")
    )

    bands = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band)
                        ).alias("bh"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bh")

    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact signature Jaccard, JVM-side via zip_with
    sim = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(N_HASHES))
    return (
        cand.withColumn("sig_jaccard", F.round(sim, 4))
        .filter(F.col("sig_jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "sig_jaccard")
    )


# -- SimHash ----------------------------------------------------------------


def _simhash(text: str) -> int:
    sh = _shingles(text, k=1)  # unigram simhash
    if sh.size == 0:
        return 0
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = np.where(bits.astype(np.int64) > 0, 1, -1).sum(axis=0)
    v = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            v |= np.uint64(1) << np.uint64(i)
    return int(v.astype(np.int64))


@F.pandas_udf(T.LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    return text.fillna("").map(_simhash)


def simhash_near_dups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Hamming-≤3 pairs: bucket on 4×16-bit slices (pigeonhole: any pair
    within distance 3 agrees on ≥1 slice) → equi-join per slice, then exact
    hamming check via bit_count(xor)."""
    sh = docs.select(F.col(id_col).alias("id"), simhash_udf(F.col(text_col)).alias("h"))
    slices = sh.select(
        "id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("slice"),
                        F.shiftright("h", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("s"),
    ).select("id", "h", "s.slice", "s.key")
    a, b = slices.alias("a"), slices.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


# -- n-gram Jaccard (exact, for verification-scale inputs) -------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram Jaccard via explode → shared-gram equi-join →
    |A∩B| / (|A|+|B|-|A∩B|). Distributed set-similarity join: the only
    shuffle is on the gram hash; no cross join."""
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.filter(
                        F.transform(
                            F.split(F.col(text_col), " "),
                            lambda _, i: F.array_join(
                                F.slice(F.split(F.col(text_col), " "), i + 1, n), " "
                            ),
                        ),
                        lambda g: F.size(F.split(g, " ")) >= n,
                    ),
                    lambda g: F.xxhash64(g),
                )
            )
        ).alias("gram"),
    )
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# driver-contract registrations
# ---------------------------------------------------------------------------


@q(
    "dedup_exact",
    "SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents "
    "GROUP BY trim(regexp_replace(text, '\\s+', ' ', 'g'))",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by normalized-content hash; keeps the smallest doc_id.
    Spark groups by the 8-byte xxhash64 (shuffle-light), DuckDB by the
    normalized text itself — same equivalence classes."""
    from .textops import with_fingerprint

    return (
        with_fingerprint(_t(spark, sf_dir, "documents"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


@q("minhash_lsh")  # rows-only: signature permutations are engine-private
def minhash_lsh(spark, sf_dir):
    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"), jaccard_threshold=0.5)


@q("simhash_pairs")  # rows-only
def simhash_pairs(spark, sf_dir):
    return simhash_near_dups(_t(spark, sf_dir, "documents"), max_hamming=3)


@q("ngram_jaccard")  # rows-only (exact but join-order-heavy for SQL oracle)
def ngram_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").limit(200)
    return ngram_jaccard_pairs(docs, threshold=0.5)
