"""sf0.1-scale recall regression pins for every APPROXIMATE family.

The planted-neighbor tests in test_pipeline_ops pin recall at toy scale
(~200 rows); these pin a LOWER BOUND at the sf0.1 row counts (5,000 docs /
2,000 vectors) with deterministic synthetic plants, so a future parameter
change (bands, planes, probes, slice widths) that silently degrades recall
at scale fails a test instead of shipping. Bounds are deliberately
conservative — they catch parameter regressions, not sampling noise.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

N_DOCS = 5_000      # sf0.1 documents row count
N_VECS = 2_000      # sf0.1 embeddings row count
N_PLANT = 60
DIM = 16


@pytest.fixture(scope="module")
def planted_docs(spark):
    """N_DOCS random-token docs; the last 2×N_PLANT rows are plants:
    N_PLANT exact copies of docs 0..N_PLANT-1 and N_PLANT one-token edits
    of docs N_PLANT..2*N_PLANT-1 (high-Jaccard near dups)."""
    rng = np.random.RandomState(1234)
    vocab = np.array([f"w{i:03d}" for i in range(500)])
    body = [
        " ".join(vocab[rng.randint(0, len(vocab), 60)]) for _ in range(N_DOCS)
    ]
    exact = list(body[:N_PLANT])
    near = []
    for i in range(N_PLANT, 2 * N_PLANT):
        toks = body[i].split(" ")
        toks[int(rng.randint(0, len(toks)))] = "zzz"  # one-token edit
        near.append(" ".join(toks))
    texts = body + exact + near
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).repartition(8).localCheckpoint(eager=True)


def _doc_truth_pairs():
    exact = {(i, N_DOCS + i) for i in range(N_PLANT)}
    near = {(i, N_DOCS + i) for i in range(N_PLANT, 2 * N_PLANT)}
    return exact, near


def test_minhash_lsh_recall_at_scale(spark, planted_docs):
    from spiderspark.dedup import minhash_lsh_pairs

    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            planted_docs, jaccard_threshold=0.7
        ).collect()
    }
    exact, near = _doc_truth_pairs()
    assert len(got & exact) == len(exact)  # exact dups: recall 1 always
    near_recall = len(got & near) / len(near)
    assert near_recall >= 0.9, f"one-token near-dup recall {near_recall}"


def test_simhash_recall_at_scale(spark, planted_docs):
    from spiderspark.dedup import simhash_near_dups

    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dups(planted_docs).collect()
    }
    exact, near = _doc_truth_pairs()
    assert len(got & exact) == len(exact)  # hamming 0: pigeonhole-guaranteed
    # a one-token edit flips a handful of simhash bits; hamming ≤ 3 catches
    # a large share, and every caught pair is guaranteed by the pigeonhole
    # construction (no sampling in the operator itself)
    near_recall = len(got & near) / len(near)
    assert near_recall >= 0.5, f"one-token near-dup recall {near_recall}"


@pytest.fixture(scope="module")
def planted_vectors(spark):
    """N_VECS corpus vectors; 100 query vectors, each a small perturbation
    of corpus vector q (its true nearest neighbor with cos > 0.99)."""
    rng = np.random.RandomState(77)
    corpus = rng.standard_normal((N_VECS, DIM))
    queries = corpus[:100] + rng.standard_normal((100, DIM)) * 0.02
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(corpus)],
        "vec_id long, embedding array<double>",
    ).repartition(8).localCheckpoint(eager=True)
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(queries)],
        "vec_id long, embedding array<double>",
    ).localCheckpoint(eager=True)
    return cdf, qdf


def _topk_recall(rows, k_expected=10):
    """Fraction of queries whose planted true-NN (n_id == q_id) made top-k."""
    hit = {r["q_id"] for r in rows if r["n_id"] == r["q_id"]}
    return len(hit) / 100


def test_ann_lsh_recall_at_scale(spark, planted_vectors):
    from spiderspark.ann import lsh_bucketed_topk

    corpus, queries = planted_vectors
    rows = lsh_bucketed_topk(corpus, queries, k=10).collect()
    recall = _topk_recall(rows)
    assert recall >= 0.9, f"LSH planted-NN recall {recall}"


def test_ann_ivf_recall_at_scale(spark, planted_vectors):
    from spiderspark.ann import ivf_topk

    corpus, queries = planted_vectors
    rows = ivf_topk(corpus, queries, k=10).collect()
    recall = _topk_recall(rows)
    assert recall >= 0.9, f"IVF planted-NN recall {recall}"


def test_embedding_lsh_near_dup_recall_at_scale(spark, planted_vectors):
    from spiderspark.dedup import embedding_near_dups

    corpus, _ = planted_vectors
    rng = np.random.RandomState(99)
    pdf = corpus.toPandas().sort_values("vec_id")
    m = np.array(pdf["embedding"].tolist())
    plants = m[:100] + rng.standard_normal((100, DIM)) * 0.02
    both = np.vstack([m, plants])
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(both)],
        "vec_id long, embedding array<double>",
    )
    mn = both / np.linalg.norm(both, axis=1, keepdims=True)
    want = {
        (int(i), int(N_VECS + i))
        for i in range(100)
        if float(mn[i] @ mn[N_VECS + i]) >= 0.95
    }
    assert len(want) >= 80  # the plant construction itself held up
    rows = embedding_near_dups(
        df, threshold=0.95, method="lsh", n_planes=8, n_tables=6
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"embedding-LSH near-dup recall {recall}"
    for r in rows:
        assert r["cos"] >= 0.95  # exact verify: no false positives
