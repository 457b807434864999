"""JVM↔Python parity checks: the pure kernels must agree with Spark's
built-ins where both exist (xxhash64), and the pandas-UDF wrappers must
return the same values as the pure functions."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from spiderspark.canon import canonicalize_series, extract_text_series, host_of_series
from spiderspark.frontier import canonicalize_udf, host_udf, with_canonical
from spiderspark.hashing import xxhash64_int

SAMPLES = [
    "",
    "a",
    "abc",
    "http://example.com/",
    "x" * 7,
    "y" * 8,
    "z" * 31,
    "w" * 32,
    "q" * 100,
    "héllo wörld üñî",
    "http://host3.example/p/12345?q=1&b=2",
    "中文字符串",
]


def test_xxhash64_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    for row in df.collect():
        assert xxhash64_int(row["s"]) == row["h"], row["s"]


def test_with_canonical_matches_pure(spark):
    urls = [
        "http://Example.COM:80/a/../b?x=%41",
        "https://HOST1.example/p/10",
        "ftp://ignored.example/x",  # non-http -> filtered
        "http://host2.example/%7Euser#frag",
        "not a url at all ://",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {
        r["url"]: (r["url_norm"], r["url_hash"], r["host"])
        for r in with_canonical(df).collect()
    }
    pure = canonicalize_series(pd.Series(urls))
    hosts = host_of_series(pure)
    for u, norm, host in zip(urls, pure, hosts):
        if not norm.startswith("http") or host == "":
            assert u not in got
        else:
            assert got[u] == (norm, xxhash64_int(norm), host)


def test_udfs_match_pure_kernels(spark):
    urls = ["http://A.example/x/../y", "https://b.example:443/z?q=%7e"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(
        canonicalize_udf("url").alias("n"), host_udf(canonicalize_udf("url")).alias("h")
    ).collect()
    pure_n = list(canonicalize_series(pd.Series(urls)))
    pure_h = list(host_of_series(pd.Series(pure_n)))
    assert [r["n"] for r in rows] == pure_n
    assert [r["h"] for r in rows] == pure_h


def test_extract_text_udf_byte_identity(spark):
    """The engine's Spark-side extraction output equals the pinned pure
    function byte-for-byte (BASELINE.json:15)."""
    from spiderspark.crawl import extract_text_udf
    from spiderspark.pages import gen_pages_pdf

    pdf = gen_pages_pdf(np.arange(64), 64)
    df = spark.createDataFrame(pdf[["url", "html"]])
    got = {r["url"]: r["t"] for r in df.select("url", extract_text_udf("html").alias("t")).collect()}
    want = dict(zip(pdf["url"], extract_text_series(pdf["html"])))
    assert got == want
    # and the generator's text column is that same pinned output
    assert dict(zip(pdf["url"], pdf["text"])) == want
