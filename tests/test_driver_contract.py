"""Runs the exact check the external driver runs: every ``queries()`` entry
vs its ``oracle_sql()`` DuckDB result at sf0.01 (row count + column names +
order-insensitive values); rows-only entries must at least execute and
return a stable schema (SURVEY.md §3.2)."""

import os

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF_DIR, t)}.parquet')"
        )
    yield con
    con.close()


def _norm(d):
    d = d.reindex(sorted(d.columns), axis=1)
    if len(d.columns):
        d = d.sort_values(by=list(d.columns))
    return d.reset_index(drop=True).astype(str)


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == [
        "batch_id", "rank", "url", "url_norm", "url_hash", "host",
        "priority", "depth", "attempt",
    ]


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_query_against_oracle(spark, duck, name):
    fn = E.queries()[name]
    oracle = E.oracle_sql()
    spdf = fn(spark, SF_DIR).toPandas()
    if name not in oracle:
        assert spdf.shape[1] > 0  # rows-only: executes, stable schema
        return
    ddf = duck.execute(oracle[name]).df()
    assert len(spdf) == len(ddf), f"{name}: row count {len(spdf)} vs {len(ddf)}"
    assert list(spdf.columns) == list(ddf.columns), f"{name}: column names"
    assert _norm(spdf).equals(_norm(ddf)), f"{name}: values diverged"


def test_every_oracle_key_has_query():
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql).issubset(set(qs))
