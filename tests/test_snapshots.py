"""ParquetManifestStore semantics (SURVEY.md §7.4): atomic commit, HEAD
pointer, snapshot-id time travel, parent lineage, row-count validation."""

import json
import os
import tempfile

import pytest

from spiderspark.snapshots import ParquetManifestStore


@pytest.fixture()
def store():
    return ParquetManifestStore(tempfile.mkdtemp(prefix="spidersnap-"))


def test_commit_head_read(spark, store):
    df1 = spark.range(10).withColumnRenamed("id", "x")
    s1 = store.commit({"t": df1}, batch_id=1, parent_id=None)
    assert store.head() == s1
    assert store.read(spark, s1, "t").count() == 10

    df2 = spark.range(25).withColumnRenamed("id", "x")
    s2 = store.commit({"t": df2}, batch_id=2, parent_id=s1)
    assert store.head() == s2
    # time travel: the old snapshot still reads the old data
    assert store.read(spark, s1, "t").count() == 10
    assert store.read(spark, s2, "t").count() == 25
    assert store.manifest(s2)["parent_id"] == s1


def test_manifest_lineage_and_validate(spark, store):
    df = spark.range(100).repartition(4).withColumnRenamed("id", "x")
    s = store.commit({"t": df}, batch_id=1, parent_id=None)
    m = store.manifest(s)
    lineage = m["lineage"]["t"]
    assert sum(p["rows"] for p in lineage) == 100
    assert m["tables"]["t"]["row_count"] == 100
    assert store.validate(s, spark)


def test_validate_detects_corruption(spark, store):
    df = spark.range(10).withColumnRenamed("id", "x")
    s = store.commit({"t": df}, batch_id=1, parent_id=None)
    # corrupt the manifest's claimed row count
    mpath = store._manifest_path(s)
    m = json.load(open(mpath))
    m["tables"]["t"]["row_count"] = 999
    json.dump(m, open(mpath, "w"))
    assert not store.validate(s, spark)


def test_multi_table_commit(spark, store):
    s = store.commit(
        {"a": spark.range(3), "b": spark.range(7)}, batch_id=1, parent_id=None
    )
    assert store.read(spark, s, "a").count() == 3
    assert store.read(spark, s, "b").count() == 7


def test_commit_files_are_immutable(spark, store):
    df = spark.range(5)
    s1 = store.commit({"t": df}, batch_id=1, parent_id=None)
    path1 = store.manifest(s1)["tables"]["t"]["path"]
    s2 = store.commit({"t": spark.range(6)}, batch_id=2, parent_id=s1)
    path2 = store.manifest(s2)["tables"]["t"]["path"]
    assert path1 != path2  # append-only file sets, never overwritten
    assert os.path.exists(os.path.join(store.root, path1))
