"""Snapshot store: Iceberg snapshot semantics for exact resume
(BASELINE.json:6; SURVEY.md §7.4).

No Iceberg runtime jar exists in this sandbox (verified — SURVEY.md §0.4),
so the engine targets a ``SnapshotStore`` interface with two impls:

- ``ParquetManifestStore`` (used everywhere in-sandbox): each commit writes
  immutable parquet file-sets then atomically renames a JSON manifest into
  place; ``HEAD`` is an atomic pointer file. This reproduces the Iceberg
  properties the engine relies on — atomic snapshot commit, snapshot-id time
  travel, parent lineage — with plain files.
- ``IcebergStore``: the thin cluster adapter over ``spark.read.format
  ("iceberg")`` / ``df.writeTo(...).append()``; requires the
  iceberg-spark-runtime jar + catalog conf at spark-submit time, so it is
  documented and smoke-guarded but not testable here.

Manifest schema (one JSON per snapshot):
  {snapshot_id, parent_id, batch_id, committed_unix, tables:
    {name: {path, row_count}}, lineage: {name: [{partition_id, rows}]}}
"""

from __future__ import annotations

import json
import os
import time
import uuid
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession, functions as F


class SnapshotStore(ABC):
    @abstractmethod
    def commit(
        self,
        tables: dict[str, DataFrame],
        batch_id: int,
        parent_id: int | None,
        partition_by: dict[str, list[str]] | None = None,
    ) -> int: ...

    @abstractmethod
    def read(self, spark: SparkSession, snapshot_id: int, table: str) -> DataFrame: ...

    @abstractmethod
    def head(self) -> int | None: ...

    @abstractmethod
    def manifest(self, snapshot_id: int) -> dict: ...


class ParquetManifestStore(SnapshotStore):
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    def _manifest_path(self, snapshot_id: int) -> str:
        return os.path.join(self.root, "manifests", f"{snapshot_id:012d}.json")

    def _next_id(self) -> int:
        """Ids allocate from max(existing)+1, not parent+1: two commits that
        share a parent must NOT collide on the same id (the second would
        silently clobber the first's manifest and break time travel)."""
        mdir = os.path.join(self.root, "manifests")
        ids = [
            int(f[:-5])
            for f in os.listdir(mdir)
            if f.endswith(".json") and f[:-5].isdigit()
        ]
        return (max(ids) + 1) if ids else 1

    def commit(
        self,
        tables: dict[str, DataFrame],
        batch_id: int,
        parent_id: int | None,
        partition_by: dict[str, list[str]] | None = None,
    ) -> int:
        snapshot_id = max(self._next_id(), (parent_id or 0) + 1)
        partition_by = partition_by or {}
        entry: dict = {
            "snapshot_id": snapshot_id,
            "parent_id": parent_id,
            "batch_id": batch_id,
            "committed_unix": time.time(),
            "tables": {},
            "lineage": {},
        }
        for name, df in tables.items():
            rel = f"data/{name}/snap{snapshot_id:012d}-{uuid.uuid4().hex[:8]}"
            path = os.path.join(self.root, rel)
            writer = df.write.mode("errorifexists")
            if name in partition_by:
                writer = writer.partitionBy(*partition_by[name])
            writer.parquet(path)
            # per-partition lineage read back from the files just written —
            # records exactly what was committed (BASELINE.json:14). The
            # read is schema-pinned: an EMPTY table commit writes only
            # _SUCCESS, and schema inference on a files-less dir raises.
            spark = df.sparkSession
            written = spark.read.schema(df.schema).parquet(path)
            lineage = [
                {"partition_id": r["pid"], "rows": r["rows"]}
                for r in written.groupBy(
                    F.spark_partition_id().alias("pid")
                ).agg(F.count(F.lit(1)).alias("rows")).collect()
            ]
            entry["tables"][name] = {
                "path": rel,
                "row_count": int(sum(l["rows"] for l in lineage)),
                # schema rides the manifest so time travel to an empty
                # table (zero data files) stays readable without inference
                "schema": df.schema.jsonValue(),
            }
            entry["lineage"][name] = lineage

        # atomic commit: write tmp manifest then hardlink into place — the
        # link fails (EEXIST) instead of clobbering if the id was raced
        mpath = self._manifest_path(snapshot_id)
        tmp = mpath + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.link(tmp, mpath)
        os.unlink(tmp)
        head_tmp = os.path.join(self.root, f"HEAD.tmp-{uuid.uuid4().hex[:8]}")
        with open(head_tmp, "w") as f:
            f.write(str(snapshot_id))
        os.rename(head_tmp, os.path.join(self.root, "HEAD"))
        return snapshot_id

    def table_path(self, snapshot_id: int, table: str) -> str:
        """Filesystem path of a committed table — the seam that lets the
        distributed sketch side-read its bucket slices straight from the
        store after resume (no driver rebuild)."""
        m = self.manifest(snapshot_id)
        return os.path.join(self.root, m["tables"][table]["path"])

    def read(self, spark: SparkSession, snapshot_id: int, table: str) -> DataFrame:
        from pyspark.sql import types as T

        meta = self.manifest(snapshot_id)["tables"][table]
        reader = spark.read
        if "schema" in meta:  # pre-schema manifests fall back to inference
            reader = reader.schema(T.StructType.fromJson(meta["schema"]))
        return reader.parquet(self.table_path(snapshot_id, table))

    def head(self) -> int | None:
        p = os.path.join(self.root, "HEAD")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def manifest(self, snapshot_id: int) -> dict:
        with open(self._manifest_path(snapshot_id)) as f:
            return json.load(f)

    def validate(self, snapshot_id: int, spark: SparkSession) -> bool:
        """Resume precondition: every table's files readable and row counts
        match the manifest (per-partition lineage integrity)."""
        m = self.manifest(snapshot_id)
        for name, meta in m["tables"].items():
            n = self.read(spark, snapshot_id, name).count()
            if n != meta["row_count"]:
                return False
        return True


class IcebergStore(SnapshotStore):
    """Cluster adapter — requires iceberg-spark-runtime on the classpath and
    a configured catalog, e.g.::

        spark-submit --py-files spiderspark.zip \\
          --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
          --conf spark.sql.catalog.crawl=org.apache.iceberg.spark.SparkCatalog \\
          --conf spark.sql.catalog.crawl.type=hadoop \\
          --conf spark.sql.catalog.crawl.warehouse=<path> job.py

    Not executable in this sandbox (no jar, no network — SURVEY.md §0.4);
    kept as the documented deployment path behind the same interface.
    """

    def __init__(self, spark: SparkSession, catalog: str, namespace: str):
        self.spark = spark
        self.prefix = f"{catalog}.{namespace}"
        try:
            spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.prefix}")
        except Exception as exc:  # pragma: no cover - sandbox has no jar
            raise RuntimeError(
                "Iceberg runtime not available; use ParquetManifestStore"
            ) from exc

    def commit(self, tables, batch_id, parent_id, partition_by=None):  # pragma: no cover
        for name, df in tables.items():
            full = f"{self.prefix}.{name}"
            df.writeTo(full).createOrReplace()
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self.prefix}.frontier.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(row[0][0]) if row else 0

    def read(self, spark, snapshot_id, table):  # pragma: no cover
        return (
            spark.read.format("iceberg")
            .option("snapshot-id", snapshot_id)
            .load(f"{self.prefix}.{table}")
        )

    def head(self):  # pragma: no cover
        return None

    def manifest(self, snapshot_id):  # pragma: no cover
        return {}
