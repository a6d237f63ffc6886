"""Snapshot-committed table catalog — the Iceberg-shaped storage layer
(SURVEY §7: "fallback: parquet + manifest table if Iceberg runtime jar
is unavailable in sandbox — same API shape").

A table is a directory:

    <root>/<name>/
        data/<uuid>/part-*.parquet      immutable data file sets
        _versions/v00000001.json        manifest: ordered list of data sets
        _versions/...                   one per committed snapshot

A commit writes a new data set directory, then atomically renames a new
manifest into ``_versions/`` — readers always see a complete snapshot
(the analog of the reference's per-batch SQLite transactions,
/root/reference/app/core.py:167-190, and of Iceberg's snapshot commits).
Provided operations mirror SURVEY §2.1's sink inventory:

    append            S4  (batch insert)
    overwrite         S9  (truncate + insert)
    delete_where      S7/S8 (row-level delete -> rewrite w/ anti filter)
    upsert            S3/S13 (MERGE INTO by key: matched update,
                      unmatched insert)
    read(version=)    time travel over snapshots
    history/rollback  snapshot maintenance (S10 analog)
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str, name: str):
        self.spark = spark
        self.path = os.path.join(root, name)
        self.name = name
        os.makedirs(os.path.join(self.path, "_versions"), exist_ok=True)
        os.makedirs(os.path.join(self.path, "data"), exist_ok=True)

    # ---- snapshot bookkeeping -------------------------------------------

    def _versions(self) -> list[int]:
        vdir = os.path.join(self.path, "_versions")
        return sorted(
            int(f[1:9]) for f in os.listdir(vdir) if f.startswith("v") and f.endswith(".json")
        )

    def current_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self.path, "_versions", f"v{version:08d}.json")) as fh:
            return json.load(fh)

    def _commit(self, data_sets: list[str], op: str, meta: dict | None = None) -> int:
        version = (self.current_version() or 0) + 1
        manifest = {
            "version": version,
            "op": op,
            "data_sets": data_sets,
            "ts": time.time(),
            "meta": meta or {},
        }
        tmp = os.path.join(self.path, "_versions", f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        # atomic publish: rename is the commit point
        os.replace(tmp, os.path.join(self.path, "_versions", f"v{version:08d}.json"))
        return version

    def _write_data_set(self, df: DataFrame) -> str:
        ds = uuid.uuid4().hex
        df.write.mode("overwrite").parquet(os.path.join(self.path, "data", ds))
        return ds

    # ---- reads ------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.name} has no snapshots")
        sets = self._manifest(v)["data_sets"]
        if not sets:
            raise FileNotFoundError(f"table {self.name} v{v} is empty")
        paths = [os.path.join(self.path, "data", ds) for ds in sets]
        return self.spark.read.parquet(*paths)

    def history(self) -> list[dict]:
        return [self._manifest(v) for v in self._versions()]

    # ---- writes -----------------------------------------------------------

    def overwrite(self, df: DataFrame) -> int:
        return self._commit([self._write_data_set(df)], "overwrite")

    def append(self, df: DataFrame) -> int:
        cur = self.current_version()
        prev = self._manifest(cur)["data_sets"] if cur else []
        return self._commit(prev + [self._write_data_set(df)], "append")

    def delete_where(self, condition) -> int:
        """S7/S8: row-level delete as copy-on-write rewrite (what Iceberg
        COW does under MERGE ... WHEN MATCHED THEN DELETE)."""
        remaining = self.read().filter(~condition)
        return self._commit([self._write_data_set(remaining)], "delete_where")

    def upsert(self, updates: DataFrame, key_cols: list[str]) -> int:
        """S3/S13: MERGE INTO — matched rows replaced, unmatched inserted
        (INSERT OR REPLACE semantics, core.py:152-165). Implemented as
        anti-join + union: the Delta/Iceberg-free MERGE emulation."""
        cur = self.read()
        kept = cur.join(updates.select(*key_cols), key_cols, "left_anti")
        merged = kept.unionByName(updates.select(*cur.columns))
        return self._commit([self._write_data_set(merged)], "upsert")

    def rollback(self, version: int) -> int:
        sets = self._manifest(version)["data_sets"]
        return self._commit(sets, "rollback", {"to": version})

    def compact(self) -> int:
        """S10 maintenance: rewrite all live data sets into one
        (rewrite_data_files analog); old sets stay for time travel."""
        return self._commit([self._write_data_set(self.read())], "compact")


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def table(self, name: str) -> SnapshotTable:
        return SnapshotTable(self.spark, self.root, name)

    def tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d, "_versions"))
        )
