"""Snapshot-committed table catalog — the Iceberg-shaped storage layer
(SURVEY §7: "fallback: parquet + manifest table if Iceberg runtime jar
is unavailable in sandbox — same API shape").

A table is a directory:

    <root>/<name>/
        data/<uuid>/_b=<k>/part-*.parquet   immutable bucketed data sets
        _versions/v00000001.json            manifest: ordered (path, bucket)
        _versions/...                       one per committed snapshot

Data is hash-BUCKETED on one column (``bucket_col`` — default ``repo``
when present, else the first column; pinned in the manifest at first
commit). A commit writes only NEW data-set directories and then
atomically renames a new manifest into ``_versions/`` — readers always
see a complete snapshot (the analog of the reference's per-batch SQLite
transactions, /root/reference/app/core.py:167-190, and of Iceberg's
snapshot commits).

Buckets make row-level commits PARTITION-SCOPED copy-on-write, like
Iceberg COW: ``delete_where`` / ``upsert`` rewrite only the buckets
that contain affected rows and carry every other bucket's files over
BY REFERENCE — a 100-row delete against a 100 TB table rewrites
~1/n_buckets of it, not all of it (tests assert untouched buckets'
parquet files are byte-identical across a delete commit). All manifest
I/O goes through the Hadoop FileSystem of the root's scheme, so the
catalog works on hdfs:// / s3a:// roots, not only the driver's disk.

Concurrency caveat: the commit point is ``FileSystem.rename``, which
refuses an existing destination ATOMICALLY on HDFS and local/file://
roots — there the lost-update guard (ConcurrentCommitError) is sound.
S3A's rename is a non-atomic HEAD-then-COPY, so on s3a:// two racing
commits of the same version can both "succeed" — exactly why Iceberg
requires a catalog service (metastore/REST/DynamoDB lock) for its
atomic swap on object stores. On s3a, serialize writers externally or
front the manifest swap with a real CAS; reads and time travel are
safe everywhere.

Provided operations mirror SURVEY §2.1's sink inventory:

    append            S4  (batch insert)
    overwrite         S9  (truncate + insert)
    delete_where      S7/S8 (row-level delete -> bucket-scoped rewrite)
    upsert            S3/S13 (MERGE INTO by key: matched update,
                      unmatched insert; bucket-scoped rewrite)
    read(version=)    time travel over snapshots
    history/rollback  snapshot maintenance (S10 analog)
    compact           rewrite live sets into one (rewrite_data_files)
    expire_snapshots  drop old manifests + reclaim data referenced only
                      by them (expire_snapshots; without it every COW
                      commit's superseded bucket copies live forever)
    remove_orphan_files  age-gated cleanup of never-committed data dirs
                      left by crashed writers (remove_orphan_files)
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from music_dedupe_spark import fsutil


class ConcurrentCommitError(RuntimeError):
    """A snapshot commit lost the rename race to a concurrent writer.

    The losing writer's pending data_sets were derived from the
    pre-race snapshot, so they cannot be re-published as-is without
    dropping the winner's changes; callers re-apply the whole operation
    (read the new current snapshot, recompute, commit) — Iceberg's
    optimistic-concurrency contract."""


class SnapshotTable:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        name: str,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.path = f"{root}/{name}"
        self.name = name
        self.n_buckets = n_buckets  # pinned by the first commit's manifest
        fsutil.mkdirs(spark, f"{self.path}/_versions")
        fsutil.mkdirs(spark, f"{self.path}/data")

    # ---- snapshot bookkeeping -------------------------------------------

    def _versions(self) -> list[int]:
        return sorted(
            int(f[1:9])
            for f in fsutil.list_names(self.spark, f"{self.path}/_versions")
            if f.startswith("v") and f.endswith(".json")
        )

    def current_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        try:
            text = fsutil.read_text(
                self.spark, f"{self.path}/_versions/v{version:08d}.json"
            )
        except Exception as e:
            # translate ONLY the JVM FileNotFoundException (the raw form
            # is unactionable) into a named absence; transient faults
            # (s3a 503s, permission errors) must propagate untouched —
            # rewriting them as "expired" would turn a retryable fault
            # into a false permanent diagnosis
            jexc = getattr(e, "java_exception", None)
            if jexc is not None and "FileNotFoundException" in jexc.getClass().getName():
                raise FileNotFoundError(
                    f"table {self.name}: no manifest for version {version} "
                    f"(never committed, or expired by expire_snapshots)"
                ) from e
            raise
        m = json.loads(text)
        # legacy (pre-bucketing) manifests: data_sets was a plain list
        # of data-set dir names with no bucket metadata. Normalize to
        # the entry shape; bucket=None marks "bucket unknown", which
        # reads always include and row-level commits treat as affected
        # (full-rewrite COW — the legacy semantics — after which the
        # table is upgraded to bucketed entries).
        sets = m.get("data_sets") or []
        if sets and isinstance(sets[0], str):
            m["data_sets"] = [{"path": p, "bucket": None} for p in sets]
        return m

    def _snapshot(self) -> tuple[int | None, dict | None]:
        """(version, manifest) of the current snapshot, read ONCE at the
        start of an operation. Every write operation threads this base
        through to ``_commit`` so the commit lands at exactly
        base_version + 1 — a commit that computed its changes against
        base N must not publish as N+2 just because someone else
        committed N+1 while it was writing data files (that would
        silently drop the other writer's rows; see _commit)."""
        v = self.current_version()
        return v, (self._manifest(v) if v is not None else None)

    def _commit(
        self,
        data_sets: list[dict],
        op: str,
        bucket_col: str | None,
        base_version: int | None,
        meta: dict | None = None,
    ) -> int:
        manifest = {
            "op": op,
            "data_sets": data_sets,
            "bucket_col": bucket_col,
            # n_buckets is only meaningful alongside a pinned bucket_col
            # (bucket_col None = legacy manifest; stamping a modulus
            # there would be misleading)
            "n_buckets": self.n_buckets if bucket_col else None,
            "ts": time.time(),
            "meta": meta or {},
        }
        tmp = f"{self.path}/_versions/.tmp-{uuid.uuid4().hex}.json"
        # atomic publish: FileSystem.rename is the commit point, and it
        # REFUSES an existing destination. The committed version is
        # base_version + 1 where base_version is the snapshot the
        # OPERATION read (not current_version() re-probed here!): if a
        # concurrent writer committed base+1 while this operation was
        # still writing data files, this rename hits an existing
        # destination and fails loudly — re-probing would instead land
        # the stale data_sets at base+2 and silently drop the other
        # writer's rows (a lost update). Like Iceberg's optimistic
        # concurrency, the losing COMMIT fails and the caller re-applies
        # its OPERATION against the new current snapshot.
        version = (base_version or 0) + 1
        manifest["version"] = version
        fsutil.write_text(self.spark, tmp, json.dumps(manifest))
        if fsutil.rename(
            self.spark, tmp, f"{self.path}/_versions/v{version:08d}.json"
        ):
            return version
        fsutil.delete(self.spark, tmp)
        raise ConcurrentCommitError(
            f"table {self.name}: version {version} was committed concurrently; "
            f"re-apply the operation against the current snapshot"
        )

    # ---- bucketing -------------------------------------------------------

    def _resolve_bucket_col(self, df: DataFrame, cur: dict | None) -> str:
        """Bucket column for a write: the manifest-pinned one when the
        snapshot ``cur`` (read once by the caller) has bucketing
        metadata, else the default for a new/legacy table."""
        if cur is not None and cur.get("bucket_col"):
            self.n_buckets = int(cur.get("n_buckets") or self.n_buckets)
            return cur["bucket_col"]
        return "repo" if "repo" in df.columns else df.columns[0]

    def _pinned(self, manifest: dict) -> str | None:
        """Re-pin bucketing params from a manifest before ANY bucket
        computation: a table created with a non-default n_buckets and
        reopened via Catalog.table() (default 16) would otherwise hash
        affected buckets with the wrong modulus — rows would silently
        survive deletes and upserts would duplicate keys. Returns None
        for a legacy (pre-bucketing) manifest — callers must fall back
        to full-rewrite semantics for that snapshot."""
        if not manifest.get("bucket_col"):
            return None
        self.n_buckets = int(manifest.get("n_buckets") or self.n_buckets)
        return manifest["bucket_col"]

    def _bucket_expr(self, bucket_col: str):
        return F.coalesce(
            F.pmod(F.xxhash64(F.col(bucket_col).cast("string")), F.lit(self.n_buckets)),
            F.lit(0),
        ).cast("int")

    def _write_data_sets(self, df: DataFrame, bucket_col: str) -> list[dict]:
        """Write ``df`` as ONE bucketed data-set directory; return one
        (path, bucket) entry per bucket actually present. ``_b`` is the
        partition dir only — it is not stored in (or read back from)
        the data files."""
        ds = uuid.uuid4().hex
        out = f"{self.path}/data/{ds}"
        df.withColumn("_b", self._bucket_expr(bucket_col)).write.partitionBy(
            "_b"
        ).mode("overwrite").parquet(out)
        entries = [
            {"path": f"{ds}/{child}", "bucket": int(child.split("=")[1])}
            for child in fsutil.list_names(self.spark, out)
            if child.startswith("_b=")
        ]
        if not entries:
            # an EMPTY DataFrame produces zero _b= partition dirs; a
            # snapshot with data_sets=[] would make the table unreadable
            # (read() has no schema source), so write one empty
            # schema-bearing parquet as a sentinel bucket — a
            # delete-everything or overwrite-with-empty commit leaves
            # the table readable as 0 rows with its schema intact
            df.limit(0).write.mode("overwrite").parquet(f"{out}/_b=0")
            entries = [{"path": f"{ds}/_b=0", "bucket": 0}]
        return entries

    # ---- reads ------------------------------------------------------------

    def _read_entries(self, entries: list[dict]) -> DataFrame:
        paths = [f"{self.path}/data/{e['path']}" for e in entries]
        return self.spark.read.parquet(*paths)

    def read(self, version: int | None = None, buckets: list[int] | None = None) -> DataFrame:
        """Snapshot read (time travel via ``version``). ``buckets``
        prunes the scan to the named buckets — the manifest-level
        partition pruning that point-lookups by bucket key use."""
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.name} has no snapshots")
        all_entries = self._manifest(v)["data_sets"]
        entries = all_entries
        if buckets is not None:
            # bucket=None (legacy entry): bucket unknown — always scan
            entries = [
                e for e in entries if e["bucket"] is None or e["bucket"] in set(buckets)
            ]
            if not entries and all_entries:
                # an ordinary point-lookup miss (no rows in the probed
                # buckets), not a broken table: empty result, full schema
                return self._read_entries(all_entries).where(F.lit(False))
        if not entries:
            raise FileNotFoundError(f"table {self.name} v{v} is empty")
        return self._read_entries(entries)

    def history(self) -> list[dict]:
        return [self._manifest(v) for v in self._versions()]

    # ---- writes -----------------------------------------------------------

    def overwrite(self, df: DataFrame) -> int:
        v, cur = self._snapshot()
        bc = self._resolve_bucket_col(df, cur)
        return self._commit(self._write_data_sets(df, bc), "overwrite", bc, v)

    def append(self, df: DataFrame) -> int:
        v, cur = self._snapshot()
        bc = self._resolve_bucket_col(df, cur)
        prev = cur["data_sets"] if cur else []
        return self._commit(prev + self._write_data_sets(df, bc), "append", bc, v)

    def _affected_rewrite(
        self,
        keep,
        new_rows: DataFrame | None,
        affected: set[int],
        op: str,
        cur: dict,
        bc: str,
        base_version: int,
    ) -> int:
        """THE bucket-scoped COW commit (shared by delete_where and
        upsert): buckets in ``affected`` are rewritten as
        ``keep(current rows of those buckets)`` ∪ ``new_rows``; every
        other bucket's entries are carried over BY REFERENCE (their
        parquet files are untouched — byte-identical across the
        commit). ``keep`` is a DataFrame→DataFrame callable so callers
        can express non-Column logic (upsert's anti-join). ``cur`` /
        ``bc`` / ``base_version`` are the snapshot the CALLER computed
        ``affected`` against — re-reading the manifest here would let a
        concurrent commit in between mix two snapshots in one
        operation (affected buckets from the old, entries from the
        new)."""
        # bucket=None (legacy entry, possibly mixed in by an append to a
        # pre-bucketing table): bucket membership unknown — always
        # rewrite, which also upgrades the entry to bucketed form
        keep_entries = [
            e
            for e in cur["data_sets"]
            if e["bucket"] is not None and e["bucket"] not in affected
        ]
        touched = [
            e for e in cur["data_sets"] if e["bucket"] is None or e["bucket"] in affected
        ]
        parts: list[DataFrame] = []
        if touched:
            parts.append(keep(self._read_entries(touched)))
        if new_rows is not None:
            parts.append(new_rows)
        new_entries: list[dict] = []
        if parts:
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            new_entries = self._write_data_sets(df, bc)
        return self._commit(keep_entries + new_entries, op, bc, base_version)

    def delete_where(self, condition) -> int:
        """S7/S8: row-level delete as PARTITION-SCOPED copy-on-write
        (what Iceberg COW does under MERGE ... WHEN MATCHED THEN
        DELETE, minus file-level granularity): one scan finds the
        buckets containing matches, only those buckets are rewritten
        with the anti filter, all other buckets carry over untouched."""
        v, cur = self._snapshot()
        if cur is None:
            raise FileNotFoundError(f"table {self.name} has no snapshots")
        bc = self._pinned(cur)
        if bc is None:
            # legacy snapshot (no bucket metadata): full-rewrite COW —
            # the pre-bucketing semantics — re-bucketing on this commit
            bc = self._resolve_bucket_col(self.read(version=v), cur)
            affected = {e["bucket"] for e in cur["data_sets"]}
        else:
            affected = {
                r["b"]
                for r in self.read(version=v)
                .filter(condition)
                .select(self._bucket_expr(bc).alias("b"))
                .distinct()
                .collect()
            }
        if not affected:
            # no row matched: produce NO new snapshot (Iceberg's empty-
            # delete behavior) — a re-running idempotent cleanup job must
            # not burn version numbers, advance expire_snapshots'
            # retention window, or make a genuinely concurrent writer
            # lose the optimistic-commit race over a no-op
            return v
        # SQL DELETE semantics: remove rows where the predicate is TRUE;
        # rows where it evaluates to NULL are KEPT (a bare ~condition
        # would drop them — and only in affected buckets, making delete
        # outcome depend on bucket co-location)
        keep_pred = ~F.coalesce(condition, F.lit(False))
        return self._affected_rewrite(
            lambda df: df.filter(keep_pred), None, affected, "delete_where", cur, bc, v
        )

    def upsert(self, updates: DataFrame, key_cols: list[str]) -> int:
        """S3/S13: MERGE INTO — matched rows replaced, unmatched inserted
        (INSERT OR REPLACE semantics, core.py:152-165), as a
        bucket-scoped anti-join + union. Affected buckets = buckets of
        the incoming rows ∪ buckets holding a matched key (the second
        set matters when ``bucket_col`` is not part of the key: a
        replaced row may live in a bucket no incoming row maps to)."""
        v, cur = self._snapshot()
        if cur is None:
            raise FileNotFoundError(f"table {self.name} has no snapshots")
        cur_df = self.read(version=v)
        bc = self._pinned(cur)
        updates = updates.select(*cur_df.columns)
        keys = updates.select(*key_cols)
        if bc is None:
            # legacy snapshot: full-rewrite COW, upgraded on this commit
            bc = self._resolve_bucket_col(cur_df, cur)
            affected = {e["bucket"] for e in cur["data_sets"]}
        else:
            # plain joins — AQE broadcasts the key set only when it is
            # actually small; a forced broadcast of a huge MERGE batch's
            # keys would OOM the driver at the table scale this targets
            affected = {
                r["b"]
                for r in updates.select(self._bucket_expr(bc).alias("b")).distinct().collect()
            } | {
                r["b"]
                for r in cur_df.join(keys, key_cols, "left_semi")
                .select(self._bucket_expr(bc).alias("b"))
                .distinct()
                .collect()
            }
        return self._affected_rewrite(
            lambda df: df.join(keys, key_cols, "left_anti"),
            updates,
            affected,
            "upsert",
            cur,
            bc,
            v,
        )

    def rollback(self, version: int) -> int:
        m = self._manifest(version)
        return self._commit(
            m["data_sets"], "rollback", self._pinned(m), self.current_version(),
            {"to": version},
        )

    def expire_snapshots(self, keep_latest: int = 1) -> list[str]:
        """Iceberg ``expire_snapshots`` analog: drop every manifest but
        the newest ``keep_latest`` and delete each data path referenced
        ONLY by the dropped ones — the retention that keeps a long-lived
        table's storage proportional to its LIVE snapshots (every COW
        commit supersedes one bucket copy per affected bucket; without
        expiry a 100 TB table's history grows without bound). Bucket
        dirs carried forward by reference into a kept manifest are
        never touched, so current reads and remaining time travel stay
        intact; expired versions stop being readable (Iceberg's
        contract). Only paths named by SOME manifest are ever deleted —
        a concurrent writer's not-yet-committed data/<uuid> dir is
        invisible here, so maintenance never races an in-flight commit
        (orphan cleanup of crashed writers' never-committed dirs is the
        separate age-gated ``remove_orphan_files``). Like
        rollback/compact, this is explicit
        single-process maintenance: run it where no expired-version
        reader is still live. Returns the deleted data paths."""
        vs = self._versions()
        keep_latest = max(1, keep_latest)
        if len(vs) <= keep_latest:
            return []
        kept, expired = vs[-keep_latest:], vs[:-keep_latest]
        live = {e["path"] for v in kept for e in self._manifest(v)["data_sets"]}
        removed: set[str] = set()
        for v in expired:
            for e in self._manifest(v)["data_sets"]:
                p = e["path"]
                if p not in live and p not in removed:
                    fsutil.delete(self.spark, f"{self.path}/data/{p}")
                    removed.add(p)
            fsutil.delete(self.spark, f"{self.path}/_versions/v{v:08d}.json")
        # a data-set dir whose bucket children are all reclaimed is dead
        # (kept references point at the _b= children, which survived)
        for ds in {p.split("/", 1)[0] for p in removed}:
            if not fsutil.list_names(self.spark, f"{self.path}/data/{ds}"):
                fsutil.delete(self.spark, f"{self.path}/data/{ds}")
        return sorted(removed)

    def remove_orphan_files(self, older_than_ms: int) -> list[str]:
        """Iceberg ``remove_orphan_files`` analog: delete data-set dirs
        under ``data/`` that are referenced by NO manifest (live or
        historical) — the leftovers of writers that crashed between
        writing their files and committing — but only those whose
        modification time is older than ``older_than_ms`` (epoch
        millis). The age threshold is the entire safety story, exactly
        as in Iceberg: an IN-FLIGHT writer's dir is also unreferenced
        until its commit lands, so callers must pass a horizon
        comfortably beyond any plausible write duration (hours, not
        seconds). Returns the deleted data-set dir names."""
        referenced = {
            e["path"].split("/", 1)[0]
            for v in self._versions()
            for e in self._manifest(v)["data_sets"]
        }
        removed = []
        for name, mtime in fsutil.list_status(self.spark, f"{self.path}/data"):
            if name not in referenced and mtime < older_than_ms:
                fsutil.delete(self.spark, f"{self.path}/data/{name}")
                removed.append(name)
        return sorted(removed)

    def compact(self) -> int:
        """S10 maintenance: rewrite all live data sets into one
        (rewrite_data_files analog); old sets stay for time travel.
        Compacting a legacy (pre-bucketing) snapshot upgrades it to
        bucketed entries."""
        v, cur = self._snapshot()
        df = self.read(version=v)
        bc = self._pinned(cur) or self._resolve_bucket_col(df, cur)
        return self._commit(self._write_data_sets(df, bc), "compact", bc, v)


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        fsutil.mkdirs(spark, root)

    def table(self, name: str) -> SnapshotTable:
        return SnapshotTable(self.spark, self.root, name)

    def tables(self) -> list[str]:
        return sorted(
            d
            for d in fsutil.list_names(self.spark, self.root)
            if fsutil.exists(self.spark, f"{self.root}/{d}/_versions")
        )
