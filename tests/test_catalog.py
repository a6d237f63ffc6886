"""Snapshot-table catalog: atomic commits, time travel, MERGE semantics
(SURVEY §2.1 S3/S4/S7-S10)."""

import pytest
from pyspark.sql import functions as F

from music_dedupe_spark.sources.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_append_and_time_travel(spark, cat):
    t = cat.table("t1")
    v1 = t.overwrite(_df(spark, [(1, "a")]))
    v2 = t.append(_df(spark, [(2, "b")]))
    assert t.read().count() == 2
    assert t.read(version=v1).count() == 1
    assert [m["op"] for m in t.history()] == ["overwrite", "append"]
    assert v2 == 2


def test_delete_where(spark, cat):
    t = cat.table("t2")
    t.overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.delete_where(F.col("k") == 2)
    assert sorted(r["k"] for r in t.read().collect()) == [1, 3]
    # prior snapshot unaffected (snapshot isolation)
    assert t.read(version=1).count() == 3


def test_upsert_merge_semantics(spark, cat):
    # INSERT OR REPLACE (core.py:152-165): matched rows replaced,
    # new rows inserted
    t = cat.table("t3")
    t.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    t.upsert(_df(spark, [(2, "B"), (3, "c")]), ["k"])
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_rollback_and_compact(spark, cat):
    t = cat.table("t4")
    t.overwrite(_df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    t.rollback(1)
    assert t.read().count() == 1
    t.append(_df(spark, [(3, "c")]))
    t.compact()
    assert sorted(r["k"] for r in t.read().collect()) == [1, 3]
    # all live rows rewritten into ONE data-set directory (one entry per
    # bucket, all sharing the same data-set uuid)
    assert len({e["path"].split("/")[0] for e in t.history()[-1]["data_sets"]}) == 1


def test_delete_rewrites_only_affected_buckets(spark, tmp_path):
    """Partition-scoped COW: a row-level delete rewrites ONLY the
    buckets containing matches; every other bucket's entries are carried
    over by reference and their parquet files stay byte-identical
    (Iceberg-COW semantics — a 100-row delete against a 100 TB table
    must not rewrite 100 TB)."""
    import glob

    from music_dedupe_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.table("t_cow")
    t.overwrite(_df(spark, [(i, chr(96 + i)) for i in range(1, 21)]))
    m1 = t.history()[-1]
    data_glob = str(tmp_path / "wh" / "t_cow" / "data" / "**" / "*.parquet")
    before = {p: open(p, "rb").read() for p in glob.glob(data_glob, recursive=True)}

    t.delete_where(F.col("k") == 2)
    m2 = t.history()[-1]
    e1 = {(e["path"], e["bucket"]) for e in m1["data_sets"]}
    e2 = {(e["path"], e["bucket"]) for e in m2["data_sets"]}
    carried, new = e1 & e2, e2 - e1
    assert carried, "untouched buckets must carry over by reference"
    assert len({b for _, b in new}) == 1, f"only k=2's bucket rewritten, got {new}"
    dropped_buckets = {b for _, b in e1 - e2}
    assert dropped_buckets == {b for _, b in new}
    for p, blob in before.items():
        assert open(p, "rb").read() == blob, f"existing data file rewritten: {p}"
    assert sorted(r["k"] for r in t.read().collect()) == [1] + list(range(3, 21))
    # prior snapshot still reads all 20 (time travel over the carried files)
    assert t.read(version=1).count() == 20


def test_upsert_replaces_matched_key_in_other_bucket(spark, cat):
    """When bucket_col (repo) is NOT part of the merge key, a replaced
    row may live in a bucket no incoming row maps to — the matched-key
    scan must pull that bucket into the rewrite set, else the old row
    survives as a duplicate key."""
    rows = [("repoA", 7, "old"), ("repoA", 8, "keep"), ("repoB", 9, "keep")]
    t = cat.table("t_xbucket")
    t.overwrite(spark.createDataFrame(rows, "repo string, id int, val string"))
    t.upsert(
        spark.createDataFrame([("repoB", 7, "new")], "repo string, id int, val string"),
        ["id"],
    )
    got = {(r["repo"], r["id"], r["val"]) for r in t.read().collect()}
    assert got == {("repoB", 7, "new"), ("repoA", 8, "keep"), ("repoB", 9, "keep")}


def test_catalog_file_uri_root(spark, tmp_path):
    """Manifest I/O through an explicit file:// URI — the catalog's
    bookkeeping must go through the Hadoop FileSystem of the root's
    scheme (hdfs/s3a-safe), not driver-local os.path."""
    from music_dedupe_spark.sources.catalog import Catalog

    cat = Catalog(spark, f"file://{tmp_path}/wh")
    t = cat.table("t_uri")
    t.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    t.delete_where(F.col("k") == 1)
    assert [r["k"] for r in t.read().collect()] == [2]
    assert cat.tables() == ["t_uri"]


def test_catalog_listing(spark, cat):
    cat.table("alpha").overwrite(_df(spark, [(1, "a")]))
    cat.table("beta").overwrite(_df(spark, [(2, "b")]))
    assert cat.tables() == ["alpha", "beta"]


def test_reopened_table_repins_n_buckets(spark, tmp_path):
    """A table created with non-default n_buckets and reopened through
    Catalog.table() (default 16) must re-pin the bucket modulus from the
    manifest before computing affected buckets — with the wrong modulus
    a delete's affected-bucket ids match no manifest entry and the row
    silently survives."""
    from music_dedupe_spark.sources.catalog import Catalog, SnapshotTable

    root = str(tmp_path / "wh")
    t = SnapshotTable(spark, root, "tn", n_buckets=4)
    t.overwrite(_df(spark, [(i, str(i)) for i in range(1, 13)]))
    assert t.history()[-1]["n_buckets"] == 4
    # reopen with the default ctor params
    t2 = Catalog(spark, root).table("tn")
    t2.delete_where(F.col("k") == 7)
    assert sorted(r["k"] for r in t2.read().collect()) == [i for i in range(1, 13) if i != 7]
    assert t2.history()[-1]["n_buckets"] == 4  # pin survives the commit


def test_delete_where_keeps_null_predicate_rows(spark, cat):
    """SQL DELETE semantics: rows where the predicate evaluates to NULL
    are kept — and identically so whether or not they share a bucket
    with a matched row."""
    rows = [(1, "x"), (2, None), (3, "y"), (4, None)]
    t = cat.table("t_null")
    t.overwrite(spark.createDataFrame(rows, "k int, v string"))
    t.delete_where(F.col("v") == "x")
    got = sorted(r["k"] for r in t.read().collect())
    assert got == [2, 3, 4], got


def test_legacy_manifest_read_and_upgrade(spark, tmp_path):
    """A table written by the pre-bucketing catalog (manifest data_sets
    was a plain list of dir names, no bucket_col) must stay readable,
    never be bucket-pruned away, and be UPGRADED to bucketed entries by
    its first row-level commit (full-rewrite COW — the legacy
    semantics — exactly once)."""
    import json

    from music_dedupe_spark import fsutil
    from music_dedupe_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.table("t_legacy")
    # hand-build the legacy layout: one flat data-set dir + a v1
    # manifest in the old list[str] format with no bucket metadata
    _df(spark, [(1, "a"), (2, "b"), (3, "c")]).write.parquet(
        f"{t.path}/data/legacy0"
    )
    fsutil.write_text(
        spark,
        f"{t.path}/_versions/v00000001.json",
        json.dumps(
            {"op": "overwrite", "data_sets": ["legacy0"], "version": 1, "ts": 0, "meta": {}}
        ),
    )
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2, 3]
    # bucket pruning must still scan bucket-unknown legacy entries
    assert t.read(buckets=[0]).count() == 3
    t.delete_where(F.col("k") == 2)
    assert sorted(r["k"] for r in t.read().collect()) == [1, 3]
    m2 = t.history()[-1]
    assert m2["bucket_col"], "first row-level commit must pin a bucket col"
    assert all(e["bucket"] is not None for e in m2["data_sets"]), (
        "legacy entries must be upgraded to bucketed form by the rewrite"
    )
    # time travel over the legacy snapshot still works
    assert t.read(version=1).count() == 3
    # and the NEXT commit is bucket-scoped: some entries carry over
    t.delete_where(F.col("k") == 1)
    e2 = {(e["path"], e["bucket"]) for e in m2["data_sets"]}
    e3 = {(e["path"], e["bucket"]) for e in t.history()[-1]["data_sets"]}
    assert e2 & e3, "post-upgrade commits must carry untouched buckets by reference"


def test_concurrent_commit_raises_and_keeps_winner(spark, cat, monkeypatch):
    """Two writers racing to the same version number: the rename loser
    must NOT retry at the next number (its data sets were derived from
    the pre-race snapshot — a silent lost update); it raises
    ConcurrentCommitError, cleans its temp manifest, and leaves the
    winner's snapshot as the table's state."""
    from music_dedupe_spark import fsutil
    from music_dedupe_spark.sources.catalog import ConcurrentCommitError

    t = cat.table("t_race")
    t.overwrite(_df(spark, [(1, "a")]))
    winner = fsutil.read_text(spark, f"{t.path}/_versions/v00000001.json")
    real_rename = fsutil.rename

    def racing_rename(s, src, dst):
        if dst.endswith(".json") and not fsutil.exists(s, dst):
            # a concurrent writer claims this version number first
            fsutil.write_text(s, dst, winner)
        return real_rename(s, src, dst)

    monkeypatch.setattr(fsutil, "rename", racing_rename)
    with pytest.raises(ConcurrentCommitError):
        t.append(_df(spark, [(2, "b")]))
    monkeypatch.undo()
    # the winner's snapshot (a copy of v1) is the current state; the
    # loser's append is NOT visible and its temp manifest is cleaned
    assert t.read().count() == 1
    names = fsutil.list_names(spark, f"{t.path}/_versions")
    assert not [n for n in names if n.startswith(".tmp-")], names


def test_read_bucket_prune_miss_returns_empty(spark, cat):
    t = cat.table("t_prune")
    t.overwrite(_df(spark, [(1, "a")]))
    present = {e["bucket"] for e in t.history()[-1]["data_sets"]}
    missing = next(b for b in range(16) if b not in present)
    out = t.read(buckets=[missing])
    assert out.count() == 0
    assert out.columns == ["k", "v"]


def test_commit_during_data_write_raises(spark, cat, monkeypatch):
    """The lost-update window OUTSIDE the same-version rename race: a
    writer reads snapshot N, spends time writing data files, and a
    concurrent writer commits N+1 in that window. The first writer's
    commit must land at N+1 (refused -> ConcurrentCommitError), NOT at
    N+2 with its stale data_sets — that would silently drop the
    concurrent writer's rows."""
    from music_dedupe_spark.sources.catalog import (
        ConcurrentCommitError,
        SnapshotTable,
    )

    t = cat.table("t_window")
    t.overwrite(_df(spark, [(1, "a")]))
    other = SnapshotTable(spark, cat.root, "t_window")
    real_write = t._write_data_sets

    def slow_write(df, bucket_col):
        # a concurrent writer fully commits while we're "writing"
        other.append(_df(spark, [(99, "other")]))
        return real_write(df, bucket_col)

    monkeypatch.setattr(t, "_write_data_sets", slow_write)
    with pytest.raises(ConcurrentCommitError):
        t.append(_df(spark, [(2, "b")]))
    monkeypatch.undo()
    # the concurrent writer's row survived; the loser's row is absent
    vals = {r["k"] for r in t.read().collect()}
    assert vals == {1, 99}


def test_delete_all_keeps_table_readable(spark, cat):
    """A delete matching every row (or an overwrite with an empty
    frame) must leave the table readable as 0 rows with its schema —
    not commit data_sets=[] and break every subsequent read/upsert."""
    t = cat.table("t_empty")
    t.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    t.delete_where(F.lit(True))
    assert t.read().count() == 0
    assert t.read().columns == ["k", "v"]
    # the table stays fully operational
    t.append(_df(spark, [(3, "c")]))
    t.upsert(_df(spark, [(3, "d"), (4, "e")]), ["k"])
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    assert got == {(3, "d"), (4, "e")}
    # overwrite-with-empty behaves the same way
    t.overwrite(spark.createDataFrame([], "k int, v string"))
    assert t.read().count() == 0
    assert t.read().columns == ["k", "v"]


def test_expire_snapshots_reclaims_only_dead_buckets(spark, tmp_path):
    """expire_snapshots must drop expired manifests and delete exactly
    the bucket dirs referenced ONLY by them: buckets carried forward by
    reference into a kept snapshot survive byte-identical (current
    reads and remaining time travel intact), superseded copies are
    reclaimed, and a rollback commit keeps its referenced data alive
    through an expiry."""
    import glob

    from music_dedupe_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.table("t_exp")
    t.overwrite(_df(spark, [(i, chr(96 + i)) for i in range(1, 21)]))
    t.delete_where(F.col("k") == 2)   # v2: rewrites one bucket
    t.delete_where(F.col("k") == 7)   # v3: rewrites another
    live_entries = {e["path"] for e in t.history()[-1]["data_sets"]}
    all_paths = {
        e["path"] for m in t.history() for e in m["data_sets"]
    }
    dead = all_paths - live_entries
    assert dead, "superseded bucket copies must exist before expiry"
    rows_before = sorted(r["k"] for r in t.read().collect())
    data_glob = str(tmp_path / "wh" / "t_exp" / "data" / "**" / "*.parquet")
    live_files = {
        p: open(p, "rb").read()
        for p in glob.glob(data_glob, recursive=True)
        if any(f"/{lp}/" in p for lp in live_entries)
    }

    removed = t.expire_snapshots(keep_latest=1)

    assert set(removed) == dead
    assert [m["version"] for m in t.history()] == [3]
    root = str(tmp_path / "wh" / "t_exp" / "data")
    for p in dead:
        import os
        assert not os.path.exists(f"{root}/{p}"), f"dead bucket survived: {p}"
    for p, blob in live_files.items():
        assert open(p, "rb").read() == blob, f"live data file touched: {p}"
    assert sorted(r["k"] for r in t.read().collect()) == rows_before
    # expired versions are gone (Iceberg contract)
    with pytest.raises(Exception):
        t.read(version=1)
    # keep_latest >= snapshot count is a no-op
    assert t.expire_snapshots(keep_latest=5) == []
    # rollback pins old data alive through a subsequent expiry
    t.append(_df(spark, [(99, "z")]))            # v4
    v4_entries = {e["path"] for e in t.history()[-1]["data_sets"]}
    t.rollback(3)                                # v5 references v3's sets
    t.expire_snapshots(keep_latest=1)
    assert sorted(r["k"] for r in t.read().collect()) == rows_before
    # v4's new data set (99,"z") is referenced by no kept manifest - gone
    gone = v4_entries - {e["path"] for e in t.history()[-1]["data_sets"]}
    import os
    for p in gone:
        assert not os.path.exists(f"{root}/{p}")


def test_remove_orphan_files_age_gated(spark, tmp_path):
    """remove_orphan_files must delete only data dirs that (a) no
    manifest references AND (b) are older than the horizon — a young
    orphan (an in-flight writer's uncommitted dir) and every referenced
    dir survive; expired-version reads raise a named error."""
    import time as _time

    from music_dedupe_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.table("t_orph")
    t.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    # a crashed writer: data written, never committed
    _df(spark, [(9, "x")]).write.parquet(str(tmp_path / "wh" / "t_orph" / "data" / "deadbeef"))
    live = {e["path"].split("/", 1)[0] for e in t.history()[-1]["data_sets"]}

    # horizon in the past: nothing is old enough — no-op
    assert t.remove_orphan_files(older_than_ms=0) == []
    # horizon in the future: the orphan goes, referenced dirs stay
    removed = t.remove_orphan_files(older_than_ms=int(_time.time() * 1000) + 60_000)
    assert removed == ["deadbeef"]
    import os
    assert not os.path.exists(str(tmp_path / "wh" / "t_orph" / "data" / "deadbeef"))
    for ds in live:
        assert os.path.exists(str(tmp_path / "wh" / "t_orph" / "data" / ds))
    assert t.read().count() == 2

    # expired-version reads raise a named FileNotFoundError
    t.append(_df(spark, [(3, "c")]))
    t.expire_snapshots(keep_latest=1)
    with pytest.raises(FileNotFoundError, match="expired"):
        t.read(version=1)
