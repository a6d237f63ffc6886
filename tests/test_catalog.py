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
    assert len(t.history()[-1]["data_sets"]) == 1


def test_catalog_listing(spark, cat):
    cat.table("alpha").overwrite(_df(spark, [(1, "a")]))
    cat.table("beta").overwrite(_df(spark, [(2, "b")]))
    assert cat.tables() == ["alpha", "beta"]
