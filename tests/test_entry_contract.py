"""Replicates the driver's correctness gate: run every queries() entry
at sf0.01 and compare row count + (sorted-by-name) values against the
DuckDB oracle. Non-SQL entries get the rows-only check."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 4)
                if v == -0.0:
                    v = 0.0
                if math.isnan(v):
                    v = "NaN"
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


ALL = sorted(entry_mod.queries())
SQL = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", [n for n in ALL if n in SQL])
def test_query_matches_duckdb_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(SQL[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    assert _normalize(srows, scols) == _normalize(drows, dcols), f"{name}: values differ"


@pytest.mark.parametrize("name", [n for n in ALL if n not in SQL and n != "er_pipeline_clusters"])
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    assert df.count() >= 0
    assert len(df.columns) > 0


#: The INTENDED rows-only inventory. Everything else must carry a DuckDB
#: oracle: if an entry silently loses its oracle the driver would demote
#: it to a rows-only check without anyone noticing — this test makes that
#: a failure instead. Additions to this set need a by-design reason
#: (sketch/seeded/iterative-fuzzy, documented in __spark_entry__.oracle_sql).
EXPECTED_NO_ORACLE = {
    "approx_distinct_parts",   # HLL sketch — approximate by definition
    "dedup_minhash_lsh",       # seeded MinHash permutations, not SQL-replayable
    "ann_lsh_topk",            # seeded SRP hyperplanes (self-asserts recall)
    "ann_ivf_topk",            # seeded k-means centroids (self-asserts recall)
    "er_pipeline_clusters",    # full fuzzy pipeline (MinHash + DP scorer);
                               # its deterministic core is value-checked by
                               # er_deterministic_clusters
    "er_incremental_clusters", # same fuzzy machinery, delta mode; the fold
                               # is value-checked by er_incremental_deterministic
}


def test_no_oracle_set_is_pinned():
    assert set(ALL) - set(SQL) == EXPECTED_NO_ORACLE


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert "entity_id" in df.columns


def test_approx_distinct_accuracy(spark):
    rows = entry_mod.queries()["approx_distinct_parts"](spark, SF).collect()
    for r in rows:
        assert abs(r["approx_parts"] - r["exact_parts"]) / r["exact_parts"] < 0.05


def test_assert_rows_local_raises_and_rebuilds(spark):
    """The self-asserting rows-only helper must raise on a failed check
    and otherwise hand back a LOCAL DataFrame with identical rows/schema
    (so the driver's collect doesn't re-run the plan)."""
    import pytest

    from music_dedupe_spark.queries import _assert_rows_local

    df = spark.createDataFrame([(1, "a")], "x int, s string")
    with pytest.raises(RuntimeError, match="ctx: bad"):
        _assert_rows_local(df, lambda rows: "bad", "ctx")
    out = _assert_rows_local(df, lambda rows: None, "ctx")
    assert out.schema == df.schema
    assert [tuple(r) for r in out.collect()] == [(1, "a")]
