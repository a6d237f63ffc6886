"""Plan-shape assertions: predicate pushdown, column pruning, broadcast
joins — the scale checklist from SURVEY §4 as tests."""

import pytest
from pyspark.sql import functions as F

from music_dedupe_spark.plans import (
    has_broadcast_join,
    pushed_filters,
    scan_read_schema,
)


def test_filter_pushdown_to_parquet(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_quantity")
    )
    pf = pushed_filters(df)
    assert any("l_quantity" in f for f in pf), pf


def test_column_pruning(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    cols = scan_read_schema(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}, cols


def test_ingest_scan_prunes_and_pushes(spark, files_df, corpus_dir):
    # the ingest lang predicate must reach the parquet scan
    from music_dedupe_spark.pipeline import eligible_files

    df = eligible_files(spark.read.parquet(f"{corpus_dir}/files.parquet")).select("path")
    pf = pushed_filters(df)
    assert any("lang" in f for f in pf), pf


def test_broadcast_join_small_dim(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    j = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    assert has_broadcast_join(j)


def test_group_pairs_small_side_broadcast(spark):
    # the run-group small-groups semi-join is explicitly broadcast
    from music_dedupe_spark.operators.rungroup import group_pairs, sorted_run_groups

    df = spark.createDataFrame(
        [("kkkkkkkk", f"id{i}") for i in range(6)], "norm_name string, file_id string"
    )
    pairs = group_pairs(sorted_run_groups(df, num_partitions=2))
    assert has_broadcast_join(pairs)


def test_scoring_cascade_joins_broadcast_when_features_small(spark, files_df):
    """The 3-join featureization must plan as broadcast hash joins (no
    sort-merge, no pair-side shuffle) when the feature table is small —
    the regime every sf-scale test and the scaling probe run in. At
    10^12 rows the features side exceeds any broadcast threshold and
    AQE plans shuffle joins instead; this pins the small-dim plan so a
    refactor can't silently put a sort or a pair-row exchange back."""
    from music_dedupe_spark.operators.scoring import score_candidates
    from music_dedupe_spark.pipeline import ingest

    feats = ingest(files_df)
    ids = feats.select("file_id")
    pairs = (
        ids.withColumnRenamed("file_id", "left_id")
        .crossJoin(ids.withColumnRenamed("file_id", "right_id").limit(5))
        .filter(F.col("left_id") < F.col("right_id"))
    )
    plan = (
        score_candidates(pairs, feats)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == 3, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_repo_partitioned_scan_prunes_partitions(spark, files_df, tmp_path):
    """P2 path-prefix scoping (ref scans under a path prefix,
    core.py:585-590) as PHYSICAL partition pruning: a repo-partitioned
    layout + a repo predicate must prune at planning time
    (PartitionFilters), and only the matching repo's files are read."""
    from music_dedupe_spark.plans import partition_filters

    d = str(tmp_path / "by_repo")
    files_df.write.partitionBy("repo").mode("overwrite").parquet(d)
    one_repo = files_df.select("repo").first()["repo"]

    scoped = spark.read.parquet(d).filter(F.col("repo") == one_repo).select("path")
    pf = partition_filters(scoped)
    assert any("repo" in f for f in pf), f"no partition filter in plan: {pf}"
    # the row-level PushedFilters must NOT need the repo predicate — it
    # is resolved by directory pruning
    want = files_df.filter(F.col("repo") == one_repo).count()
    assert scoped.count() == want
