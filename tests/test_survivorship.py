"""Maintenance-task plans (EP3): clean_short (P11), clean_junk (J4
anti-join), rename collisions (W3), delete application (S8)."""

import pytest
from pyspark.sql import functions as F

from music_dedupe_spark.operators import survivorship
from music_dedupe_spark.pipeline import ingest
from music_dedupe_spark.functions.text import with_derived_columns


@pytest.fixture(scope="module")
def derived(spark, files_df):
    d = with_derived_columns(files_df)
    d.cache()
    d.count()
    return d


def test_clean_short_plan(derived):
    plan = survivorship.clean_short_plan(derived, min_size_chars=60)
    rows = plan.collect()
    assert len(rows) > 0
    sizes = {
        r["file_id"]: r["size_chars"]
        for r in derived.select("file_id", "size_chars").collect()
    }
    for r in rows:
        assert 0 < sizes[r["file_id"]] < 60


def test_clean_junk_plan(spark):
    # dir A: junk next to source -> kept; dir B: junk alone -> deleted
    rows = [
        ("r1", "a/keep.py", "c1", "py", "print(1)"),
        ("r1", "a/.DS_Store", "c2", "txt", "x"),
        ("r1", "b/.DS_Store", "c3", "txt", "x"),
        ("r1", "b/notes.log", "c4", "txt", "x"),
    ]
    df = with_derived_columns(
        spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    )
    plan = survivorship.clean_junk_plan(df)
    got = {r["path"] for r in plan.collect()}
    assert got == {"b/.DS_Store", "b/notes.log"}


def test_rename_plan_collisions(spark):
    rows = [
        ("r1", "d/x - Alpha.py", "c1", "py", "1"),
        ("r1", "d/y - Alpha.py", "c2", "py", "2"),
        ("r1", "d/z - Alpha.py", "c3", "py", "3"),
        ("r1", "e/solo - Beta.js", "c4", "js", "4"),
    ]
    df = with_derived_columns(
        spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    )
    plan = survivorship.rename_plan(df, "{title}.{ext}")
    got = sorted(r["new_path"] for r in plan.collect())
    assert got == ["d/Alpha (1).py", "d/Alpha (2).py", "d/Alpha.py", "e/Beta.js"]


def test_rename_plan_multi_field_template(spark):
    """F8 general template: any {field} naming a column substitutes it
    (ref pattern.format(**meta), core.py:1073) — 3-field pattern with
    collisions + illegal-char stripping."""
    rows = [
        ("r1", "d/x - Alpha.py", "c1", "py", "1"),
        ("r1", "d/y - Alpha.py", "c2", "py", "2"),
        ("r1", "e/solo - B:e*ta?.js", "c3", "js", "3"),
    ]
    df = with_derived_columns(
        spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    )
    plan = survivorship.rename_plan(df, "{repo} - {title} [{lang}].{ext}")
    got = sorted(r["new_path"] for r in plan.collect())
    # illegal chars <>:"/\|?* are stripped from the formatted name
    assert got == [
        "d/r1 - Alpha [py] (1).py",
        "d/r1 - Alpha [py].py",
        "e/r1 - Beta [js].js",
    ]


def test_rename_plan_unknown_field_raises(spark, files_df):
    df = with_derived_columns(files_df)
    with pytest.raises(ValueError, match="missing key"):
        survivorship.rename_plan(df, "{artist} - {title}.{ext}")


def test_apply_delete_anti_join(derived):
    plan = survivorship.clean_short_plan(derived)
    remaining = survivorship.apply_delete(derived, plan)
    assert remaining.count() == derived.count() - plan.count()
    assert remaining.join(plan.select("file_id"), "file_id", "left_semi").count() == 0
