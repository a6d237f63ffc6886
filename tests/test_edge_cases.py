"""Robustness probes: empty corpus, single row, unicode paths, empty
content — the full pipeline must degrade to empty/singleton outputs
without throwing (empty partitions in the rungroup scan, empty edge
sets in the CC loop, survivorship over pure singletons)."""

from pyspark.sql import functions as F

from music_dedupe_spark.pipeline import PipelineConfig, run_pipeline

SCHEMA = "repo string, path string, commit string, lang string, content string"


def test_pipeline_empty_corpus(spark):
    files = spark.createDataFrame([], SCHEMA)
    out = run_pipeline(files, PipelineConfig())
    assert out["features"].count() == 0
    assert out["candidate_pairs"].count() == 0
    assert out["clusters"].count() == 0
    assert out["ranked"].count() == 0


def test_pipeline_single_row(spark):
    files = spark.createDataFrame(
        [("r", "src/only one.py", "c0", "py", "print('x')")], SCHEMA
    )
    out = run_pipeline(files, PipelineConfig())
    assert out["features"].count() == 1
    assert out["candidate_pairs"].count() == 0
    rows = out["clusters"].collect()
    assert len(rows) == 1 and rows[0]["member_id"] == rows[0]["entity_id"]
    ranked = out["ranked"].collect()
    assert len(ranked) == 1 and ranked[0]["is_keeper"]


def test_pipeline_unicode_paths_and_empty_content(spark):
    """Unicode titles flow through normalization/blocking/scoring
    unmangled (the DP kernel pads via utf-32 codepoints); empty contents
    form one exact-content cluster; the sha invariant holds."""
    rows = [
        ("r", "music/漢字 - ライブ.py", "c0", "py", "content ひとつ"),
        ("r", "live/漢字 - ライブ.py", "c1", "py", "content ひとつ"),
        ("r", "a/empty one.py", "c2", "py", ""),
        ("r", "b/empty one.py", "c3", "py", ""),
        ("r", "c/empty two.py", "c4", "py", ""),
    ]
    files = spark.createDataFrame(rows, SCHEMA)
    out = run_pipeline(files, PipelineConfig())
    feats = {r["path"]: r for r in out["features"].collect()}
    # title inference splits on ' - ' and the blocking key keeps unicode
    assert feats["music/漢字 - ライブ.py"]["norm_name"] == "ライブ"
    clusters = {}
    for r in out["clusters"].collect():
        clusters.setdefault(r["entity_id"], set()).add(r["member_id"])
    partitions = {frozenset(v) for v in clusters.values()}
    ids = {r["path"]: r["file_id"] for r in out["features"].collect()}
    # identical unicode title + identical content -> one entity
    assert {ids["music/漢字 - ライブ.py"], ids["live/漢字 - ライブ.py"]} in partitions
    # the three empty files share content (same sha) -> one entity
    assert {ids["a/empty one.py"], ids["b/empty one.py"], ids["c/empty two.py"]} in partitions

    from music_dedupe_spark.pipeline import sha_invariant_ok

    assert sha_invariant_ok(files, out["features"])
