"""Incremental ER: adding a delta to an already-resolved corpus must
produce the same entities as re-running the full pipeline — including
merges where a new file bridges two previously-separate entities."""

import pytest
from pyspark.sql import functions as F

from music_dedupe_spark.fixtures import generate_corpus, write_corpus
from music_dedupe_spark.operators.incremental_er import incremental_link
from music_dedupe_spark.pipeline import PipelineConfig, pairwise_f1, run_pipeline


@pytest.fixture(scope="module")
def corpus_dirs(tmp_path_factory):
    d = tmp_path_factory.mktemp("incr")
    write_corpus(generate_corpus(seed=17, n_base=400, n_clusters=60), str(d))
    return str(d)


def _labels(clusters):
    return {r["member_id"]: r["entity_id"] for r in clusters.collect()}


def test_incremental_matches_full_rerun(spark, corpus_dirs):
    files = spark.read.parquet(f"{corpus_dirs}/files.parquet")
    # split deterministically: ~half the files arrive later
    is_new = F.crc32("path") % 2 == 1
    old_files = files.filter(~is_new)
    new_files = files.filter(is_new)

    base = run_pipeline(old_files, PipelineConfig())
    inc = incremental_link(new_files, base["features"], base["clusters"])
    full = run_pipeline(files, PipelineConfig())

    got = _labels(inc["clusters"])
    want = _labels(full["clusters"])
    assert set(got) == set(want), "member sets differ"
    # compare PARTITIONS, not raw labels: the incremental entity_id is a
    # component min over (assignment ∪ delta) node ids, which can be an
    # entity id rather than the global min member id — group members by
    # label on each side and compare the groupings
    def groups(lbl):
        g = {}
        for m, e in lbl.items():
            g.setdefault(e, set()).add(m)
        # a SET of frozensets: sorted() would use frozenset's subset
        # partial order and compare arbitrary elements
        return {frozenset(v) for v in g.values()}

    assert groups(got) == groups(want)

    # and the incremental run still nails the labeled-pair truth
    lp = spark.read.parquet(f"{corpus_dirs}/labeled_pairs.parquet")
    m = pairwise_f1(inc["clusters"], lp)
    assert m["f1"] >= 0.99, m


def test_incremental_candidates_touch_new_only(spark, corpus_dirs):
    files = spark.read.parquet(f"{corpus_dirs}/files.parquet")
    is_new = F.crc32("path") % 2 == 1
    base = run_pipeline(files.filter(~is_new), PipelineConfig())
    inc = incremental_link(files.filter(is_new), base["features"], base["clusters"])

    new_ids = {
        r["file_id"] for r in inc["features"].select("file_id").collect()
    }
    pairs = inc["candidate_pairs"].select("left_id", "right_id").collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r["left_id"] in new_ids or r["right_id"] in new_ids, (
            "old×old pair regenerated — the delta property is broken"
        )
