"""ANN: brute-force baseline vs LSH and IVF recall (the approximate
variants must recover most of the true top-k)."""

import pytest
from pyspark.sql import functions as F

from music_dedupe_spark.operators.similarity_search import (
    TOP_K,
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embeddings(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    e.cache()
    e.count()
    return e


@pytest.fixture(scope="module")
def queries(embeddings):
    return embeddings.filter(F.col("vec_id") < 10)


@pytest.fixture(scope="module")
def truth(embeddings, queries):
    return {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(embeddings, queries).collect()
    }


def test_brute_force_shape(embeddings, queries, truth):
    assert len(truth) == 10 * TOP_K


def _recall(approx_rows, truth):
    got = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    return len(got & truth) / len(truth)


def test_lsh_recall(embeddings, queries, truth):
    rows = lsh_topk(embeddings, queries).collect()
    assert _recall(rows, truth) >= 0.6, "SRP-LSH recall too low"


def test_ivf_recall(embeddings, queries, truth):
    rows = ivf_topk(embeddings, queries, n_cells=16, nprobe=6).collect()
    assert _recall(rows, truth) >= 0.6, "IVF recall too low"


def test_ivf_recall_on_sorted_corpus(embeddings, queries, truth):
    """Adversarial layout: range-partition + sort the corpus by its
    first embedding component, so the head partitions hold one region of
    the space. A head-of-partition (limit) training sample would fit
    centroids to that region only; the uniform rand-ordered sample must
    keep recall up regardless of physical order."""
    sorted_emb = embeddings.repartitionByRange(
        8, F.element_at("embedding", 1)
    ).sortWithinPartitions(F.element_at("embedding", 1))
    rows = ivf_topk(sorted_emb, queries, n_cells=16, nprobe=6).collect()
    assert _recall(rows, truth) >= 0.6, "IVF recall collapsed on sorted corpus"


def test_ann_entries_fail_loudly_on_recall_regression(spark, monkeypatch):
    """The driver's check for the seeded ANN entries is rows-only, so
    the queries self-assert recall vs the brute-force top-k. Inject a
    regression into each approximate index (a bucketer that never
    collides; an IVF assignment that lands every vector in a cell no
    probe targets) and the registered entries must RAISE instead of
    returning plausible-but-empty rows."""
    import pandas as pd

    import music_dedupe_spark.operators.similarity_search as ss

    def broken_bucketer(*a, **k):
        def compute(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {"vec_id": pdf["vec_id"], "buckets": [[] for _ in range(len(pdf))]}
                )

        return compute

    monkeypatch.setattr(ss, "srp_bucket_udf", broken_bucketer)
    with pytest.raises(RuntimeError, match="recall"):
        ss.ann_lsh_topk(spark, SF)
    monkeypatch.undo()

    real_index = ss.ivf_index

    def broken_index(embeddings, n_cells=16, **kw):
        centroids, assigned = real_index(embeddings, n_cells=n_cells, **kw)
        return centroids, assigned.withColumn("cell", F.lit(-1))

    monkeypatch.setattr(ss, "ivf_index", broken_index)
    with pytest.raises(RuntimeError, match="recall"):
        ss.ann_ivf_topk(spark, SF)


def test_ivf_scan_fraction(embeddings, queries):
    # the point of IVF: candidates per query ≪ corpus
    from music_dedupe_spark.operators.similarity_search import ivf_index

    _, assigned = ivf_index(embeddings, n_cells=16)
    sizes = assigned.groupBy("cell").count().collect()
    total = sum(r["count"] for r in sizes)
    assert total == embeddings.count()
    # nprobe=4 of 16 cells ~ 25% of the corpus scanned per query on
    # average (cells are uneven; allow slack)
    biggest4 = sum(sorted((r["count"] for r in sizes), reverse=True)[:4])
    assert biggest4 < total * 0.8
