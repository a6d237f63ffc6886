"""Skew behavior: hot blocks must stay bounded (north rule block-size
capping) and the pipeline must stay correct under them."""

import pytest
from pyspark.sql import functions as F

from music_dedupe_spark.fixtures import generate_corpus
from music_dedupe_spark.pipeline import PipelineConfig, pairwise_f1, run_pipeline


@pytest.fixture(scope="module")
def skew_corpus():
    # a few hot same-stem blocks of 300 members (hard negatives) on top
    # of a normal corpus — the miniature of LICENSE/__init__.py at 10^12
    return generate_corpus(
        seed=11,
        n_base=800,
        n_clusters=80,
        n_hard_negative_blocks=3,
        hard_negative_block_size=300,
        n_short=20,
        n_junk=10,
    )


@pytest.fixture(scope="module")
def skew_result(spark, skew_corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("skew")
    from music_dedupe_spark.fixtures import write_corpus

    write_corpus(skew_corpus, str(d))
    files = spark.read.parquet(f"{d}/files.parquet")
    out = run_pipeline(files, PipelineConfig())
    out["candidate_pairs"].cache().count()
    return str(d), out


def test_hot_block_pair_bound(skew_result, spark):
    d, out = skew_result
    cap = PipelineConfig().block_cap
    n_pairs = out["candidate_pairs"].count()
    # without capping, 3 blocks of 300 alone give 3*C(300,2) ~ 134k
    # pairs; the cap keeps each block to O(size*cap)
    assert n_pairs < 3 * 300 * (cap + 2) + 60_000, n_pairs


def test_skew_f1(skew_result, spark):
    d, out = skew_result
    lp = spark.read.parquet(f"{d}/labeled_pairs.parquet")
    m = pairwise_f1(out["clusters"], lp)
    assert m["f1"] >= 0.99, m


def test_hot_blocks_not_merged(skew_result, spark):
    # the 300 same-stem hard negatives share a blocking key but differ
    # in content: they must not collapse into one entity
    d, out = skew_result
    biggest = (
        out["clusters"].groupBy("entity_id").agg(F.count("*").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert biggest <= 10, f"a hot block collapsed into one cluster of {biggest}"
