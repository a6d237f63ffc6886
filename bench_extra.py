#!/usr/bin/env python
"""Round-6 optimization probes (guide §1: measure first; §1.4 noop sink).

NOT the driver bench — ``bench.py`` is frozen for measurement. This file
breaks the two dominant entries (dedup_minhash_lsh, er_pipeline) into
phases, attributing wall time to each driver action, so the optimization
targets the phase that actually costs, not the one that looks expensive.

Usage:
    python bench_extra.py lsh     # phase breakdown of dedup_minhash_lsh
    python bench_extra.py er      # phase breakdown of run_pipeline
    python bench_extra.py ngram   # phase breakdown of dedup_ngram_jaccard
    python bench_extra.py heads   # noop-sink isolation of the small queries
Each run prints one JSON line {"phases": {...}} (seconds per phase).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


class PhaseTimer:
    def __init__(self, spark):
        self.spark = spark
        self.phases: dict[str, float] = {}
        self._t0 = time.time()
        self._name = None

    def mark(self, name: str | None):
        now = time.time()
        if self._name is not None:
            self.phases[self._name] = round(
                self.phases.get(self._name, 0.0) + now - self._t0, 3
            )
        self._t0 = now
        self._name = name
        self.spark.sparkContext.setJobDescription(name)

    def done(self):
        self.mark(None)
        total = round(sum(self.phases.values()), 3)
        print(json.dumps({"phases": self.phases, "total": total}))


def _spark():
    from music_dedupe_spark.session import get_spark

    spark = get_spark("bench-extra", cpus=CPUS)
    # same warmup as bench.py: parquet JIT + python worker spawn
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    from pyspark.sql import functions as F

    from music_dedupe_spark.functions.similarity import name_scores_udf

    spark.range(2000).select(
        name_scores_udf(
            F.concat(F.lit("warm "), F.col("id").cast("string")), F.lit("warm 1")
        )
    ).count()
    return spark


def probe_lsh():
    from pyspark.sql import functions as F

    from music_dedupe_spark.operators import dedup
    from music_dedupe_spark.operators.blocking import minhash_lsh_pairs
    from music_dedupe_spark.queries import _t

    spark = _spark()
    t = PhaseTimer(spark)
    d = _t(spark, SF_DIR, "documents")

    t.mark("canary_pick_and_stats")
    canary_input, planted, n_docs, total_chars = dedup._lsh_canaries(d)

    t.mark("canary_lsh_pass")  # timed SERIALLY here; the entry overlaps it
    cpairs = minhash_lsh_pairs(
        canary_input, num_perm=128, bands=32, shingle_k=5,
        band_cap=2 * len(planted) + 1,
    )
    cdeps = getattr(cpairs, "_mds_persisted", [])
    found = {
        (r["left_id"], r["right_id"])
        for r in cpairs.select("left_id", "right_id").collect()
    }
    for dep in cdeps:
        dep.unpersist()
    recall_c = len({(str(o), f"~{o}") for o in planted} & found) / max(len(planted), 1)

    t.mark("real_pass_checkpoint")
    pairs = minhash_lsh_pairs(
        d.select(
            F.col("doc_id").cast("string").alias("file_id"),
            F.col("text").alias("content"),
        ),
        num_perm=128, bands=32, shingle_k=5,
    )
    pair_deps = getattr(pairs, "_mds_persisted", [])
    out = (
        pairs.select(
            F.least(F.col("left_id").cast("long"), F.col("right_id").cast("long")).alias("left_doc"),
            F.greatest(F.col("left_id").cast("long"), F.col("right_id").cast("long")).alias("right_doc"),
        )
        .dropDuplicates(["left_doc", "right_doc"])
        .orderBy("left_doc", "right_doc")
        .localCheckpoint()
    )
    for dep in pair_deps:
        dep.unpersist()

    t.mark("driver_collect")
    rows = out.collect()
    t.done()
    print(f"# n_docs={n_docs} canary_recall={recall_c:.3f} n_pairs={len(rows)}", file=sys.stderr)


def probe_er():
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from music_dedupe_spark import pipeline as P
    from music_dedupe_spark.operators import blocking, clustering, scoring
    from music_dedupe_spark.operators.survivorship import rank_survivors

    spark = _spark()
    t = PhaseTimer(spark)
    files = entry_mod.documents_as_files(spark, SF_DIR)
    cfg = P.PipelineConfig()

    t.mark("ingest_persist_count")
    features = P.ingest(files).persist()
    cfg.n_rows_hint = features.count()

    pv = P.pair_view(features)

    t.mark("minhash_signatures")
    sigs = blocking.minhash_signatures(
        pv, cfg.minhash_num_perm, cfg.shingle_k, seed=1, passthrough=("content_sha256",)
    ).persist()
    sigs.count()  # isolate the kernel cost (run_pipeline leaves it lazy)
    minhash_sigs = sigs.select("file_id", "sig")

    t.mark("candidates_count")
    candidate_pairs = P.generate_candidates(pv, cfg, minhash_sigs=minhash_sigs)
    _cand_deps = getattr(candidate_pairs, "_mds_persisted", [])
    candidate_pairs = candidate_pairs.persist()
    n_cand = candidate_pairs.count()
    for _d in _cand_deps:
        _d.unpersist()

    t.mark("scoring")
    scored = scoring.score_candidates(candidate_pairs, pv, cfg.scoring).persist()
    scored.count()

    t.mark("matched")
    matched = scoring.matched_pairs(scored).persist()
    matched.count()

    t.mark("cc_loop")
    assignment_int = clustering.connected_components(matched)

    t.mark("public_assignment")
    assignment = P.public_assignment(assignment_int, features)
    all_assign = (
        features.select(F.col("file_id").alias("member_id"))
        .join(assignment, "member_id", "left")
        .withColumn("entity_id", F.coalesce(F.col("entity_id"), F.col("member_id")))
    ).persist()
    n_clusters = all_assign.select("entity_id").distinct().count()

    t.mark("scored_pairs_public_count")
    n_pairs = P.public_pairs(scored, features).count()

    t.mark("ranked_noop")
    ranked = rank_survivors(
        features.join(all_assign, features["file_id"] == all_assign["member_id"]).drop(
            "member_id"
        )
    )
    ranked.write.format("noop").mode("overwrite").save()
    t.done()
    print(f"# n_cand={n_cand} n_pairs={n_pairs} n_clusters={n_clusters}", file=sys.stderr)


def probe_ngram():
    from music_dedupe_spark.operators.dedup import ngram_jaccard_pairs
    from music_dedupe_spark.queries import _t

    spark = _spark()
    t = PhaseTimer(spark)
    d = _t(spark, SF_DIR, "documents")
    t.mark("ngram_full")
    out = ngram_jaccard_pairs(d).orderBy("left_doc", "right_doc")
    rows = out.collect()
    for dep in getattr(out, "_mds_persisted", []):
        dep.unpersist()
    t.done()
    print(f"# n_pairs={len(rows)}", file=sys.stderr)


def probe_heads():
    import __spark_entry__ as entry_mod

    spark = _spark()
    qs = entry_mod.queries()
    t = PhaseTimer(spark)
    for name in (
        "q1_pricing_summary", "q3_top_revenue", "a2_survivorship",
        "j4_anti_join", "w1_sessionize", "dedup_exact", "ann_cosine_topk",
    ):
        t.mark(name)
        qs[name](spark, SF_DIR).collect()
    t.done()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "lsh"
    {"lsh": probe_lsh, "er": probe_er, "ngram": probe_ngram, "heads": probe_heads}[which]()


if __name__ == "__main__":
    main()
