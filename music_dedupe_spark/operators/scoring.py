"""Pairwise scoring (SURVEY §7 Stage 4, EP2 Spark shape).

The reference scores candidates two ways: fuzz.ratio on the blocking key
during grouping (core.py:695) and an external LLM verdict per candidate
group (core.py:730-768). The LLM is a non-reproducible oracle; per
SURVEY §2.10 the target replaces it with a deterministic rule over
batched similarity scores (north rule: Jaro-Winkler + token-set Jaccard
+ normalized Levenshtein, all Arrow-vectorized).

Scale design — a two-phase CASCADE:

  phase 1 (every candidate pair): join only the NARROW features
    (norm_name, content_sha256) — the join output stays ~100 bytes/row
    at 10^12 pairs — and compute all three name scores in ONE fused
    Arrow UDF (functions/similarity.name_scores_frame: batched DP over
    the batch's distinct key pairs).
  phase 2 (gate survivors only): join the token-set hash arrays and
    verify with exact Jaccard (numpy sorted-set intersect). Survivors
    are a small fraction of candidates, so the wide array columns never
    flow through the full pair volume. (JVM array_intersect is a
    CodegenFallback expression — measured ~30x slower than this path.)

The decision column is pure Catalyst ``when/otherwise`` on top.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from music_dedupe_spark.functions.similarity import hash_jaccard_udf, name_scores_udf


@dataclass(frozen=True)
class ScoringConfig:
    """Deterministic replacement of the reference's LLM verdict.

    ``fuzz_threshold`` is the reference's `> 85` (core.py:697). A pair is
    a duplicate when content is identical (sha equality — 'same song,
    different extension'), or when the blocking keys fuzzy-match like the
    reference AND the contents actually overlap (token Jaccard), which is
    what the LLM verdict was approximating ('different songs sharing a
    title -> NOT DUPLICATE')."""

    fuzz_threshold: int = 85
    min_token_jaccard: float = 0.5
    min_jaro_winkler: float = 0.88
    min_norm_lev: float = 0.86
    high_jaccard: float = 0.9


NARROW_COLS = ("file_id", "norm_name", "content_sha256")
FEATURE_COLS = ("file_id", "norm_name", "tokens", "content_sha256", "size_chars", "quality")


def _two_sided(features: DataFrame, cols: tuple[str, ...]) -> tuple[DataFrame, DataFrame]:
    f = features.select(*cols)
    left = f.select(*[F.col(c).alias(f"{c}_l") for c in cols])
    right = f.select(*[F.col(c).alias(f"{c}_r") for c in cols])
    return left, right


def pair_features(pairs: DataFrame, features: DataFrame) -> DataFrame:
    """Attach both sides' (wide) features to (left_id, right_id) pairs.
    Retained for operators that need full rows; the cascade below joins
    narrow columns instead."""
    left, right = _two_sided(features, FEATURE_COLS)
    return (
        pairs.join(left, pairs["left_id"] == left["file_id_l"])
        .join(right, pairs["right_id"] == right["file_id_r"])
        .drop("file_id_l", "file_id_r")
    )


def _name_gate(cfg: ScoringConfig) -> Column:
    return (
        F.col("exact_content")
        | (F.col("fuzz_key") > cfg.fuzz_threshold)
        | ((F.col("jw") >= cfg.min_jaro_winkler) & (F.col("norm_lev") >= cfg.min_norm_lev))
    )


def score_candidates(
    pairs: DataFrame, features: DataFrame, cfg: ScoringConfig | None = None
) -> DataFrame:
    """The cascade. Output: (left_id, right_id, [channel], fuzz_key, jw,
    norm_lev, exact_content, gate_passed, jaccard (null when the gate
    failed — phase 2 never ran), is_dup)."""
    cfg = cfg or ScoringConfig()

    left, right = _two_sided(features, NARROW_COLS)
    phase1 = (
        pairs.join(left, pairs["left_id"] == left["file_id_l"])
        .join(right, pairs["right_id"] == right["file_id_r"])
        .drop("file_id_l", "file_id_r")
        .withColumn("_ns", name_scores_udf(F.col("norm_name_l"), F.col("norm_name_r")))
        .withColumn("fuzz_key", F.col("_ns.fuzz_key"))
        .withColumn("jw", F.col("_ns.jw"))
        .withColumn("norm_lev", F.col("_ns.norm_lev"))
        .withColumn("exact_content", F.col("content_sha256_l") == F.col("content_sha256_r"))
        .withColumn("gate_passed", _name_gate(cfg))
        .drop("_ns", "norm_name_l", "norm_name_r", "content_sha256_l", "content_sha256_r")
    )

    survivors = phase1.filter(F.col("gate_passed") & ~F.col("exact_content"))
    th = features.select("file_id", "token_hashes")
    tl = th.select(F.col("file_id").alias("_fl"), F.col("token_hashes").alias("_hl"))
    tr = th.select(F.col("file_id").alias("_fr"), F.col("token_hashes").alias("_hr"))
    verified = (
        survivors.join(tl, survivors["left_id"] == tl["_fl"])
        .join(tr, survivors["right_id"] == tr["_fr"])
        .withColumn("jaccard", hash_jaccard_udf(F.col("_hl"), F.col("_hr")))
        .drop("_fl", "_fr", "_hl", "_hr")
    )
    rest = phase1.filter(~(F.col("gate_passed") & ~F.col("exact_content"))).withColumn(
        "jaccard", F.lit(None).cast("double")
    )
    scored = verified.unionByName(rest)

    is_dup = F.col("exact_content") | (
        F.col("gate_passed")
        & (
            (
                (F.col("fuzz_key") > cfg.fuzz_threshold)
                & (F.col("jaccard") >= cfg.min_token_jaccard)
            )
            | (
                (F.col("jaccard") >= cfg.high_jaccard)
                & (F.col("jw") >= cfg.min_jaro_winkler)
                & (F.col("norm_lev") >= cfg.min_norm_lev)
            )
        )
    )
    return scored.withColumn("is_dup", F.coalesce(is_dup, F.lit(False)))


def score_pairs(pairs_with_features: DataFrame, cfg: ScoringConfig | None = None) -> DataFrame:
    """Legacy single-phase scorer over pre-joined wide rows (kept for
    API compatibility and tests; the pipeline uses score_candidates).
    Computes the same columns; jaccard from the token string arrays."""
    cfg = cfg or ScoringConfig()
    n_inter = F.size(F.array_intersect("tokens_l", "tokens_r"))
    n_union = F.size(F.array_union("tokens_l", "tokens_r"))
    jaccard = F.when(n_union == 0, F.lit(1.0)).otherwise(n_inter / n_union)
    scored = (
        pairs_with_features.withColumn(
            "_ns", name_scores_udf(F.col("norm_name_l"), F.col("norm_name_r"))
        )
        .withColumn("fuzz_key", F.col("_ns.fuzz_key"))
        .withColumn("jw", F.col("_ns.jw"))
        .withColumn("norm_lev", F.col("_ns.norm_lev"))
        .drop("_ns")
        .withColumn("jaccard", jaccard)
        .withColumn("exact_content", F.col("content_sha256_l") == F.col("content_sha256_r"))
    )
    return scored.withColumn(
        "is_dup",
        F.col("exact_content")
        | (
            (F.col("fuzz_key") > cfg.fuzz_threshold)
            & (F.col("jaccard") >= cfg.min_token_jaccard)
        )
        | (
            (F.col("jaccard") >= cfg.high_jaccard)
            & (F.col("jw") >= cfg.min_jaro_winkler)
            & (F.col("norm_lev") >= cfg.min_norm_lev)
        ),
    )


def matched_pairs(scored: DataFrame) -> DataFrame:
    """The edge list for clustering: confirmed-duplicate pairs only."""
    return scored.filter(F.col("is_dup")).select("left_id", "right_id")
