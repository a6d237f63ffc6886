"""Pairwise scoring (SURVEY §7 Stage 4, EP2 Spark shape).

The reference scores candidates two ways: fuzz.ratio on the blocking key
during grouping (core.py:695) and an external LLM verdict per candidate
group (core.py:730-768). The LLM is a non-reproducible oracle; per
SURVEY §2.10 the target replaces it with a deterministic rule over three
batched similarity scores (north rule: Jaro-Winkler + token-set Jaccard
+ normalized Levenshtein, all Arrow-vectorized).

Scale notes:
- features are joined to the pair table by id twice (two shuffle joins
  on file_id — unavoidable and AQE-coalesced);
- scores are computed once per DISTINCT (key_l, key_r) string pair
  inside each Arrow batch (hot keys repeat massively; see
  functions/similarity._dedup_apply);
- the decision column is pure Catalyst ``when/otherwise`` on top of the
  score columns.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from music_dedupe_spark.functions.similarity import name_scores_udf


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


FEATURE_COLS = ("file_id", "norm_name", "tokens", "content_sha256", "size_chars", "quality")


def pair_features(pairs: DataFrame, features: DataFrame) -> DataFrame:
    """Attach both sides' features to (left_id, right_id) pairs."""
    f = features.select(*FEATURE_COLS)
    left = f.select(*[F.col(c).alias(f"{c}_l") for c in FEATURE_COLS])
    right = f.select(*[F.col(c).alias(f"{c}_r") for c in FEATURE_COLS])
    return (
        pairs.join(left, pairs["left_id"] == left["file_id_l"])
        .join(right, pairs["right_id"] == right["file_id_r"])
        .drop("file_id_l", "file_id_r")
    )


def score_pairs(pairs_with_features: DataFrame, cfg: ScoringConfig | None = None) -> DataFrame:
    """Compute the score columns + the is_dup decision.

    Output adds: fuzz_key (int 0-100), jw (double), jaccard (double),
    norm_lev (double), exact_content (bool), is_dup (bool).
    """
    cfg = cfg or ScoringConfig()
    # token-set Jaccard stays entirely JVM-side (array_intersect/union
    # dedupe internally = set semantics); shipping token arrays through
    # Arrow was the scoring bottleneck AND scaled poorly (memory-bound).
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
        .withColumn(
            "exact_content", F.col("content_sha256_l") == F.col("content_sha256_r")
        )
    )
    return scored.withColumn(
        "is_dup",
        F.col("exact_content")
        | (
            (F.col("fuzz_key") > cfg.fuzz_threshold)
            & (F.col("jaccard") >= cfg.min_token_jaccard)
        )
        | (
            (F.col("jaccard") >= 0.9)
            & (F.col("jw") >= cfg.min_jaro_winkler)
            & (F.col("norm_lev") >= cfg.min_norm_lev)
        ),
    )


def matched_pairs(scored: DataFrame) -> DataFrame:
    """The edge list for clustering: confirmed-duplicate pairs only."""
    return scored.filter(F.col("is_dup")).select("left_id", "right_id")
