"""Incremental entity resolution: link NEW files against an already-
resolved corpus without re-scoring it (EP1 re-scan analog done right —
the reference re-walks the whole library every scan cycle,
/root/reference/app/core.py:585-663; at 10^12 rows a full re-run per
delta is not an option).

Candidate generation only pairs ``new × (new ∪ existing)``:

- existing × existing pairs are NEVER regenerated — their duplicate
  relation is already encoded in ``existing_assignment`` (member_id →
  entity_id), which enters the final connected-components pass as
  member→entity edges (stars), so transitive merges THROUGH a new
  bridging file still collapse the right existing entities;
- the delta edge volume is O(|new| · cap), independent of corpus size:
  blocking keys of the existing side are pre-filtered to keys present
  in the new batch (a broadcast semi-join when the batch is small —
  the common case), so the big side is scanned once and pruned early.

Exactness: running ``incremental_link`` over a delta produces the SAME
clusters as re-running the full pipeline over old ∪ new, because every
full-run matched pair is either old×old (⊆ closure of the existing
assignment), or touches a new file (⊆ the delta candidate set) —
tests/test_incremental_er.py asserts label-for-label equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from music_dedupe_spark.operators import blocking, clustering, scoring


def _touching_new(pairs: DataFrame, new_feats: DataFrame) -> DataFrame:
    """Keep only pairs with at least one NEW member (broadcast semi-
    joins on the small new-batch id set)."""
    new_ids = new_feats.select("file_id")
    keep_l = pairs.join(
        F.broadcast(new_ids.withColumnRenamed("file_id", "left_id")), "left_id", "left_semi"
    )
    keep_r = pairs.join(
        F.broadcast(new_ids.withColumnRenamed("file_id", "right_id")), "right_id", "left_semi"
    )
    out = keep_l.unionByName(keep_r).dropDuplicates(["left_id", "right_id"])
    deps = getattr(pairs, "_mds_persisted", [])
    if deps:
        out._mds_persisted = deps
    return out


def _delta_exact_key_pairs(
    new_feats: DataFrame, all_feats: DataFrame, cap: int = 64
) -> DataFrame:
    """exact-key channel restricted to blocks that contain >= 1 new
    file: the existing side is pruned by a broadcast semi-join on the
    new batch's (typically small) key set, then the SAME cap-and-star
    machinery as the batch channel bounds hot blocks, and only
    new-touching pairs survive (old×old connectivity lives in the
    existing assignment)."""
    new_keys = new_feats.select("norm_name").distinct()
    pruned = all_feats.join(F.broadcast(new_keys), "norm_name", "left_semi")
    return _touching_new(blocking.exact_key_pairs(pruned, cap=cap), new_feats)


def _delta_content_star(new_feats: DataFrame, all_feats: DataFrame) -> DataFrame:
    """content-sha channel: link each new file to the minimum file_id of
    its sha group across the WHOLE corpus (one groupBy on the pruned
    sha set, linear)."""
    new_shas = new_feats.select("content_sha256").distinct()
    grp = (
        all_feats.select("content_sha256", "file_id")
        .join(F.broadcast(new_shas), "content_sha256", "left_semi")
    )
    roots = grp.groupBy("content_sha256").agg(F.min("file_id").alias("_root"))
    return (
        grp.join(roots, "content_sha256")
        .filter(F.col("file_id") != F.col("_root"))
        .select(
            F.least("file_id", "_root").alias("left_id"),
            F.greatest("file_id", "_root").alias("right_id"),
        )
        .withColumn("channel", F.lit("exact_content"))
    )


def incremental_link(
    new_files: DataFrame,
    existing_features: DataFrame,
    existing_assignment: DataFrame,
    cfg=None,
) -> dict[str, DataFrame]:
    """Resolve ``new_files`` against an existing corpus.

    Inputs: raw new files (repo, path, commit, lang, content); the
    existing ingested features table; the existing (member_id,
    entity_id) assignment (e.g. the previous run's ``clusters``).

    Returns dict with ``features`` (new rows only), ``candidate_pairs``
    (delta), ``scored_pairs``, and ``clusters`` — the FULL updated
    assignment covering old and new members.
    """
    from music_dedupe_spark.pipeline import PipelineConfig, ingest

    cfg = cfg or PipelineConfig()
    new_feats = ingest(new_files).withColumn("_is_new", F.lit(True)).persist()
    old_feats = existing_features.withColumn("_is_new", F.lit(False))
    all_feats = old_feats.unionByName(new_feats, allowMissingColumns=True).persist()

    channels = [
        # old→root links inside a touched sha group duplicate closure the
        # existing assignment already has — keep the delta pure
        _touching_new(_delta_content_star(new_feats, all_feats), new_feats),
        _delta_exact_key_pairs(new_feats, all_feats, cap=cfg.block_cap),
    ]
    if cfg.use_lsh:
        # LSH recall channel over new ∪ existing; restricted to pairs
        # touching a new file. Signatures for the existing side would be
        # cached/stored in production (they are deterministic per sha);
        # here they recompute.
        lsh = blocking.minhash_lsh_pairs(
            all_feats,
            num_perm=cfg.minhash_num_perm,
            bands=cfg.minhash_bands,
            shingle_k=cfg.shingle_k,
        )
        channels.append(_touching_new(lsh, new_feats))
    candidate_pairs = blocking.union_channels(*channels).persist()

    scored = scoring.score_candidates(candidate_pairs, all_feats, cfg.scoring).persist()
    delta_edges = scoring.matched_pairs(scored)

    # fold the existing resolution in as member→entity star edges: CC
    # over (delta ∪ stars) merges entities bridged by new files and
    # leaves untouched components exactly as they were.
    star_edges = existing_assignment.filter(
        F.col("member_id") != F.col("entity_id")
    ).select(
        F.col("entity_id").alias("left_id"), F.col("member_id").alias("right_id")
    )
    assignment = clustering.connected_components(
        delta_edges.unionByName(star_edges)
    )
    all_ids = all_feats.select(F.col("file_id").alias("member_id"))
    singletons = all_ids.join(assignment.select("member_id"), "member_id", "left_anti").withColumn(
        "entity_id", F.col("member_id")
    )
    clusters = assignment.unionByName(singletons).dropDuplicates(["member_id"])
    return {
        "features": new_feats.drop("_is_new"),
        "candidate_pairs": candidate_pairs,
        "scored_pairs": scored,
        "clusters": clusters,
    }
