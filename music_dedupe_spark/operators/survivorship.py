"""Survivorship & scheduled-maintenance operators (SURVEY §2.4 A2,
§2.5 W2/W3, EP3).

All of these produce *plan DataFrames* (keep/delete/rename decisions) —
never driver-side loops or filesystem mutation. The reference's
ThreadPoolExecutor fan-out per group (core.py:840-847) becomes partition
parallelism over a window function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from music_dedupe_spark.functions.text import (
    clean_tag_col,
    dirname_col,
    is_junk_col,
)


def rank_survivors(members: DataFrame, cluster_col: str = "entity_id") -> DataFrame:
    """argmax survivorship (A2, core.py:803-826): within each cluster the
    keeper is max by (quality, size); reference uses a stable sort and
    keeps the last (core.py:807-808) — we make the tie-break explicit
    and deterministic with file_id. Adds rank (1 = keeper) + is_keeper."""
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc("quality"), F.desc("size_chars"), F.asc("file_id")
    )
    return members.withColumn("rank", F.row_number().over(w)).withColumn(
        "is_keeper", F.col("rank") == 1
    )


def delete_plan(ranked: DataFrame) -> DataFrame:
    """Losers per cluster -> rows to delete (the reference's os.remove +
    delete_batch, core.py:811-825, as a plan)."""
    return ranked.filter(~F.col("is_keeper")).select(
        "file_id", "repo", "path", "entity_id", F.lit("dedupe_quality").alias("reason")
    )


def clean_short_plan(files: DataFrame, min_size_chars: int = 60) -> DataFrame:
    """task_clean_short (core.py:853-887, predicate :872): 0 < size <
    threshold -> delete set. The 60-second min_duration default
    (core.py:279) becomes 60 chars on code files."""
    return files.filter(
        (F.col("size_chars") > 0) & (F.col("size_chars") < min_size_chars)
    ).select("file_id", "repo", "path", F.lit("clean_short").alias("reason"))


def clean_junk_plan(files: DataFrame, supported_langs: tuple[str, ...] = ("py", "java", "c", "js")) -> DataFrame:
    """task_clean_junk (core.py:961-991): per directory, if NO file is a
    supported source file, junk-named files are deleted. The any()
    existence test (core.py:966-970) is a distinct + left-anti join (J4)."""
    with_dir = files.withColumn("_dir", F.concat_ws("/", F.col("repo"), dirname_col(F.col("path"))))
    dirs_with_source = (
        with_dir.filter(F.col("lang").isin(*supported_langs) & ~is_junk_col(F.col("filename")))
        .select("_dir")
        .distinct()
    )
    junk = with_dir.filter(is_junk_col(F.col("filename")))
    return junk.join(dirs_with_source, "_dir", "left_anti").select(
        "file_id", "repo", "path", F.lit("clean_junk").alias("reason")
    )


#: fields substituted verbatim (structural, not tag text — never cleaned)
_RAW_TEMPLATE_FIELDS = frozenset({"ext", "filename", "stem"})


def rename_plan(files: DataFrame, pattern: str = "{title}.{ext}") -> DataFrame:
    """batch_rename_files (core.py:1047-1114): compute the new filename
    from a pattern with cleaned tags, then number collisions ' (n)'
    (core.py:1092-1095) with a window (W3). Returns (file_id, path,
    new_path); no filesystem mutation.

    Template substitution (F8) is general, like the reference's
    ``pattern.format(**meta)`` (core.py:1073): any ``{field}`` naming a
    column of ``files`` substitutes that column — tag-like fields are
    cleaned (clean_tag_col) with an 'unknown' fallback mirroring the
    reference's safe_meta defaults (core.py:1064-1069); structural
    fields (ext/filename/stem) pass through raw. An unknown field raises
    ValueError at plan-build time, the analog of the reference's KeyError
    log-and-skip (core.py:1074-1077). Illegal filename characters are
    stripped from the formatted name afterwards (core.py:1079-1083),
    and values never reach a regex — no injection.
    """
    import re

    parts: list = []
    for i, seg in enumerate(re.split(r"\{(\w+)\}", pattern)):
        if i % 2 == 0:  # literal text between fields
            if seg:
                parts.append(F.lit(seg))
        elif seg in _RAW_TEMPLATE_FIELDS:
            if seg not in files.columns:
                raise ValueError(f"rename pattern error: missing key {{{seg}}}")
            parts.append(F.coalesce(F.col(seg), F.lit("")))
        elif seg in files.columns:
            parts.append(
                F.coalesce(
                    F.nullif(clean_tag_col(F.col(seg).cast("string")), F.lit("")),
                    F.lit("unknown"),
                )
            )
        else:
            raise ValueError(f"rename pattern error: missing key {{{seg}}}")
    # reference core.py:1079-1083: strip invalid filename chars from the
    # formatted base, then trim. '/' removal keeps the name inside _dir.
    new_name = F.trim(F.translate(F.concat(*parts), '<>:"/\\|?*', ""))
    with_target = files.withColumn("_dir", dirname_col(F.col("path"))).withColumn(
        "_new_name", new_name
    )
    w = Window.partitionBy("repo", "_dir", "_new_name").orderBy("path")
    return (
        with_target.withColumn("_n", F.row_number().over(w) - 1)
        .withColumn(
            "new_path",
            F.concat_ws(
                "/",
                F.nullif(F.col("_dir"), F.lit("")),
                F.when(F.col("_n") == 0, F.col("_new_name")).otherwise(
                    F.regexp_replace(
                        F.col("_new_name"), r"\.([^.]*)$", F.concat(F.lit(" ("), F.col("_n"), F.lit(").$1"))
                    )
                ),
            ),
        )
        .select("file_id", "repo", "path", "new_path")
    )


def apply_delete(files: DataFrame, plan: DataFrame) -> DataFrame:
    """S8: DELETE by key set == left-anti join against the plan."""
    return files.join(plan.select("file_id"), "file_id", "left_anti")
