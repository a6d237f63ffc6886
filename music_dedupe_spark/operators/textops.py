"""Text-analysis operators for a training-data pipeline over the
``documents`` table: language-ID, quality scoring, token counting,
fingerprinting. All native Catalyst expressions (no Python), each with
a DuckDB oracle registered in the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from music_dedupe_spark.queries import _t, register

# stopword markers per language for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": (" the ", " and "),
    "de": (" der ", " und "),
    "fr": (" le ", " et "),
    "es": (" el ", " y "),
}


def _count_occurrences(col, needle: str):
    """Occurrences of ``needle`` via length arithmetic — identical
    semantics in Spark and DuckDB (no regex dialect drift)."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def token_count_col(text):
    """Whitespace token count: trim then count space runs + 1; empty -> 0."""
    trimmed = F.trim(text)
    # collapse runs of whitespace to single spaces, then count
    collapsed = F.regexp_replace(trimmed, r"\s+", " ")
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.length(collapsed) - F.length(F.replace(collapsed, F.lit(" "), F.lit(""))) + 1
    )


def quality_score_expr(text):
    """Document quality score in [0,1]: blend of length band, alpha
    ratio and mean token length — the text analog of the reference's
    CASE quality (core.py:787-801) with continuous features."""
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    toks = token_count_col(text)
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    len_band = F.when((n >= 100) & (n <= 2000), F.lit(1.0)).when(n > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    mean_tok = F.when(toks > 0, n / toks).otherwise(F.lit(0.0))
    tok_band = F.when((mean_tok >= 3) & (mean_tok <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((alpha_ratio + len_band + tok_band) / 3.0, 4)


@register(
    "text_token_count",
    """SELECT doc_id,
              CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE length(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                        - length(replace(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ', ''))
                        + 1 END AS n_tokens
       FROM documents ORDER BY doc_id""",
)
def text_token_count(spark, sf):
    """Token counting (whitespace tokenization) for corpus statistics."""
    return (
        _t(spark, sf, "documents")
        .select("doc_id", token_count_col(F.col("text")).cast("long").alias("n_tokens"))
        .orderBy("doc_id")
    )


@register(
    "text_lang_id",
    """SELECT doc_id, lang,
              CASE greatest(en_s, de_s, fr_s, es_s)
                   WHEN en_s THEN 'en' WHEN de_s THEN 'de'
                   WHEN fr_s THEN 'fr' ELSE 'es' END AS lang_pred
       FROM (SELECT doc_id, lang,
                    (length(t) - length(replace(t, ' the ', ''))) / 5
                  + (length(t) - length(replace(t, ' and ', ''))) / 5 AS en_s,
                    (length(t) - length(replace(t, ' der ', ''))) / 5
                  + (length(t) - length(replace(t, ' und ', ''))) / 5 AS de_s,
                    (length(t) - length(replace(t, ' le ', ''))) / 4
                  + (length(t) - length(replace(t, ' et ', ''))) / 4 AS fr_s,
                    (length(t) - length(replace(t, ' el ', ''))) / 4
                  + (length(t) - length(replace(t, ' y ', ''))) / 3 AS es_s
             FROM (SELECT doc_id, lang, concat(' ', lower(text), ' ') AS t
                   FROM documents))
       ORDER BY doc_id""",
)
def text_lang_id(spark, sf):
    """Language-ID heuristic: stopword-marker frequency argmax, ties
    resolved in fixed order (en > de > fr > es) by the CASE."""
    t = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    d = _t(spark, sf, "documents").withColumn("t", t)
    scores = {
        lang: sum((_count_occurrences(F.col("t"), m) for m in markers), F.lit(0))
        for lang, markers in _LANG_MARKERS.items()
    }
    d = d.select("doc_id", "lang", *[v.alias(f"{k}_s") for k, v in scores.items()])
    best = F.greatest("en_s", "de_s", "fr_s", "es_s")
    pred = (
        F.when(F.col("en_s") == best, "en")
        .when(F.col("de_s") == best, "de")
        .when(F.col("fr_s") == best, "fr")
        .otherwise("es")
    )
    return d.select("doc_id", "lang", pred.alias("lang_pred")).orderBy("doc_id")


@register(
    "text_quality_score",
    """SELECT doc_id,
              round((CASE WHEN length(text) > 0
                          THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                               / length(text) ELSE 0 END
                   + CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 1.0
                          WHEN length(text) > 0 THEN 0.5 ELSE 0.0 END
                   + CASE WHEN n_tok > 0
                               AND CAST(length(text) AS DOUBLE) / n_tok BETWEEN 3 AND 12
                          THEN 1.0 ELSE 0.5 END) / 3.0, 4) AS quality
       FROM (SELECT doc_id, text,
                    CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE length(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                              - length(replace(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ', ''))
                              + 1 END AS n_tok
             FROM documents)
       ORDER BY doc_id""",
)
def text_quality_score(spark, sf):
    """Per-document quality score (length/alpha/token-shape blend)."""
    return (
        _t(spark, sf, "documents")
        .select("doc_id", quality_score_expr(F.col("text")).alias("quality"))
        .orderBy("doc_id")
    )


@register(
    "text_fingerprint",
    """SELECT doc_id, sha256(text) AS fp FROM documents ORDER BY doc_id""",
)
def text_fingerprint(spark, sf):
    """Document fingerprint: sha256 of content — the per-row invariant
    hash (BASELINE.json input_hint) checked engine-vs-engine."""
    return (
        _t(spark, sf, "documents")
        .select("doc_id", F.sha2(F.col("text"), 256).alias("fp"))
        .orderBy("doc_id")
    )
