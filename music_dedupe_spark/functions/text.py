"""Native (JVM-side, codegen'd) column expressions for normalization.

Each expression reproduces a scalar function from the reference
(SURVEY.md S2.8 / S2.2), re-targeted from music files to source-code
files. All of these stay inside whole-stage codegen — no Python.

Reference semantics reproduced here:
- filename/stem/ext splitting  (os.path.basename/splitext,
  /root/reference/app/core.py:338,415,788)
- title inference: stem; if " - " present, the part after the FIRST
  separator (/root/reference/app/core.py:412-419)
- blocking key: (title or stem).lower().strip()
  (/root/reference/app/core.py:680-683,692-693)
- search text: lower(concat of identity fields)
  (/root/reference/app/core.py:380)
- quality CASE score (/root/reference/app/core.py:787-801)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# analog of SUPPORTED_FORMATS ('.mp3','.flac','.m4a','.wma')
# /root/reference/app/core.py:37
SUPPORTED_LANGS = ("py", "java", "c", "js", "txt")

# analog of JUNK_EXTENSIONS ('.nfo','.jpg',...) /root/reference/app/core.py:39
JUNK_BASENAMES = (".DS_Store", "Thumbs.db")
JUNK_EXTS = ("bak", "tmp", "swp", "log", "orig")


def filename_col(path: Column) -> Column:
    """os.path.basename — /root/reference/app/core.py:338."""
    return F.element_at(F.split(path, "/"), -1)


def dirname_col(path: Column) -> Column:
    """os.path.dirname — /root/reference/app/core.py:624,1088."""
    return F.when(F.instr(path, "/") > 0, F.regexp_replace(path, "/[^/]*$", "")).otherwise(
        F.lit("")
    )


def stem_col(filename: Column) -> Column:
    """os.path.splitext(...)[0] — strip the last .ext if any
    (/root/reference/app/core.py:415,833). splitext keeps dotfiles whole
    ('.DS_Store' has no ext), reproduced by requiring a char before '.'."""
    return F.regexp_replace(filename, r"(?<=[^/.])\.[^./]*$", "")


def ext_col(filename: Column) -> Column:
    """os.path.splitext(...)[1] without the dot, lowercased
    (/root/reference/app/core.py:788)."""
    return F.lower(F.regexp_extract(filename, r"[^/.](\.([^./]*))$", 2))


def inferred_title_col(stem: Column) -> Column:
    """_infer_title_from_filename (/root/reference/app/core.py:412-419):
    if ' - ' occurs in the stem, keep everything after the FIRST ' - '
    (both branches of the reference's artist check are identical — a
    latent no-op we intentionally reproduce)."""
    return F.when(
        F.instr(stem, " - ") > 0,
        F.element_at(F.split(stem, " - ", 2), 2),
    ).otherwise(stem)


def block_key_col(title: Column, filename: Column) -> Column:
    """THE reference blocking key (P3):
    (title or splitext(filename)[0]).lower().strip()
    (/root/reference/app/core.py:680-683,692-693). Empty-string titles are
    falsy in Python, hence nullif('')."""
    return F.lower(F.trim(F.coalesce(F.nullif(title, F.lit("")), stem_col(filename))))


def search_text_col(*cols: Column) -> Column:
    """search_text = lower(' '.join(fields)) — /root/reference/app/core.py:380."""
    return F.lower(F.concat_ws(" ", *cols))


def tokens_col(content: Column) -> Column:
    """Identifier/word tokens of file content, lowercased.
    Analog of the search_text tokenization; the token-blocking and
    token-set-Jaccard channels run over this array."""
    arr = F.split(F.lower(F.regexp_replace(content, r"[^A-Za-z0-9_]+", " ")), " ")
    return F.filter(arr, lambda x: x != "")


def quality_score_col(lang: Column) -> Column:
    """CASE quality score, the survivorship ranking's first component.
    Analog of /root/reference/app/core.py:787-801
    (flac/wav->3, m4a/aac->2, mp3->1, else 0)."""
    return (
        F.when(lang.isin("py", "java"), F.lit(3))
        .when(lang.isin("c", "js"), F.lit(2))
        .when(lang == "txt", F.lit(1))
        .otherwise(F.lit(0))
    )


def clean_tag_col(c: Column) -> Column:
    """clean_tag + illegal-filename-char strip
    (/root/reference/app/core.py:1059-1062,1079-1083):
    ' / ', '/', ';' -> ' & ', then drop <>:"/\\|?* ."""
    c = F.regexp_replace(c, r"\s*/\s*|;", " & ")
    return F.translate(c, '<>:"/\\|?*', "")


def is_junk_col(filename: Column) -> Column:
    """Junk-file predicate (P10) — /root/reference/app/core.py:39,974."""
    return filename.isin(*JUNK_BASENAMES) | ext_col(filename).isin(*JUNK_EXTS)


def with_derived_columns(files: DataFrame) -> DataFrame:
    """Ingest projection (S2): all derived columns in one native pass.

    Equivalent of AudioMetadataExtractor.extract
    (/root/reference/app/core.py:335-393) — but columnar: one
    whole-stage-codegen'd projection instead of a per-row Python call.
    ``content_sha256`` is the per-row invariant every later stage must
    preserve (BASELINE.json input_hint).
    """
    fname = filename_col(F.col("path"))
    stem = stem_col(fname)
    title = inferred_title_col(stem)
    return (
        files.withColumn("filename", fname)
        .withColumn("stem", stem)
        .withColumn("ext", ext_col(fname))
        .withColumn("title", title)
        .withColumn("norm_name", block_key_col(title, fname))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .withColumn("size_chars", F.length("content"))
        .withColumn("n_lines", F.size(F.split(F.col("content"), "\n")))
        .withColumn("tokens", tokens_col(F.col("content")))
        # sorted distinct 64-bit token hashes: the compact token-set
        # representation the scoring cascade compares (set ops on int64
        # arrays are ~35x cheaper than on string arrays, and fixed-width)
        # bottom-256 of the sorted distinct hashes = a bottom-k sketch of
        # the token set: Jaccard over bottom-k sketches estimates set
        # Jaccard, and the cap bounds bytes-per-pair in the scorer no
        # matter how big the file is
        .withColumn(
            "token_hashes",
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.transform(tokens_col(F.col("content")), lambda x: F.xxhash64(x))
                    )
                ),
                1,
                256,
            ),
        )
        .withColumn("quality", quality_score_col(F.col("lang")))
        .withColumn(
            "search_text",
            search_text_col(F.col("repo"), F.col("title"), F.col("filename")),
        )
        # 128-bit row id (32 hex chars): collision-safe at 10^12 rows;
        # the PUBLIC identifier every output stage reports
        .withColumn(
            "file_id",
            F.sha2(
                F.concat_ws("\x1f", F.col("repo"), F.col("path"), F.col("commit")), 256
            ).substr(1, 32),
        )
        # 64-bit INTERNAL pair id: the blocking/scoring/clustering stages
        # shuffle pair rows (volume >> row count), so every exchange, join
        # probe, and Arrow batch carries 8-byte longs instead of 32-char
        # strings (the round-3 scaling decomposition measured the pair
        # joins as memory-bandwidth-bound — bytes/pair is the lever).
        # Derivable anywhere as xxhash64(file_id) with no join, which is
        # what lets incremental runs map an existing assignment to the
        # internal id space as a pure projection. Collision math: expected
        # colliding id pairs ~ n^2/2^65 — ~3e-12 at 10^7 rows, ~27k at
        # 10^12 (2.7e-8 of rows; a collision can spuriously merge two
        # entities, immaterial against the F1>=0.99 criterion). See
        # PipelineConfig.check_fid_collisions for the optional exactness
        # assertion on corpora where zero collisions are expected.
        .withColumn("fid", F.xxhash64(F.col("file_id")))
    )
