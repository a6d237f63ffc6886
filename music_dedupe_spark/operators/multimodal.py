"""Multimodal (binary) column plumbing.

The reference extracts embedded album art bytes and writes them as
side-output .jpg files (/root/reference/app/core.py:943-958) and reads
audio duration/bitrate from media headers (core.py:335-393). The
engine-side generalization: media payloads are opaque ``binary``
columns with typed metadata structs; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` operators.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernel is stubbed: ``decode_stub=True`` (default) derives
deterministic fake features from the bytes; ``decode_stub=False``
raises NotImplementedError where the real library call belongs. The
Spark-side plumbing — schema, batch iteration, partition sizing,
side-output table — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def _decode_features(payload: bytes, kind: str, decode_stub: bool) -> np.ndarray:
    if not decode_stub:
        # real implementation: PIL.Image.open / librosa.load / pyav frame
        # sample — libraries not present in this container
        raise NotImplementedError("media codecs unavailable; run with decode_stub=True")
    # deterministic fake: hash-seeded feature vector (stable across runs
    # and partitionings; unit-norm like a real embedding)
    h = hashlib.blake2b((kind or "").encode() + (payload or b""), digest_size=FEATURE_DIM * 4).digest()
    vec = np.frombuffer(h, dtype=np.uint32).astype(np.float64)
    vec = vec / np.linalg.norm(vec) if vec.any() else vec
    return vec


def extract_media_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """(media_id, kind, features: array<double>, n_bytes) — the decode /
    feature-extract operator. Arrow batches keep payload bytes off the
    driver; partition sizing is byte-aware (repartition upstream by
    ``n_bytes`` buckets when payloads are large)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_features(p, k, decode_stub).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id string, kind string, features array<double>, n_bytes long"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode
    (media_id, frame_idx, offset_ms). The decode itself is the stubbed
    kernel above; the plan is a pure Catalyst sequence-explode, so the
    work list is distributed and prunable before any codec runs."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("offset_ms"),
    )


#: XML template of the reference's NFO side output
#: (/root/reference/app/core.py:906-914): title falls back to the file
#: stem, runtime is the m:ss string of core.py:906. Engine analogs for
#: the source-code corpus: artist -> repo, album -> directory,
#: duration -> size_chars.
_NFO_XML = (
    '<?xml version="1.0" encoding="utf-8" standalone="yes"?>\n'
    "<musicvideo>\n"
    "  <title>%s</title>\n"
    "  <artist>%s</artist>\n"
    "  <album>%s</album>\n"
    "  <plot></plot>\n"
    "  <runtime>%d:%02d</runtime>\n"
    "</musicvideo>"
)


def side_output_artifacts(files: DataFrame, art_col: str | None = None) -> DataFrame:
    """S12 analog (task_extract_meta, /root/reference/app/core.py:890-958):
    derive the side-output artifact table instead of mutating a
    filesystem. Three artifact kinds, exactly the reference's writes:

    - ``nfo``    — one per file; payload = the XML template of
      core.py:907-914 (title|artist|album|plot|runtime m:ss).
    - ``jpg``    — one per file (core.py:943-951); payload = base64 of
      the embedded-art binary column ``art_col`` when present, null when
      the file carries no art (the reference's _extract_album_art -> None).
    - ``folder`` — one ``folder.jpg`` per directory (core.py:953-958);
      payload = the art of the lowest file_id in the directory that has
      art (the reference writes folder.jpg once, from the first file
      processed — min id is the deterministic analog). Directories with
      no art emit no folder row, matching ``if art_data:``.

    Scales as one projection (nfo+jpg) plus one groupBy per directory
    (folder) — no joins on the payload bytes except the single
    min-id-per-dir aggregation, which moves each art blob once.
    """
    from music_dedupe_spark.functions.text import dirname_col, stem_col, filename_col

    fname = filename_col(F.col("path"))
    stem = stem_col(fname)
    dirn = dirname_col(F.col("path"))
    base = F.concat_ws("/", F.nullif(dirn, F.lit("")), stem)
    dur = F.coalesce(F.col("size_chars"), F.lit(0)).cast("bigint")
    nfo_payload = F.format_string(
        _NFO_XML,
        F.coalesce(F.nullif(F.col("title"), F.lit("")), stem),
        F.col("repo"),
        F.coalesce(F.nullif(dirn, F.lit("")), F.col("repo")),
        (dur / 60).cast("bigint"),
        dur % 60,
    )
    nfo = files.select(
        F.col("file_id"),
        F.concat(base, F.lit(".nfo")).alias("artifact_path"),
        F.lit("nfo").alias("artifact_kind"),
        nfo_payload.alias("artifact_payload"),
    )
    art = F.col(art_col) if art_col else F.lit(None).cast("binary")
    jpg = files.select(
        F.col("file_id"),
        F.concat(base, F.lit(".jpg")).alias("artifact_path"),
        F.lit("jpg").alias("artifact_kind"),
        F.base64(art).alias("artifact_payload"),
    )
    out = nfo.unionByName(jpg)
    if art_col:
        folder = (
            files.filter(F.col(art_col).isNotNull())
            .select(dirn.alias("_dir"), "file_id", F.col(art_col).alias("_art"))
            .groupBy("_dir")
            .agg(F.min(F.struct("file_id", "_art")).alias("_first"))
            .select(
                F.col("_first.file_id").alias("file_id"),
                F.concat_ws("/", F.nullif(F.col("_dir"), F.lit("")), F.lit("folder.jpg")).alias(
                    "artifact_path"
                ),
                F.lit("folder").alias("artifact_kind"),
                F.base64(F.col("_first._art")).alias("artifact_payload"),
            )
        )
        out = out.unionByName(folder)
    return out
