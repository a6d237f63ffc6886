"""Multimodal binary-column plumbing: schema, batch shape, determinism,
stub gating (SURVEY S12 + builder multimodal requirement)."""

import pytest
from pyspark.sql import functions as F

from music_dedupe_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_media_features,
    frame_sample_plan,
    side_output_artifacts,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", b"\x89PNG fake bytes", ("image/png", 640, 480, None)),
        ("m2", "audio", b"ID3 fake mp3 bytes", ("audio/mpeg", None, None, 180_000)),
        ("m3", "video", b"\x00\x00ftyp fake", ("video/mp4", 1920, 1080, 4_500)),
        ("m4", "image", None, ("image/png", 1, 1, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shape_and_determinism(spark, media):
    out1 = extract_media_features(media).orderBy("media_id").collect()
    out2 = extract_media_features(media.repartition(3)).orderBy("media_id").collect()
    assert [r["media_id"] for r in out1] == ["m1", "m2", "m3", "m4"]
    for r1, r2 in zip(out1, out2):
        assert len(r1["features"]) == FEATURE_DIM
        assert r1["features"] == r2["features"]  # partitioning-independent
    assert out1[0]["n_bytes"] == 15


def test_decode_stub_gate(spark, media):
    with pytest.raises(Exception) as e:
        extract_media_features(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(e.value) or "codecs unavailable" in str(e.value)


def test_frame_sample_plan(spark, media):
    plan = frame_sample_plan(media, every_ms=1000).collect()
    # 4.5s video -> 4 frames at 0,1000,2000,3000
    assert [(r["frame_idx"], r["offset_ms"]) for r in plan] == [
        (0, 0), (1, 1000), (2, 2000), (3, 3000),
    ]


def test_side_output_artifacts(spark, files_df):
    from music_dedupe_spark.pipeline import ingest

    feats = ingest(files_df).limit(20)
    arts = side_output_artifacts(feats).collect()
    # both reference side outputs per file: .nfo + .jpg (core.py:890-958)
    assert len(arts) == 40
    nfo = [r for r in arts if r["artifact_kind"] == "nfo"]
    jpg = [r for r in arts if r["artifact_kind"] == "jpg"]
    assert len(nfo) == 20 and len(jpg) == 20
    for r in nfo:
        assert r["artifact_path"].endswith(".nfo")
        # XML template of core.py:907-914
        assert r["artifact_payload"].startswith('<?xml version="1.0"')
        assert "<musicvideo>" in r["artifact_payload"]
        assert "<artist>" in r["artifact_payload"]
        assert "<runtime>" in r["artifact_payload"]
    for r in jpg:
        assert r["artifact_path"].endswith(".jpg")
        assert r["artifact_payload"] is None  # no art column -> null payload


def test_side_output_artifacts_with_art(spark, files_df):
    from music_dedupe_spark.pipeline import ingest

    feats = ingest(files_df).limit(20).withColumn(
        "cover_art",
        F.when(F.xxhash64("file_id") % 2 == 0, F.to_binary(F.lit("ffd8"), F.lit("hex"))),
    )
    feats.cache()
    n_art = feats.filter(F.col("cover_art").isNotNull()).count()
    n_dirs_with_art = (
        feats.filter(F.col("cover_art").isNotNull())
        .select(F.expr("regexp_replace(path, '/[^/]+$', '')").alias("d"))
        .distinct()
        .count()
    )
    arts = side_output_artifacts(feats, art_col="cover_art").collect()
    jpg = [r for r in arts if r["artifact_kind"] == "jpg"]
    folder = [r for r in arts if r["artifact_kind"] == "folder"]
    assert len(jpg) == 20
    assert sum(r["artifact_payload"] is not None for r in jpg) == n_art
    # one folder.jpg per directory that has at least one art-bearing file
    assert len(folder) == n_dirs_with_art
    for r in folder:
        assert r["artifact_path"].endswith("folder.jpg")
        assert r["artifact_payload"] == "/9g="  # base64 of ffd8
    feats.unpersist()
