"""Normalization-expression parity (SURVEY §2.2 P3-P7, §5.2): the native
Spark expressions must agree with a straight-line Python re-statement of
the reference's os.path/str logic on golden + generated paths."""

import os

import pytest
from pyspark.sql import functions as F

from music_dedupe_spark.fixtures import block_key as py_block_key
from music_dedupe_spark.functions import text


def _py_stem(fname: str) -> str:
    return os.path.splitext(fname)[0]


def _py_ext(fname: str) -> str:
    return os.path.splitext(fname)[1].lower().lstrip(".")


def _py_title(stem: str) -> str:
    # _infer_title_from_filename, core.py:412-419
    if " - " in stem:
        return stem.split(" - ", 1)[1]
    return stem


PATHS = [
    "src/pkg/util_math.py",
    "a/b/Song Title - Live Version.flac",
    "Artist - Title - Remix.mp3",
    "noext",
    "dir.with.dots/file.tar.gz",
    ".DS_Store",
    "x/.hidden",
    "x/.hidden.swp",
    "UPPER CASE - NAME.TXT",
    "trailing space - t .py",
    "src/main.py",
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame([(p,) for p in PATHS], "path string")
    fname = text.filename_col(F.col("path"))
    stem = text.stem_col(fname)
    out = df.select(
        "path",
        fname.alias("fname"),
        stem.alias("stem"),
        text.ext_col(fname).alias("ext"),
        text.inferred_title_col(stem).alias("title"),
        text.block_key_col(text.inferred_title_col(stem), fname).alias("bk"),
        text.dirname_col(F.col("path")).alias("dirname"),
        text.is_junk_col(fname).alias("junk"),
    ).collect()
    return {r["path"]: r for r in out}


def test_filename_stem_ext(parsed):
    for p in PATHS:
        fname = p.rsplit("/", 1)[-1]
        r = parsed[p]
        assert r["fname"] == fname, p
        assert r["stem"] == _py_stem(fname), p
        assert r["ext"] == _py_ext(fname), p


def test_title_and_block_key(parsed):
    for p in PATHS:
        fname = p.rsplit("/", 1)[-1]
        r = parsed[p]
        assert r["title"] == _py_title(_py_stem(fname)), p
        assert r["bk"] == py_block_key(p), p


def test_dirname(parsed):
    for p in PATHS:
        want = p.rsplit("/", 1)[0] if "/" in p else ""
        assert parsed[p]["dirname"] == want, p


def test_junk_predicate(parsed):
    assert parsed[".DS_Store"]["junk"]
    assert parsed["x/.hidden.swp"]["junk"]
    assert not parsed["src/main.py"]["junk"]


def test_quality_case_truth_table(spark):
    # CASE truth table from core.py:787-801 (flac/wav->3, m4a/aac->2,
    # mp3->1, else 0), mapped to langs
    df = spark.createDataFrame(
        [("py",), ("java",), ("c",), ("js",), ("txt",), ("rs",)], "lang string"
    )
    got = {
        r["lang"]: r["q"]
        for r in df.select("lang", text.quality_score_col(F.col("lang")).alias("q")).collect()
    }
    assert got == {"py": 3, "java": 3, "c": 2, "js": 2, "txt": 1, "rs": 0}


def test_clean_tag(spark):
    df = spark.createDataFrame([("AC / DC; Rock/Roll <b>?",)], "t string")
    got = df.select(text.clean_tag_col(F.col("t")).alias("c")).collect()[0]["c"]
    assert "/" not in got and ";" not in got and "<" not in got and "?" not in got
    assert "&" in got


def test_multivalue_tag_join(spark):
    # P5: list -> keep truthy -> strip -> ' / '.join (core.py:405-410)
    df = spark.createDataFrame([([" a ", None, "", "b"],)], "vals array<string>")
    got = df.select(
        F.array_join(
            F.transform(
                F.filter(F.col("vals"), lambda x: x.isNotNull() & (F.trim(x) != "")),
                lambda x: F.trim(x),
            ),
            " / ",
        ).alias("j")
    ).collect()[0]["j"]
    assert got == "a / b"
