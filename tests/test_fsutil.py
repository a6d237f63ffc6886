"""Hadoop-FileSystem helpers: the atomic versioned-dir publish,
including the dir-rename-NESTS-instead-of-failing race recovery."""

import os

from music_dedupe_spark import fsutil


def _mkdir_with_marker(path, marker):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, marker), "w") as fh:
        fh.write("x")


def test_claim_versioned_dir_simple(spark, tmp_path):
    parent = str(tmp_path / "store")
    os.makedirs(parent)
    tmp = f"{parent}/.tmp_abc"
    _mkdir_with_marker(tmp, "mine")
    got = fsutil.claim_versioned_dir(spark, tmp, parent, "sig_store")
    assert got == f"{parent}/sig_store_0000"
    assert os.path.exists(f"{parent}/sig_store_0000/mine")
    assert not os.path.exists(tmp)


def test_claim_versioned_dir_skips_existing(spark, tmp_path):
    parent = str(tmp_path / "store")
    _mkdir_with_marker(f"{parent}/sig_store_0000", "winner")
    tmp = f"{parent}/.tmp_xyz"
    _mkdir_with_marker(tmp, "mine")
    got = fsutil.claim_versioned_dir(spark, tmp, parent, "sig_store")
    assert got == f"{parent}/sig_store_0001"
    assert os.path.exists(f"{parent}/sig_store_0001/mine")
    assert os.path.exists(f"{parent}/sig_store_0000/winner")


def test_claim_versioned_dir_recovers_from_nesting_race(spark, tmp_path, monkeypatch):
    """Hadoop dir-rename onto an existing destination NESTS the source
    inside it and returns True — a naive probe-then-rename loser would
    'succeed' while its data sits hidden. Stage the race INSIDE the
    probe window (the winner's dir materializes after the existence
    probe returns absent but before the rename — with max-index
    seeding, that is the only window left); the claim must recover the
    nested dir and publish it at the next index, leaving the winner's
    store unpolluted."""
    parent = str(tmp_path / "store")
    os.makedirs(parent)
    tmp = f"{parent}/.tmp_racer"
    _mkdir_with_marker(tmp, "mine")

    real_exists = fsutil.exists
    raced = {"done": False}

    def racing_exists(s, path):
        if not raced["done"] and path.endswith("sig_store_0000"):
            raced["done"] = True
            # the winner lands in the window between probe and rename
            _mkdir_with_marker(f"{parent}/sig_store_0000", "winner")
            return False
        return real_exists(s, path)

    monkeypatch.setattr(fsutil, "exists", racing_exists)
    got = fsutil.claim_versioned_dir(spark, tmp, parent, "sig_store")
    assert raced["done"], "seeding skipped the probe the race targets"
    assert got == f"{parent}/sig_store_0001"
    assert os.path.exists(f"{parent}/sig_store_0001/mine")
    # the winner's store holds only its own data — no nested leftovers
    assert os.listdir(f"{parent}/sig_store_0000") == ["winner"]
    assert not os.path.exists(tmp)


def test_append_line_and_read_text(spark, tmp_path):
    p = f"{tmp_path}/m/_metrics.jsonl"
    fsutil.append_line(spark, p, '{"a": 1}')
    fsutil.append_line(spark, p, '{"a": 2}')
    assert fsutil.read_text(spark, p) == '{"a": 1}\n{"a": 2}\n'
    # the rewrite fallback must clean up its temp (and never leave the
    # history solely in a truncated destination)
    assert not os.path.exists(f"{p}.tmp-append")


def test_claim_versioned_dir_missing_source_raises(spark, tmp_path):
    """If the source dir vanishes mid-claim (another process consumed
    it, or it never existed), the claim must raise — returning a target
    path that holds none of the caller's data would silently publish an
    empty store version."""
    import pytest

    parent = str(tmp_path / "store")
    os.makedirs(parent)
    with pytest.raises(IOError):
        fsutil.claim_versioned_dir(spark, f"{parent}/.tmp_gone", parent, "sig_store")


def test_claim_versioned_dir_never_refills_gaps(spark, tmp_path):
    """Housekeeping may delete superseded low indices; a later publish
    must land at max+1, not refill the gap — a reader handed
    sig_store_0003 earlier must never find foreign data there, and the
    seed listing (one RPC) replaces O(versions) exists() probes."""
    parent = str(tmp_path / "store")
    _mkdir_with_marker(f"{parent}/sig_store_0003", "live")
    # _0000.._0002 were deleted by housekeeping
    tmp = f"{parent}/.tmp_next"
    _mkdir_with_marker(tmp, "mine")
    got = fsutil.claim_versioned_dir(spark, tmp, parent, "sig_store")
    assert got == f"{parent}/sig_store_0004"
    assert os.path.exists(f"{parent}/sig_store_0004/mine")
