"""Large-star/small-star connected components vs a union-find oracle,
plus the north rule's checkpoint/resume requirement."""

import random

import pytest
from pyspark.sql import functions as F

from music_dedupe_spark.operators.clustering import connected_components, latest_checkpoint


def _uf_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def _random_edges(seed, n_nodes=300, n_edges=400):
    rng = random.Random(seed)
    return [
        (f"n{rng.randrange(n_nodes):04d}", f"n{rng.randrange(n_nodes):04d}")
        for _ in range(n_edges)
    ]


@pytest.mark.parametrize("seed", [1, 2])
def test_cc_matches_union_find(spark, seed):
    edges = [e for e in _random_edges(seed) if e[0] != e[1]]
    want = _uf_components(edges)
    df = spark.createDataFrame(edges, "left_id string, right_id string")
    got = {
        r["member_id"]: r["entity_id"] for r in connected_components(df).collect()
    }
    assert got == want


def test_cc_long_chain(spark):
    # path graph: worst case for naive propagation; star algorithm must
    # converge to a single min-rooted component
    edges = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(64)]
    df = spark.createDataFrame(edges, "left_id string, right_id string")
    got = {r["member_id"]: r["entity_id"] for r in connected_components(df).collect()}
    assert set(got.values()) == {"c000"}
    assert len(got) == 65


def test_cc_idempotent_fixpoint(spark):
    # FIXTURES.md §5.4: clustering the cluster output is a fixpoint
    edges = [e for e in _random_edges(3) if e[0] != e[1]]
    df = spark.createDataFrame(edges, "left_id string, right_id string")
    first = connected_components(df)
    again = connected_components(
        first.select(
            F.col("member_id").alias("left_id"), F.col("entity_id").alias("right_id")
        ).filter(F.col("left_id") != F.col("right_id"))
    )
    a = {(r["member_id"], r["entity_id"]) for r in first.collect() if r["member_id"] != r["entity_id"]}
    b = {(r["member_id"], r["entity_id"]) for r in again.collect() if r["member_id"] != r["entity_id"]}
    assert a == b


def test_cc_checkpoint_retention(spark, tmp_path):
    """A converged run keeps ONLY the fixpoint snapshot (older iter_*
    dirs expire — each is a full edge-list copy, and across runs they
    accumulate without bound at scale), and resuming from the retained
    snapshot reproduces the same clusters."""
    import os

    edges = [e for e in _random_edges(5) if e[0] != e[1]]
    df = spark.createDataFrame(edges, "left_id string, right_id string")
    ckpt = str(tmp_path / "cc")
    want = {
        r["member_id"]: r["entity_id"]
        for r in connected_components(df, checkpoint_dir=ckpt).collect()
    }
    iters = [n for n in os.listdir(ckpt) if n.startswith("iter_")]
    assert len(iters) == 1, f"expected only the fixpoint snapshot, got {sorted(iters)}"
    resumed = connected_components(df, checkpoint_dir=ckpt, resume=True)
    got = {r["member_id"]: r["entity_id"] for r in resumed.collect()}
    assert got == want


def test_cc_checkpoint_file_uri(spark, tmp_path):
    """Checkpoint/resume/retention/metrics through an explicit file://
    URI — the helpers must go through the Hadoop FileSystem of the
    checkpoint dir's scheme (a driver-local os.path probe would see
    "absent" for every remote URI: resume would silently restart from
    scratch and retention would never delete anything)."""
    import os

    edges = [e for e in _random_edges(6) if e[0] != e[1]]
    df = spark.createDataFrame(edges, "left_id string, right_id string")
    ckpt = f"file://{tmp_path}/cc"
    want = {
        r["member_id"]: r["entity_id"]
        for r in connected_components(df, checkpoint_dir=ckpt).collect()
    }
    local = tmp_path / "cc"
    iters = [n for n in os.listdir(local) if n.startswith("iter_")]
    assert len(iters) == 1  # retention ran through the file:// FS
    assert (local / "_metrics.jsonl").exists()  # metrics too
    assert latest_checkpoint(ckpt, spark) is not None
    resumed = connected_components(df, checkpoint_dir=ckpt, resume=True)
    got = {r["member_id"]: r["entity_id"] for r in resumed.collect()}
    assert got == want


def test_cc_retention_expires_stale_higher_indices(spark, tmp_path):
    """A reused checkpoint dir may hold HIGHER-indexed snapshots from a
    previous longer run; retention must expire those too, else
    latest_checkpoint (max index) resumes a later run from a stale edge
    list while the fresh fixpoint gets deleted."""
    import os

    ckpt = str(tmp_path / "cc")
    # leftover of a previous, longer run: a bogus complete snapshot at
    # a high index whose edges belong to a DIFFERENT graph
    stale = spark.createDataFrame(
        [("zz1", "zz2")], "u string, v string"
    )
    stale.write.parquet(f"{ckpt}/iter_0007")
    edges = [e for e in _random_edges(8) if e[0] != e[1]]
    df = spark.createDataFrame(edges, "left_id string, right_id string")
    want = {
        r["member_id"]: r["entity_id"]
        for r in connected_components(df, checkpoint_dir=ckpt).collect()
    }
    iters = sorted(n for n in os.listdir(ckpt) if n.startswith("iter_"))
    assert len(iters) == 1 and iters[0] != "iter_0007", iters
    resumed = connected_components(df, checkpoint_dir=ckpt, resume=True)
    got = {r["member_id"]: r["entity_id"] for r in resumed.collect()}
    assert got == want


def test_cc_fresh_run_clears_stale_snapshots_even_on_budget_raise(spark, tmp_path):
    """The non-converged path advises 'resume with a larger budget' —
    that resume must not find a stale higher-indexed snapshot from a
    previous run in a reused dir (latest_checkpoint takes the max
    index). A fresh run therefore clears inherited iter_* up front,
    so even after a budget RuntimeError the dir holds only THIS run's
    partial state."""
    import os

    ckpt = str(tmp_path / "cc")
    spark.createDataFrame([("zz1", "zz2")], "u string, v string").write.parquet(
        f"{ckpt}/iter_0007"
    )
    edges = [e for e in _random_edges(9, n_nodes=200, n_edges=250) if e[0] != e[1]]
    df = spark.createDataFrame(edges, "left_id string, right_id string")
    want = {r["member_id"]: r["entity_id"] for r in connected_components(df).collect()}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, checkpoint_dir=ckpt, max_iterations=1)
    iters = sorted(n for n in os.listdir(ckpt) if n.startswith("iter_"))
    assert "iter_0007" not in iters, iters
    assert latest_checkpoint(ckpt, spark) == 0
    resumed = connected_components(df, checkpoint_dir=ckpt, resume=True)
    got = {r["member_id"]: r["entity_id"] for r in resumed.collect()}
    assert got == want


def test_cc_chained_runs_do_not_invalidate_prior_assignment(spark, tmp_path):
    """The returned assignment is a lazy read of a per-run parquet dir;
    a later run sharing the checkpoint dir (chained incremental folds)
    must not clobber the files a previously returned assignment still
    reads from."""
    ckpt = str(tmp_path / "cc")
    e1 = spark.createDataFrame([("a1", "a2"), ("a2", "a3")], "left_id string, right_id string")
    e2 = spark.createDataFrame([("b1", "b2")], "left_id string, right_id string")
    first = connected_components(e1, checkpoint_dir=ckpt)
    want_first = {(r["member_id"], r["entity_id"]) for r in first.collect()}
    second = connected_components(e2, checkpoint_dir=ckpt)
    assert {(r["member_id"], r["entity_id"]) for r in second.collect()} == {
        ("b1", "b1"), ("b2", "b1")
    }
    # the first assignment is still fully readable after the second run
    assert {(r["member_id"], r["entity_id"]) for r in first.collect()} == want_first


def test_cc_checkpoint_resume(spark, tmp_path):
    # kill the loop after one iteration; resume must produce identical
    # clusters (FIXTURES.md §5.6, north rule resumability)
    edges = [e for e in _random_edges(4, n_nodes=200, n_edges=250) if e[0] != e[1]]
    df = spark.createDataFrame(edges, "left_id string, right_id string")
    want = {r["member_id"]: r["entity_id"] for r in connected_components(df).collect()}

    ckpt = str(tmp_path / "cc")
    # an exhausted iteration budget fails LOUDLY (exhaustion is not
    # convergence) — but the partial checkpoint survives for resume
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, checkpoint_dir=ckpt, max_iterations=1)
    assert latest_checkpoint(ckpt) == 0  # partial run persisted
    resumed = connected_components(df, checkpoint_dir=ckpt, resume=True)
    got = {r["member_id"]: r["entity_id"] for r in resumed.collect()}
    assert got == want
    # metrics lineage rows were written per iteration
    assert (tmp_path / "cc" / "_metrics.jsonl").exists()


def test_expire_assignments_keeps_latest(spark, tmp_path):
    """assignment_<uuid> dirs accumulate one per CC call (unique names
    so chained folds never clobber a live reader); the explicit
    expire_assignments maintenance call reclaims all but the newest K,
    and the surviving assignment stays readable."""
    import time

    from music_dedupe_spark.operators.clustering import expire_assignments

    ckpt = str(tmp_path / "cc_assign")
    df = spark.createDataFrame([("a", "b")], "left_id string, right_id string")
    connected_components(df, checkpoint_dir=ckpt)
    time.sleep(1.1)  # local-FS mtime granularity can be 1s
    latest = connected_components(df, checkpoint_dir=ckpt)
    from music_dedupe_spark import fsutil

    names = [n for n in fsutil.list_names(spark, ckpt) if n.startswith("assignment_")]
    assert len(names) == 2
    dropped = expire_assignments(spark, ckpt, keep_latest=1)
    assert len(dropped) == 1
    left = [n for n in fsutil.list_names(spark, ckpt) if n.startswith("assignment_")]
    assert len(left) == 1 and left[0] not in dropped
    # the kept (newest) assignment is the one the last call returned
    assert latest.count() == 2
