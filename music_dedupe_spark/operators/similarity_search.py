"""Approximate-nearest-neighbor search over the ``embeddings`` table.

- ``ann_cosine_topk``  — brute-force cosine top-k: the correctness
  baseline. Queries are broadcast; the scan side streams; the dot
  product is native ``F.zip_with``/``F.aggregate`` (JVM, codegen) and
  the top-k is a per-query window — no Python anywhere.
- ``ann_lsh_topk``     — the scale path: random-hyperplane (SRP) LSH
  bucketing; candidates come from bucket collisions across tables,
  re-ranked exactly. At 100 TB the bucket join replaces the full cross
  product; recall is tested against the brute-force baseline.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from music_dedupe_spark.queries import _local_df, _t, register

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the benchmark query vectors


def _cosine(va, vb):
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (norm(va) * norm(vb))


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = TOP_K) -> DataFrame:
    """(query_id, neighbor_id, cos_sim, rank): exact top-k by cosine.
    ``queries`` is small -> broadcast nested-loop join; the big side is
    scanned once."""
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    e = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ev"))
    scored = (
        F.broadcast(q)
        .crossJoin(e)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim_raw", _cosine(F.col("qv"), F.col("ev")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim_raw", 4).alias("cos_sim"), "rank")
    )


@register(
    "ann_cosine_topk",
    f"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                 WHERE vec_id < {N_QUERIES}),
       scored AS (
         SELECT q.query_id, e.vec_id AS neighbor_id,
                list_cosine_similarity(q.qv, e.embedding) AS s
         FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
       ranked AS (
         SELECT query_id, neighbor_id, s,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY s DESC, neighbor_id ASC) AS rank
         FROM scored)
       SELECT query_id, neighbor_id, round(s, 4) AS cos_sim, rank
       FROM ranked WHERE rank <= {TOP_K}
       ORDER BY query_id, rank""",
)
def ann_cosine_topk(spark, sf):
    e = _t(spark, sf, "embeddings")
    return brute_force_topk(e, e.filter(F.col("vec_id") < N_QUERIES)).orderBy(
        "query_id", "rank"
    )


def srp_bucket_udf(n_planes: int = 5, seed: int = 5, n_tables: int = 16):
    # defaults tuned for weakly-clustered corpora (the driver embeddings'
    # true top-5 cosines are only ~0.25-0.5, LSH's worst case): 5 planes
    # x 16 tables scans ~10% of the corpus for ~0.7 recall. Strongly
    # similar vectors (near-dup dedup at >=0.95 cosine) sit on the steep
    # part of the s-curve and collide with high probability regardless.
    """Signed-random-projection bucket ids: ``n_tables`` independent
    hyperplane sets of ``n_planes`` bits each (multi-probe via table
    union). Vectorized: one matmul per Arrow batch."""
    rngs = [np.random.RandomState(seed + t) for t in range(n_tables)]

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            if planes is None:
                planes = [r.standard_normal((mat.shape[1], n_planes)) for r in rngs]
            buckets = []
            for t, p in enumerate(planes):
                bits = (mat @ p) > 0
                vals = bits @ (1 << np.arange(n_planes))
                buckets.append([f"{t}_{int(v)}" for v in vals])
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "buckets": [list(b) for b in zip(*buckets)]}
            )

    return compute


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = TOP_K) -> DataFrame:
    """SRP-LSH candidate generation + exact re-rank. Candidates =
    bucket collisions in any of the hash tables."""
    bucketer = srp_bucket_udf()
    eb = embeddings.select("vec_id", "embedding").mapInPandas(
        bucketer, "vec_id long, buckets array<string>"
    ).select("vec_id", F.explode("buckets").alias("bucket"))
    qb = queries.select("vec_id", "embedding").mapInPandas(
        bucketer, "vec_id long, buckets array<string>"
    ).select(F.col("vec_id").alias("query_id"), F.explode("buckets").alias("bucket"))
    cands = (
        qb.join(eb, "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    e = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ev"))
    scored = (
        cands.join(F.broadcast(q), "query_id")
        .join(e, "neighbor_id")
        .withColumn("cos_sim_raw", _cosine(F.col("qv"), F.col("ev")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim_raw", 4).alias("cos_sim"), "rank")
    )


#: Recall floor the self-asserting ANN entries enforce against the exact
#: brute-force top-k. Below the repo's 0.6 test floors on purpose: the
#: gate guards against REGRESSIONS (a broken bucketer scores ~0), not
#: tuning noise on a different corpus.
RECALL_FLOOR = 0.5


def _assert_recall(
    approx: DataFrame, embeddings: DataFrame, queries: DataFrame,
    k: int = TOP_K, floor: float = RECALL_FLOOR,
) -> DataFrame:
    """Self-asserting rows-only entry: the driver has no SQL oracle for
    the seeded ANN queries (hyperplanes/centroids aren't replayable in
    DuckDB), so the query computes its own recall against the exact
    brute-force top-k and RAISES below ``floor`` — a recall regression
    fails the driver's rows-only check loudly instead of passing as
    "rows >= 0". The query/truth sets are N_QUERIES x k rows — the
    collect is O(100), not a data path. tests/test_ann.py injects a
    broken bucketer/index to prove both entries do fail."""
    from music_dedupe_spark.queries import _assert_rows_local

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(embeddings, queries, k).collect()
    }

    # the shared helper collects the (tiny, k * N_QUERIES rows) result,
    # runs the check, and returns a LOCAL DataFrame — a persist here
    # would leak per invocation, a live plan would re-run the bucket
    # join + re-rank on the caller's own collect
    def check(rows):
        if not truth:
            # empty corpus/query set: nothing to recall — vacuously fine
            return None
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        recall = len(truth & got) / len(truth)
        if recall < floor:
            return (
                f"recall {recall:.3f} fell below the {floor} floor vs "
                "the brute-force top-k"
            )
        return None

    return _assert_rows_local(approx, check, "ANN index regressed")


@register("ann_lsh_topk", None)  # approximate: rows-only driver check (self-asserting)
def ann_lsh_topk(spark, sf):
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    out = lsh_topk(e, q).orderBy("query_id", "rank")
    return _assert_recall(out, e, q)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: the classic scale path — coarse k-means
# centroids on a driver-side sample, cluster assignment distributed,
# queries probe only the nprobe nearest cells.
# ---------------------------------------------------------------------------


def _kmeans_centroids(sample: np.ndarray, k: int, iters: int = 10, seed: int = 3) -> np.ndarray:
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        # cosine k-means: normalize, assign by dot product
        cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        sn = sample / np.linalg.norm(sample, axis=1, keepdims=True)
        assign = (sn @ cn.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_index(embeddings: DataFrame, n_cells: int = 16, sample_n: int = 2000, seed: int = 3):
    """Train coarse centroids on a driver sample (tiny: n_cells x dim
    floats broadcast), return (centroids, assigned DataFrame with a
    ``cell`` column). The assignment runs distributed in Arrow batches —
    one matmul per batch.

    The training sample is UNIFORM over the corpus: rand(seed)-ordered
    top-n (Spark compiles orderBy+limit to TakeOrderedAndProject — a
    per-partition top-n + driver merge, no full sort shuffle). A plain
    ``limit(n)`` would take the head of the first partitions and train
    centroids on one shard's distribution, collapsing recall on sorted
    corpora."""
    sample = np.array(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in embeddings.select("embedding")
            .orderBy(F.rand(seed))
            .limit(sample_n)
            .collect()
        ]
    )
    centroids = _kmeans_centroids(sample, n_cells, seed=seed)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell": (mat @ cn.T).argmax(axis=1).astype("int32")}
            )

    assigned = embeddings.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, cell int"
    )
    return centroids, assigned


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF search: queries probe their nprobe nearest cells; candidates
    are the vectors in those cells (cell equi-join — the 100 TB path:
    scan fraction ~ nprobe/n_cells); exact cosine re-rank on top."""
    spark = embeddings.sparkSession
    centroids, assigned = ivf_index(embeddings, n_cells=n_cells)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    qrows = queries.select("vec_id", "embedding").collect()  # queries are small
    probe_rows = []
    for r in qrows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v / np.linalg.norm(v)
        cells = np.argsort(-(cn @ v))[:nprobe]
        probe_rows.extend((int(r["vec_id"]), int(c)) for c in cells)
    # one-slice local frame (see queries._local_df: the list path's 32
    # pickled slices cost a Python-worker round-trip per slice downstream)
    probes = _local_df(spark, probe_rows, "query_id long, cell int")

    cands = (
        F.broadcast(probes)
        .join(assigned, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    e = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ev"))
    scored = (
        cands.join(F.broadcast(q), "query_id")
        .join(e, "neighbor_id")
        .withColumn("cos_sim_raw", _cosine(F.col("qv"), F.col("ev")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim_raw", 4).alias("cos_sim"), "rank")
    )


@register("ann_ivf_topk", None)  # approximate: rows-only driver check (self-asserting)
def ann_ivf_topk(spark, sf):
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    out = ivf_topk(e, q).orderBy("query_id", "rank")
    return _assert_recall(out, e, q)
