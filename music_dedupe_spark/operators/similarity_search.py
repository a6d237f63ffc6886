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

from music_dedupe_spark.queries import _t, register

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


def srp_bucket_udf(n_planes: int = 12, seed: int = 5, n_tables: int = 4):
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


@register("ann_lsh_topk", None)  # approximate: rows-only driver check
def ann_lsh_topk(spark, sf):
    e = _t(spark, sf, "embeddings")
    return lsh_topk(e, e.filter(F.col("vec_id") < N_QUERIES)).orderBy("query_id", "rank")
