"""Embedding similarity search: brute-force cosine top-k (exact baseline)
and random-hyperplane LSH bucketing (the scale path).

Embeddings are ``array<float>`` columns; all arithmetic is JVM-side
higher-order functions in double precision (summed left-to-right by
``F.aggregate``, which the DuckDB oracle mirrors with ``list_reduce``
ordering).  The LSH variant prunes candidates to the query's hyperplane
sign-bucket (plus Hamming-1 neighbor buckets) before exact re-scoring —
at 10^12 rows the bucket column is the partition key, so a query touches
``nprobe`` buckets instead of the full table.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_to_query(emb_col, query_vec: list[float]):
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    ac = F.transform(emb_col, lambda v: v.cast("double"))
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    return _dot(ac, q) / (_norm(ac) * F.lit(qn))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k -> (id, cos).  One scan, global
    TakeOrderedAndProject."""
    return (
        emb.select(
            F.col(id_col).alias("id"),
            cosine_to_query(F.col(emb_col), query_vec).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(emb_col, planes: np.ndarray):
    """Sign-bit bucket id from dot products with fixed hyperplanes."""
    bucket = F.lit(0)
    ac = F.transform(emb_col, lambda v: v.cast("double"))
    for i, p in enumerate(planes):
        d = _dot(ac, F.array(*[F.lit(float(v)) for v in p]))
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 4,
    seed: int = 11,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates from the query's LSH bucket (plus
    buckets within ``probe_hamming`` bit flips), exact cosine re-score.

    At scale the table is written partitioned by ``bucket``; the IN filter
    below partition-prunes the scan to the probed buckets.
    """
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbits = 0
    for i, p in enumerate(planes):
        if float(np.dot(p, qv)) > 0:
            qbits |= 1 << i
    probe = {qbits}
    if probe_hamming >= 1:
        probe.update(qbits ^ (1 << i) for i in range(n_planes))
    if probe_hamming >= 2:
        probe.update(
            qbits ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        )
    with_bucket = emb.withColumn(
        "bucket", lsh_bucket_col(F.col(emb_col), planes)
    )
    return (
        with_bucket.where(F.col("bucket").isin(sorted(probe)))
        .select(
            F.col(id_col).alias("id"),
            cosine_to_query(F.col(emb_col), query_vec).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )
