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


def kmeans_centroids(
    vectors: np.ndarray, n_centroids: int, seed: int = 11, iters: int = 10
) -> np.ndarray:
    """Deterministic Lloyd's k-means over a (sampled) vector matrix —
    driver-side; the centroid table is tiny and broadcast into the
    assignment expression."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(vectors.shape[0], size=min(n_centroids, vectors.shape[0]),
                     replace=False)
    cents = vectors[np.sort(idx)].copy()
    for _ in range(iters):
        d2 = ((vectors[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(cents.shape[0]):
            members = vectors[assign == c]
            if members.size:
                cents[c] = members.mean(axis=0)
    return cents


def ivf_assign_col(emb_col, cents: np.ndarray):
    """Nearest-centroid id as a JVM-side expression (no UDF): squared
    distances to every centroid, argmin via array_position."""
    ac = F.transform(emb_col, lambda v: v.cast("double"))
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    ac,
                    F.array(*[F.lit(float(v)) for v in c]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            for c in cents
        ]
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 11,
    sample_rows: int = 4096,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: coarse k-means quantizer, probe the ``nprobe``
    closest inverted lists, exact cosine re-score inside them.

    Scale path: the table is written partitioned by ``ivf_cell`` so a
    query's scan partition-prunes to nprobe cells (~nprobe/n_centroids of
    the data); the quantizer is trained once on a driver-side sample
    (reference counterpart: MiniBatchKMeans ANN pruning,
    ``/root/reference/search_engine/quantization.py:7-37``,
    ``inverted_index.py:1512-1519`` — rebuilt Spark-side, no sklearn).
    """
    sample = np.array(
        [
            [float(v) for v in r[emb_col]]
            for r in emb.limit(sample_rows).collect()
        ],
        dtype=np.float64,
    )
    cents = kmeans_centroids(sample, n_centroids, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(((cents - qv[None, :]) ** 2).sum(axis=1))
    probe = [int(c) for c in order[:nprobe]]
    with_cell = emb.withColumn("ivf_cell", ivf_assign_col(F.col(emb_col), cents))
    return (
        with_cell.where(F.col("ivf_cell").isin(probe))
        .select(
            F.col(id_col).alias("id"),
            cosine_to_query(F.col(emb_col), query_vec).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )


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
