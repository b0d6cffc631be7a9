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

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
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
    """Sign-bit bucket id from dot products with fixed hyperplanes — the
    JVM-expression specification of the bucket function (the DuckDB
    contract oracle is derived from it).  ``LshIndex.build`` uses the
    bit-identical in-batch numpy twin (`_assign_mapper`) instead: Catalyst
    re-evaluates shared subtrees of large higher-order expressions per
    element (see pipeline/embeddings.py)."""
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
    distances to every centroid, argmin via array_position.  Expression
    specification only — ``IvfIndex.build`` assigns cells with the
    bit-identical numpy twin (`_assign_mapper`); this form evaluates the
    whole distance array twice (array_min + array_position)."""
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


def seq_dot(a: np.ndarray, b: np.ndarray) -> float:
    """Strict left-to-right float64 accumulation — the summation order both
    engines use for the row-side bucket expressions (Spark ``F.aggregate``,
    DuckDB ``list_reduce``).  Driver-side sign decisions must use the same
    order so a query vector that is also a table row lands in its own
    bucket."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def lsh_query_bits(planes: np.ndarray, query_vec: list[float]) -> int:
    qv = np.asarray(query_vec, dtype=np.float64)
    qbits = 0
    for i, p in enumerate(planes):
        if seq_dot(p, qv) > 0:
            qbits |= 1 << i
    return qbits


def lsh_probe_buckets(
    planes: np.ndarray, query_vec: list[float], probe_hamming: int = 1
) -> list[int]:
    """Query bucket plus all buckets within ``probe_hamming`` bit flips."""
    n_planes = planes.shape[0]
    qbits = lsh_query_bits(planes, query_vec)
    probe = {qbits}
    if probe_hamming >= 1:
        probe.update(qbits ^ (1 << i) for i in range(n_planes))
    if probe_hamming >= 2:
        probe.update(
            qbits ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        )
    return sorted(probe)


def _assign_mapper(consts: np.ndarray, kind: str, emb_col: str, out_col: str):
    """mapInPandas assigner: bucket (LSH sign bits) or cell (IVF argmin)
    computed vectorized over rows with strict left-to-right accumulation
    over dimensions — bit-identical to the DuckDB oracle's ``list_reduce``
    and to the JVM expression twins (`lsh_bucket_col`/`ivf_assign_col`),
    but one numpy pass per Arrow batch instead of a Catalyst expression
    that re-evaluates shared subtrees per element (see
    pipeline/embeddings.py for the measured blowup)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(
                [list(v) for v in pdf[emb_col]], dtype=np.float64
            )
            if kind == "lsh":
                out = np.zeros(mat.shape[0], dtype=np.int64)
                for i, p in enumerate(consts):
                    acc = np.zeros(mat.shape[0])
                    for j in range(mat.shape[1]):
                        acc += mat[:, j] * p[j]
                    out |= (acc > 0).astype(np.int64) << i
            else:  # ivf: first argmin over sequential squared distances
                dists = np.empty((mat.shape[0], consts.shape[0]))
                for c, cent in enumerate(consts):
                    acc = np.zeros(mat.shape[0])
                    for j in range(mat.shape[1]):
                        d = mat[:, j] - cent[j]
                        acc += d * d
                    dists[:, c] = acc
                out = dists.argmin(axis=1).astype(np.int64)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return run


def _with_assignment(
    emb: DataFrame, consts: np.ndarray, kind: str, emb_col: str, out_col: str
) -> DataFrame:
    from pyspark.sql import types as T

    schema = T.StructType(
        list(emb.schema.fields) + [T.StructField(out_col, T.LongType())]
    )
    return emb.mapInPandas(
        _assign_mapper(consts, kind, emb_col, out_col), schema
    )


def _rescored_topk(
    table: DataFrame, query_vec: list[float], k: int, id_col: str,
    emb_col: str,
) -> DataFrame:
    return (
        table.select(
            F.col(id_col).alias("id"),
            cosine_to_query(F.col(emb_col), query_vec).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )


class _MutableAnn:
    """Vector deletion for the materialized ANN indexes — the companion
    of the inverted index's tombstone path, so a deleted or superseded
    document disappears from ANN probes the same way it disappears from
    BM25 retrieval (the engine's ``semantic_search`` additionally
    anti-joins ITS tombstones; this handles standalone index usage and
    physical cleanup).

    ``delete`` appends id tombstones beside the table (O(deletes), the
    bucket/cell partitions are untouched); ``topk`` anti-joins them
    broadcast-style after the partition-pruned scan (tombstones are tiny
    relative to the table); ``compact`` rewrites the table without the
    victims — partition layout preserved, written to a staging dir and
    swapped in, tombstones retired."""

    # provided by subclasses
    spark: SparkSession
    path: str
    id_col: str
    _part_col: str

    def _tomb_dir(self) -> str:
        return os.path.join(self.path, "tombstones")

    def read_tombstones(self) -> DataFrame | None:
        p = self._tomb_dir()
        if not os.path.isdir(p) or not any(
            f.endswith(".parquet") for f in os.listdir(p)
        ):
            return None
        return self.spark.read.parquet(p).select(self.id_col).distinct()

    def delete(self, ids) -> int:
        """Tombstone vectors by id.  ``ids``: a DataFrame carrying
        ``id_col``, or an iterable of ids.  Returns the number of NEW
        tombstones written (already-deleted ids are skipped, so repeated
        deletes stay idempotent)."""
        if not isinstance(ids, DataFrame):
            ids = self.spark.createDataFrame(
                [(int(i),) for i in ids], f"{self.id_col} long"
            )
        ids = ids.select(self.id_col).distinct()
        existing = self.read_tombstones()
        if existing is not None:
            ids = ids.join(existing, self.id_col, "left_anti")
        n = ids.count()
        if n:
            ids.write.mode("append").parquet(self._tomb_dir())
        return n

    def _live(self, df: DataFrame) -> DataFrame:
        tomb = self.read_tombstones()
        if tomb is None:
            return df
        return df.join(F.broadcast(tomb), self.id_col, "left_anti")

    def _recover_swap(self) -> None:
        """Finish a compaction swap a crash interrupted.  SINGLE WRITER,
        no concurrent readers during compaction — same contract as the
        inverted index's builder mutations; a probe running while the
        table dirs are renamed can hit a missing path."""
        import shutil

        table_dir = os.path.join(self.path, "table")
        staging = os.path.join(self.path, "table_compacting")
        old = os.path.join(self.path, "table_retired")
        if not os.path.isdir(table_dir) and os.path.isdir(staging):
            # crashed between the two renames: the staged (compacted)
            # copy is complete — promote it
            os.rename(staging, table_dir)
        if os.path.isdir(table_dir):
            # with a live table, leftover dirs are retryable garbage:
            # the retired pre-compaction copy (kept until the new table
            # is verified in place) and any crashed pre-swap staging
            shutil.rmtree(old, ignore_errors=True)
            shutil.rmtree(staging, ignore_errors=True)

    def compact(self) -> dict:
        """Physically drop tombstoned vectors: rewrite the table minus
        the victims into a staging dir (same partition column, so probes
        keep their pruning), swap it in, retire the tombstones.  The
        retired copy is deleted LAST, only after the new table is in
        place, so a crash at any point leaves a recoverable layout
        (:meth:`_recover_swap` runs on open and on the next compact).
        Single writer, no concurrent readers during the swap."""
        import shutil

        self._recover_swap()
        tomb = self.read_tombstones()
        if tomb is None:
            return {"purged": 0}
        n = tomb.count()
        table_dir = os.path.join(self.path, "table")
        staging = os.path.join(self.path, "table_compacting")
        shutil.rmtree(staging, ignore_errors=True)
        (
            self._live(self.spark.read.parquet(table_dir))
            .write.mode("overwrite")
            .partitionBy(self._part_col)
            .parquet(staging)
        )
        old = os.path.join(self.path, "table_retired")
        shutil.rmtree(old, ignore_errors=True)
        os.rename(table_dir, old)
        os.rename(staging, table_dir)
        # tombstones first: if we crash here they re-apply as a no-op
        # anti-join against the already-purged table
        shutil.rmtree(self._tomb_dir())
        # the retired copy goes only once the new table is in place
        shutil.rmtree(old)
        return {"purged": n}


class LshIndex(_MutableAnn):
    """Materialized random-hyperplane LSH ANN index.

    ``build`` writes the embedding table **partitioned by sign-bucket** and
    persists the hyperplanes beside it; ``topk`` reads back with a
    ``bucket IN (probe)`` filter that prunes the scan to the probed
    partitions — at 10^12 rows a query touches ~(1+n_planes)/2^n_planes of
    the data, no full-table bucket recomputation (the round-1 version
    computed buckets per query, which re-scanned everything).

    Reference counterpart: ANN candidate pruning ahead of exact re-scoring
    (``/root/reference/search_engine/inverted_index.py:1512-1519``) —
    rebuilt as a partition-pruned parquet layout instead of an in-memory
    mask.
    """

    _part_col = "bucket"

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta
        self.planes = np.asarray(meta["planes"], dtype=np.float64)
        self.id_col = meta["id_col"]
        self.emb_col = meta["emb_col"]

    @classmethod
    def build(
        cls,
        emb: DataFrame,
        path: str,
        n_planes: int = 4,
        seed: int = 11,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
    ) -> "LshIndex":
        spark = emb.sparkSession
        dim = int(emb.select(F.size(emb_col)).head()[0])
        planes = hyperplanes(dim, n_planes, seed)
        (
            _with_assignment(emb, planes, "lsh", emb_col, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(path, "table"))
        )
        meta = {
            "kind": "lsh",
            "dim": dim,
            "n_planes": n_planes,
            "seed": seed,
            "id_col": id_col,
            "emb_col": emb_col,
            "planes": [[float(v) for v in p] for p in planes],
        }
        with open(os.path.join(path, "ann_meta.json"), "w") as f:
            json.dump(meta, f)
        return cls(spark, path, meta)

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "LshIndex":
        with open(os.path.join(path, "ann_meta.json")) as f:
            meta = json.load(f)
        if meta.get("kind") != "lsh":  # pragma: no cover
            raise ValueError(f"{path} is not an LSH index")
        idx = cls(spark, path, meta)
        idx._recover_swap()
        return idx

    def table(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "table"))

    def append(self, emb: DataFrame) -> None:
        """Fold newly arrived embeddings into the index: assignment with
        the PERSISTED hyperplanes, appended into the existing bucket
        partitions — O(increment), no rebuild, probes see old+new rows
        (the streaming-ingest companion for the ANN side)."""
        (
            _with_assignment(emb, self.planes, "lsh", self.emb_col, "bucket")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(os.path.join(self.path, "table"))
        )

    def topk(
        self, query_vec: list[float], k: int = 10, probe_hamming: int = 1
    ) -> DataFrame:
        probe = lsh_probe_buckets(self.planes, query_vec, probe_hamming)
        pruned = self._live(self.table().where(F.col("bucket").isin(probe)))
        return _rescored_topk(pruned, query_vec, k, self.id_col, self.emb_col)


class IvfIndex(_MutableAnn):
    """Materialized IVF ANN index: coarse k-means quantizer trained ONCE at
    build time on a deterministic sample (first ``sample_rows`` ids —
    ``orderBy(id)`` so the sample, hence the centroids, hence the results,
    are stable across partitionings), table written partitioned by
    ``ivf_cell``, centroids persisted beside it.  ``topk`` probes the
    ``nprobe`` closest cells with a partition-pruned scan and re-scores
    exactly (reference counterpart: MiniBatchKMeans ANN pruning,
    ``/root/reference/quantization.py:7-37``,
    ``inverted_index.py:1512-1519`` — no sklearn, no per-query retraining).
    """

    _part_col = "ivf_cell"

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta
        self.centroids = np.asarray(meta["centroids"], dtype=np.float64)
        self.id_col = meta["id_col"]
        self.emb_col = meta["emb_col"]

    @classmethod
    def build(
        cls,
        emb: DataFrame,
        path: str,
        n_centroids: int = 16,
        seed: int = 11,
        sample_rows: int = 4096,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
    ) -> "IvfIndex":
        spark = emb.sparkSession
        sample = np.array(
            [
                [float(v) for v in r[emb_col]]
                for r in emb.orderBy(id_col).limit(sample_rows).collect()
            ],
            dtype=np.float64,
        )
        cents = kmeans_centroids(sample, n_centroids, seed)
        (
            _with_assignment(emb, cents, "ivf", emb_col, "ivf_cell")
            .write.mode("overwrite")
            .partitionBy("ivf_cell")
            .parquet(os.path.join(path, "table"))
        )
        meta = {
            "kind": "ivf",
            "n_centroids": int(cents.shape[0]),
            "seed": seed,
            "sample_rows": sample_rows,
            "id_col": id_col,
            "emb_col": emb_col,
            "centroids": [[float(v) for v in c] for c in cents],
        }
        with open(os.path.join(path, "ann_meta.json"), "w") as f:
            json.dump(meta, f)
        return cls(spark, path, meta)

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "IvfIndex":
        with open(os.path.join(path, "ann_meta.json")) as f:
            meta = json.load(f)
        if meta.get("kind") != "ivf":  # pragma: no cover
            raise ValueError(f"{path} is not an IVF index")
        idx = cls(spark, path, meta)
        idx._recover_swap()
        return idx

    def table(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "table"))

    def append(self, emb: DataFrame) -> None:
        """Assign new embeddings to the FROZEN centroids and append into
        the existing cell partitions — O(increment).  The quantizer is
        not retrained (retraining would reshuffle every existing row's
        cell); rebuild periodically if the data distribution drifts."""
        (
            _with_assignment(emb, self.centroids, "ivf", self.emb_col,
                             "ivf_cell")
            .write.mode("append")
            .partitionBy("ivf_cell")
            .parquet(os.path.join(self.path, "table"))
        )

    def probe_cells(self, query_vec: list[float], nprobe: int = 4) -> list[int]:
        qv = np.asarray(query_vec, dtype=np.float64)
        order = np.argsort(((self.centroids - qv[None, :]) ** 2).sum(axis=1))
        return [int(c) for c in order[:nprobe]]

    def topk(
        self, query_vec: list[float], k: int = 10, nprobe: int = 4
    ) -> DataFrame:
        probe = self.probe_cells(query_vec, nprobe)
        pruned = self._live(
            self.table().where(F.col("ivf_cell").isin(probe))
        )
        return _rescored_topk(pruned, query_vec, k, self.id_col, self.emb_col)


def lsh_topk(
    index: LshIndex,
    query_vec: list[float],
    k: int = 10,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k over a **materialized** LSH index (partition-pruned
    scan of the probed buckets, exact cosine re-score)."""
    return index.topk(query_vec, k, probe_hamming)


def ivf_topk(
    index: IvfIndex,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k over a **materialized** IVF index (partition-pruned
    scan of the probed cells, exact cosine re-score)."""
    return index.topk(query_vec, k, nprobe)
