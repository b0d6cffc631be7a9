"""Index table layout + lineage-gated readers.

Layout under ``<index_dir>/``  (parquet everywhere; an Iceberg runtime is
not available in this environment, so snapshot semantics are provided by
the ``lineage`` table: a batch's data files are only visible once its
lineage row is committed — readers resolve the committed batch list first
and read only those paths, which is the same commit protocol an Iceberg
manifest would give us):

``meta.json``    layout params pinned at build time (chunk_docs, buckets,
                 tokenizer, ...) — queries always read these, never trust
                 caller config
``docs/``        doc_id, repo, path, commit, lang, sha256
``doclens/batch=K/``  chunk_id, n_docs, doc_ids(bin), doc_lens(bin),
    title_lens(bin) — copied from the reserved-term "" rows the posting
    merge emits (single tokenize pass; build/kernels.py)
``postings/batch=K/bucket=B/``  term, chunk_id, df, doc_ids(bin),
    tfs_body(bin), tfs_title(bin), pos_body(bin), pos_title(bin),
    blk_last_doc(bin), blk_max_tfb(bin), blk_max_tft(bin),
    blk_min_dl(bin), blk_min_tl(bin)
``term_stats/bucket=B/``  term, df, n_chunks   (finalize artifact)
``stats/``       num_docs, avg_doc_len, avg_title_len, max_doc_len,
                 max_title_len, total_postings
``lineage/``     batch_id, first_chunk, last_chunk, n_docs, n_postings,
                 n_rows_out, bytes_postings, wall_sec, input_fingerprint,
                 engine_version

All binary columns are delta+varbyte (``functions/codec.py``).  The
reference keeps the same information in packed binary files + a marisa
trie + pickles (``/root/reference/search_engine/ingestion.py:63-171``,
``convert_index_to_marisa.py``); here the term dictionary is replaced by
hash-bucket partition pruning + parquet min/max + bloom filters on
``term``.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.config import EngineConfig

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("chunk_id", T.LongType(), False),
        T.StructField("df", T.IntegerType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("tfs_body", T.BinaryType(), False),
        T.StructField("tfs_title", T.BinaryType(), False),
        T.StructField("pos_body", T.BinaryType(), False),
        T.StructField("pos_title", T.BinaryType(), False),
        T.StructField("blk_last_doc", T.BinaryType(), False),
        T.StructField("blk_max_tfb", T.BinaryType(), False),
        T.StructField("blk_max_tft", T.BinaryType(), False),
        T.StructField("blk_min_dl", T.BinaryType(), False),
        T.StructField("blk_min_tl", T.BinaryType(), False),
        T.StructField("bucket", T.IntegerType(), False),
    ]
)

PARTIALS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("chunk_id", T.LongType(), False),
        T.StructField("doc_ids", T.ArrayType(T.LongType()), False),
        T.StructField("tfs_body", T.ArrayType(T.IntegerType()), False),
        T.StructField("tfs_title", T.ArrayType(T.IntegerType()), False),
        T.StructField("pos_body", T.ArrayType(T.IntegerType()), False),
        T.StructField("pos_title", T.ArrayType(T.IntegerType()), False),
        T.StructField("doc_lens", T.ArrayType(T.IntegerType()), False),
        T.StructField("title_lens", T.ArrayType(T.IntegerType()), False),
    ]
)

DOCLENS_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("doc_lens", T.BinaryType(), False),
        T.StructField("title_lens", T.BinaryType(), False),
    ]
)


# layout fields baked into a built index — queries MUST use the builder's
# values (a bucket-count mismatch silently empties every term lookup)
LAYOUT_FIELDS = (
    "chunk_docs", "block_docs", "n_term_buckets", "chunks_per_batch",
    "tokenizer",
)


class IndexStore:
    def __init__(self, spark: SparkSession, index_dir: str, config: EngineConfig):
        self.spark = spark
        self.dir = Path(index_dir)
        self.config = config

    # ----- layout metadata -----
    @property
    def meta_path(self) -> str:
        return str(self.dir / "meta.json")

    def write_meta(self) -> None:
        import json

        self.dir.mkdir(parents=True, exist_ok=True)
        meta = {f: getattr(self.config, f) for f in LAYOUT_FIELDS}
        meta["engine_version"] = "0.1.0"
        with open(self.meta_path, "w") as fh:
            json.dump(meta, fh)

    def load_meta_into_config(self) -> EngineConfig:
        """Returns the config with layout fields replaced by the values the
        index was built with (no-op if no meta file)."""
        import dataclasses
        import json

        if not os.path.exists(self.meta_path):
            return self.config
        with open(self.meta_path) as fh:
            meta = json.load(fh)
        overrides = {f: meta[f] for f in LAYOUT_FIELDS if f in meta}
        self.config = dataclasses.replace(self.config, **overrides)
        return self.config

    # ----- paths -----
    @property
    def docs_path(self) -> str:
        return str(self.dir / "docs")

    @property
    def stats_path(self) -> str:
        return str(self.dir / "stats")

    @property
    def term_stats_path(self) -> str:
        return str(self.dir / "term_stats")

    @property
    def lineage_path(self) -> str:
        return str(self.dir / "lineage")

    def postings_batch_path(self, batch_id: int) -> str:
        return str(self.dir / "postings" / f"batch={batch_id}")

    def doclens_batch_path(self, batch_id: int) -> str:
        return str(self.dir / "doclens" / f"batch={batch_id}")

    @property
    def tombstones_path(self) -> str:
        return str(self.dir / "tombstones")

    @property
    def pending_finalize_path(self) -> str:
        """Marker written by a purging ``compact()`` before its lineage
        commit and removed after ``finalize()`` — present on disk only
        when a crash left purged postings visible with stale pre-purge
        collection stats (BM25 would be silently wrong)."""
        return str(self.dir / "_finalize_pending")

    def read_tombstones(self) -> DataFrame | None:
        """Deleted doc ids (deduplicated), or None when no deletions are
        pending.  Tombstones are LOGICAL deletes: query kernels exclude
        these ids (post-hoc-restriction semantics — collection stats keep
        counting them) until ``IndexBuilder.compact()`` physically purges
        them and recomputes stats (Lucene/Iceberg delete-file
        semantics)."""
        if not os.path.isdir(self.tombstones_path):
            return None
        return (
            self.spark.read.parquet(self.tombstones_path)
            .select(F.col("doc_id").cast("long"))
            .distinct()
        )

    # ----- lineage-gated reads -----
    def read_lineage(self) -> DataFrame:
        """All lineage rows; ``mergeSchema`` because compaction rows carry
        an extra ``replaces`` column older rows lack."""
        return self.spark.read.option("mergeSchema", "true").parquet(
            self.lineage_path
        )

    def lineage_rows_meta(self, columns: list[str]) -> list[dict]:
        """Lineage rows read DRIVER-SIDE with pyarrow (per-fragment, so
        the mixed schema — compaction rows carry ``replaces``, plain
        batch rows don't — needs no mergeSchema pass).  The lineage
        table is O(#batches) tiny rows but is consulted by every engine
        open and every streaming advance; bookkeeping this small must
        not pay a Spark job per read.  Local-filesystem layout (the
        sandbox + spark-submit driver); a remote object store would pass
        a pyarrow filesystem here."""
        import pyarrow.dataset as pads

        out: list[dict] = []
        if not os.path.isdir(self.lineage_path):
            return out
        d = pads.dataset(self.lineage_path, format="parquet")
        for frag in d.get_fragments():
            names = set(frag.physical_schema.names)
            cols = [c for c in columns if c in names]
            t = frag.to_table(columns=cols)
            for i in range(t.num_rows):
                row = {c: t[c][i].as_py() for c in cols}
                for c in columns:
                    row.setdefault(c, None)
                out.append(row)
        return out

    def committed_batches(self) -> list[int]:
        """Visible batches = all lineage rows minus any batch some row's
        ``replaces`` list names (the compaction commit protocol: one
        appended row atomically supersedes the batches it rewrote —
        Iceberg's snapshot semantics on the same append-only commit point
        ``IndexBuilder._run_batch`` uses).  Driver-side metadata read —
        no Spark job."""
        rows = self.lineage_rows_meta(["batch_id", "replaces"])
        replaced: set[int] = set()
        for r in rows:
            if r["replaces"]:
                replaced.update(r["replaces"])
        return sorted(
            r["batch_id"] for r in rows if r["batch_id"] not in replaced
        )

    def read_lineage_committed(self) -> DataFrame:
        """Lineage rows of visible batches only — metric sums (n_docs,
        n_postings) over this frame stay correct across compactions
        (a compaction row carries the sums of the rows it replaced)."""
        committed = self.committed_batches()
        return self.read_lineage().where(F.col("batch_id").isin(committed))

    def read_postings(self, batches: list[int] | None = None) -> DataFrame:
        if batches is None:
            batches = self.committed_batches()
        paths = [self.postings_batch_path(b) for b in batches]
        # basePath keeps the bucket partition column; batch dir itself is
        # not a column (constant per path)
        return self.spark.read.option("basePath", str(self.dir / "postings")).parquet(
            *paths
        ).drop("batch")

    def read_doclens(self, batches: list[int] | None = None) -> DataFrame:
        if batches is None:
            batches = self.committed_batches()
        paths = [self.doclens_batch_path(b) for b in batches]
        return self.spark.read.option("basePath", str(self.dir / "doclens")).parquet(
            *paths
        ).drop("batch")

    def read_docs(self) -> DataFrame:
        return self.spark.read.parquet(self.docs_path)

    def read_doc_lens(self, batches: list[int] | None = None) -> DataFrame:
        """Decoded per-doc token lengths -> (doc_id, doc_len, title_len).
        ``batches`` restricts to specific lineage batches (an increment's
        O(increment) doclens instead of the whole index)."""

        def decode(batches):
            import pandas as pd

            from search_engine_spark.functions.codec import (
                delta_decode_docs,
                vb_decode,
            )

            import numpy as np

            for pdf in batches:
                if not len(pdf):
                    continue
                ids, dls, tls = [], [], []
                for row in pdf.itertuples(index=False):
                    ids.append(delta_decode_docs(row.doc_ids))
                    dls.append(vb_decode(row.doc_lens))
                    tls.append(vb_decode(row.title_lens))
                # one frame per Arrow batch, not per chunk row
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids),
                        "doc_len": np.concatenate(dls).astype("int32"),
                        "title_len": np.concatenate(tls).astype("int32"),
                    }
                )

        return self.read_doclens(batches).mapInPandas(
            decode, "doc_id long, doc_len int, title_len int"
        )

    def read_stats(self) -> dict:
        row = self.spark.read.parquet(self.stats_path).head()
        return row.asDict()

    def read_term_stats(self) -> DataFrame:
        return self.spark.read.parquet(self.term_stats_path)

    def term_stats_for(self, tokens: list[str]) -> dict[str, int]:
        """df per token — partition-pruned lookup (bucket IN + term IN are
        both pushed to the parquet scan).  Results are memoized per store
        instance (the index is immutable once opened), so repeated query
        terms skip the lookup job entirely."""
        if not tokens:
            return {}
        cache = getattr(self, "_df_cache", None)
        if cache is None:
            cache = self._df_cache = {}
        missing = sorted({t for t in tokens if t not in cache})
        if missing:
            buckets = sorted(
                {term_bucket(t, self.config.n_term_buckets) for t in missing}
            )
            rows = (
                self.read_term_stats()
                .where(
                    F.col("bucket").isin(buckets) & F.col("term").isin(missing)
                )
                .select("term", "df")
                .collect()
            )
            found = {r.term: r.df for r in rows}
            for t in missing:
                cache[t] = found.get(t, 0)
        return {t: cache[t] for t in set(tokens) if cache[t] > 0}


def term_bucket(term: str, n_buckets: int) -> int:
    """Deterministic, language-independent term shard (same value computable
    in Spark SQL via ``crc32(encode(term,'utf-8')) % n``)."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def term_bucket_col(col, n_buckets: int):
    return (F.crc32(F.encode(col, "utf-8")) % n_buckets).cast("int")
