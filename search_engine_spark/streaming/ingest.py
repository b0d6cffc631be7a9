"""Streaming corpus ingestion — beyond-reference addition (the reference
is strictly batch; SURVEY.md §2.4).  Continuously arriving documents are
folded into the SAME lineage-gated index the batch builder produces, so
every query-side property (pruned scans, chunk kernels, WAND, resume)
holds unchanged over a live corpus.

Design (LSM-memtable-shaped):

1. **Stage** — ``readStream`` source -> parquet file sink with a
   checkpoint: Spark's file-sink commit log makes staging exactly-once
   per source record, across restarts.
2. **Advance** — fold staged-but-unindexed docs into the index in
   **chunk-aligned** increments: doc ids continue densely from the
   current ``num_docs`` (arrival-increment order, keyed
   ``(repo, path, commit)`` within an increment), and an increment only
   indexes whole ``chunk_docs`` chunks.  Alignment is what keeps the
   core invariant — every ``(term, chunk)`` row lives in exactly ONE
   lineage batch — so increments are append-only and never rewrite
   committed rows (a partial chunk split across two batches would emit
   duplicate ``(term, chunk)`` rows and corrupt chunk kernels).
3. **Tail** — the sub-chunk remainder (< ``chunk_docs`` docs) stays
   staged (bounded staleness, like an LSM memtable below its flush
   threshold) until more data arrives; ``advance(final=True)`` flushes
   it as the terminal partial chunk, sealing the index against further
   appends.

Each increment commits one lineage batch (variable chunk count — batch
metric rows record the chunk range) and re-runs the idempotent
``finalize()`` so stats/term_stats cover the new data.  Readers opened
before an increment keep their committed-batch snapshot; re-open a
``SearchEngine`` to see newly committed batches (same snapshot-isolation
behavior as the batch builder's resume).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.build.builder import IndexBuilder
from search_engine_spark.config import EngineConfig
from search_engine_spark.sources.corpus import SORT_KEYS, assign_doc_ids


class StreamingIndexer:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        staging_dir: str,
        config: EngineConfig | None = None,
        title_col: str = "path",
        body_col: str = "content",
    ):
        self.spark = spark
        self.config = config or EngineConfig()
        self.builder = IndexBuilder(
            spark, index_dir, self.config, title_col, body_col
        )
        self.staging_dir = staging_dir
        self.corpus_dir = os.path.join(staging_dir, "corpus")
        self.checkpoint_dir = os.path.join(staging_dir, "checkpoint")

    # ------------------------------------------------ stage (exactly-once)

    def start(self, stream: DataFrame, available_now: bool = True):
        """Stage a streaming corpus source into the arrival log.

        ``stream`` must carry the corpus schema
        (repo, path, commit, lang, content).  The parquet file sink's
        commit log + checkpoint give exactly-once staging; with
        ``available_now`` the query drains everything currently available
        and stops (micro-batch catch-up), otherwise it runs continuously
        and the caller owns the handle."""
        writer = (
            stream.writeStream.format("parquet")
            .option("path", self.corpus_dir)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("append")
        )
        if available_now:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
            return q
        return writer.start()

    # ------------------------------------------------ fold into the index

    def staged_corpus(self) -> DataFrame:
        return self.spark.read.parquet(self.corpus_dir)

    def advance(self, final: bool = False) -> dict:
        """Index all staged-but-unindexed docs up to a chunk boundary
        (everything, including the partial tail chunk, when ``final``).

        Idempotent: already-indexed docs are excluded by key anti-join,
        and the lineage commit is the last step of each increment — a
        crash before it leaves the index unchanged and the docs-table
        count gate detects a torn docs append on the next call."""
        cfg = self.config
        store = self.builder.store
        if not os.path.isdir(self.corpus_dir):
            # nothing staged yet (start() never ran or the stream was empty)
            n = self._lineage_doc_count()
            return {"indexed": 0, "staged_tail": 0, "num_docs": n}
        staged = self.staged_corpus()

        if os.path.isdir(store.docs_path):
            docs = store.read_docs()
            n_existing = docs.count()
            lineage_docs = self._lineage_doc_count()
            if n_existing != lineage_docs:
                # torn previous increment: docs rows appended but the
                # lineage batch never committed — rebuild the docs append
                # is not possible blindly; surface it
                raise RuntimeError(
                    f"docs table has {n_existing} rows but committed "
                    f"lineage covers {lineage_docs}; previous increment "
                    f"was torn before its lineage commit"
                )
            new = staged.join(
                docs.select(*SORT_KEYS), SORT_KEYS, "left_anti"
            )
        else:
            store.write_meta()
            docs = None
            n_existing = 0
            new = staged

        n_new = new.count()
        total = n_existing + n_new
        if final:
            n_index_to = total
        else:
            n_index_to = (total // cfg.chunk_docs) * cfg.chunk_docs
        n_take = n_index_to - n_existing
        if n_take <= 0:
            return {"indexed": 0, "staged_tail": n_new, "num_docs": n_existing}

        first_chunk = n_existing // cfg.chunk_docs
        last_chunk = (n_index_to + cfg.chunk_docs - 1) // cfg.chunk_docs
        committed = store.committed_batches()
        batch_id = (max(committed) + 1) if committed else 0

        # dense ids continue from n_existing, (repo,path,commit)-ordered
        # within the increment (assign_doc_ids' partition-offset scheme).
        # The increment is SNAPSHOTTED to parquet before the docs-table
        # append: appending to docs/ invalidates its file-listing cache,
        # so any later re-evaluation of the anti-join lineage would see
        # the just-appended rows and silently empty the increment.
        incr = (
            assign_doc_ids(new)
            .where(F.col("doc_id") < n_take)
            .withColumn("doc_id", F.col("doc_id") + F.lit(n_existing))
        )
        inc_path = os.path.join(
            self.staging_dir, "increments", f"batch={batch_id}"
        )
        incr.write.mode("overwrite").parquet(inc_path)
        snap = self.spark.read.parquet(inc_path)
        if snap.count() != n_take:
            raise RuntimeError("increment snapshot row-count mismatch")
        snap.select(
            "doc_id", "repo", "path", "commit", "lang", "sha256"
        ).write.mode("append").parquet(store.docs_path)
        n_after = store.read_docs().count()
        if n_after != n_index_to:
            raise RuntimeError(
                f"streaming docs append corrupted: expected {n_index_to} "
                f"rows, found {n_after}"
            )

        kb = snap.agg(
            F.min(F.struct(*SORT_KEYS)).alias("lo"),
            F.max(F.struct(*SORT_KEYS)).alias("hi"),
            F.count("*").alias("n"),
        ).head()
        metric = self.builder._run_batch(
            snap.drop("doc_id", "sha256"),
            snap.select("doc_id", *SORT_KEYS),
            (kb.lo, kb.hi, int(kb.n)),
            batch_id,
            first_chunk,
            last_chunk,
        )
        stats = self.builder.finalize()
        return {
            "indexed": n_take,
            "staged_tail": n_new - n_take,
            "num_docs": int(stats["num_docs"]),
            "batch": metric,
        }

    def _lineage_doc_count(self) -> int:
        store = self.builder.store
        if not os.path.isdir(store.lineage_path):
            return 0
        row = (
            self.spark.read.parquet(store.lineage_path)
            .agg(F.sum("n_docs"))
            .head()
        )
        return int(row[0] or 0)
