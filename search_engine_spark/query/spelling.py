"""Trigram-index spelling correction (reference Q23,
``/root/reference/search_engine/inverted_index.py:995-1046``; trigram
index build ``ingestion.py:225-333``).

Build: the vocabulary (term_stats) is exploded to (trigram, token,
n_trigrams, df) rows via an Arrow-batched ``mapInPandas`` and written
partitioned by trigram hash bucket — a correction probe scans only the
query token's trigram buckets (partition pruning), never the vocabulary.

Correct: the reference funnel — candidates = union of tokens sharing any
trigram; Jaccard = overlap / (n_cand + n_query - overlap) top
``search_space_size_jaccard`` (75); edit-distance top 50; argmax document
frequency.  The reference's tie-breaks fall back on Python *set iteration
order* (nondeterministic); pinned deterministic equivalents here: Jaccard
ties prefer lexicographically smaller tokens, edit-distance ties likewise,
df ties likewise.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.functions.trigrams import (
    get_trigrams_from_token,
    levenshtein,
)
from search_engine_spark.sources.index_store import IndexStore, term_bucket


def _trigram_mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        rows = []
        for term, df in zip(pdf["term"], pdf["df"]):
            tris = get_trigrams_from_token(term)
            n = len(tris)
            for t in tris:
                rows.append((t, term, n, int(df)))
        yield pd.DataFrame(
            rows, columns=["trigram", "token", "n_trigrams", "df"]
        )


def build_trigram_table(store: IndexStore) -> None:
    """Vocabulary -> trigram table under <index_dir>/trigrams/."""
    vocab = (
        store.read_term_stats()
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    tri = vocab.mapInPandas(
        _trigram_mapper, "trigram string, token string, n_trigrams int, df long"
    ).withColumn(
        "bucket",
        (F.crc32(F.encode(F.col("trigram"), "utf-8")) % store.config.n_term_buckets
         ).cast("int"),
    )
    (
        tri.repartition("bucket")
        .sortWithinPartitions("trigram", "token")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(str(store.dir / "trigrams"))
    )


class SpellingCorrector:
    def __init__(
        self,
        spark: SparkSession,
        store: IndexStore,
        jaccard_pool: int = 75,
        edit_pool: int = 50,
    ):
        self.spark = spark
        self.store = store
        self.jaccard_pool = jaccard_pool
        self.edit_pool = edit_pool
        self.path = str(store.dir / "trigrams")

    def _candidates(self, trigrams: set[str]) -> list[tuple[str, int, int]]:
        buckets = sorted(
            {term_bucket(t, self.store.config.n_term_buckets) for t in trigrams}
        )
        rows = (
            self.spark.read.parquet(self.path)
            .where(
                F.col("bucket").isin(buckets)
                & F.col("trigram").isin(sorted(trigrams))
            )
            .groupBy("token", "n_trigrams", "df")
            .agg(F.count("*").alias("overlap"))
            .collect()
        )
        return [(r.token, int(r.n_trigrams), int(r.df), int(r.overlap)) for r in rows]

    def correct(self, token: str) -> str:
        """Best-df replacement for an out-of-vocabulary token (the token
        itself if nothing shares a trigram)."""
        tris = get_trigrams_from_token(token)
        if not tris:
            return token
        cands = self._candidates(tris)
        if not cands:
            return token
        n_q = len(tris)
        # funnel 1: Jaccard top-N (ties -> lexicographically smaller token)
        scored = sorted(
            cands,
            key=lambda c: (-(c[3] / (c[1] + n_q - c[3])), c[0]),
        )[: self.jaccard_pool]
        # funnel 2: edit-distance bottom-N
        by_ed = sorted(
            scored, key=lambda c: (levenshtein(c[0], token), c[0])
        )[: self.edit_pool]
        # funnel 3: argmax document frequency
        best = min(by_ed, key=lambda c: (-c[2], c[0]))
        return best[0]
