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
    """Explode the vocabulary to (trigram, token, n_trigrams, df) rows —
    flatten + np.repeat column assembly (the ``extract_partials_batch``
    idiom), one numpy pass per Arrow batch instead of a per-trigram
    Python append loop."""
    import numpy as np

    for pdf in batches:
        if len(pdf) == 0:
            continue
        tris_lists = [get_trigrams_from_token(t) for t in pdf["term"]]
        lens = np.fromiter(
            (len(x) for x in tris_lists),
            dtype=np.int64,
            count=len(tris_lists),
        )
        total = int(lens.sum())
        flat = np.empty(total, dtype=object)
        i = 0
        for x in tris_lists:
            flat[i : i + len(x)] = list(x)
            i += len(x)
        yield pd.DataFrame(
            {
                "trigram": flat,
                "token": np.repeat(pdf["term"].to_numpy(), lens),
                "n_trigrams": np.repeat(lens, lens).astype("int32"),
                "df": np.repeat(
                    pdf["df"].to_numpy().astype("int64"), lens
                ),
            }
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
    """One Spark job corrects a whole batch of OOV tokens: the token->
    trigram probe rides a broadcast join into the trigram table, the
    Jaccard funnel's top-``jaccard_pool`` is taken per token with a
    window INSIDE the job (never collecting raw candidate pools — a
    common trigram like 'ing' matches a vocabulary-sized candidate set
    at web scale), and only <= ``jaccard_pool`` rows per token reach the
    driver for the edit-distance/df funnels.  The trigram table itself
    is cached on first use (vocabulary-derived, ~avg-token-length rows
    per vocab term — tiny next to postings), so repeat probes skip the
    parquet scan entirely."""

    def __init__(
        self,
        spark: SparkSession,
        store: IndexStore,
        jaccard_pool: int = 75,
        edit_pool: int = 50,
        cache_table: bool = True,
    ):
        self.spark = spark
        self.store = store
        self.jaccard_pool = jaccard_pool
        self.edit_pool = edit_pool
        self.path = str(store.dir / "trigrams")
        self.cache_table = cache_table
        self._table: DataFrame | None = None

    def table(self) -> DataFrame:
        if self._table is None:
            self._table = self.spark.read.parquet(self.path)
            if self.cache_table:
                self._table = self._table.cache()
        return self._table

    def _jaccard_pools(
        self, tok_tris: dict[str, tuple[str, ...]]
    ) -> dict[str, list[tuple[str, int, int, int]]]:
        """{token: [(cand, n_trigrams, df, overlap)] top jaccard_pool} in
        ONE Spark job for every token in the batch."""
        from pyspark.sql import Window

        probe_rows = [
            (qtok, tri, len(tris))
            for qtok, tris in tok_tris.items()
            for tri in tris
        ]
        probe = self.spark.createDataFrame(
            probe_rows, "qtok string, trigram string, nq int"
        )
        buckets = sorted(
            {
                term_bucket(t, self.store.config.n_term_buckets)
                for _q, t, _n in probe_rows
            }
        )
        cand = (
            self.table()
            .where(F.col("bucket").isin(buckets))
            .join(F.broadcast(probe), "trigram")
            .groupBy("qtok", "nq", "token", "n_trigrams", "df")
            .agg(F.count("*").alias("overlap"))
        )
        # funnel 1: per-token Jaccard top-N (ties -> lexicographically
        # smaller token, same total order as the driver-side sort)
        jacc = F.col("overlap") / (
            F.col("n_trigrams") + F.col("nq") - F.col("overlap")
        )
        w = Window.partitionBy("qtok").orderBy(
            (-jacc).asc(), F.col("token").asc()
        )
        rows = (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= self.jaccard_pool)
            .collect()
        )
        out: dict[str, list] = {q: [] for q in tok_tris}
        for r in sorted(rows, key=lambda r: r.rn):
            out[r.qtok].append(
                (r.token, int(r.n_trigrams), int(r.df), int(r.overlap))
            )
        return out

    def correct_many(self, tokens: list[str]) -> dict[str, str]:
        """Best-df replacement per out-of-vocabulary token (the token
        itself when nothing shares a trigram) — one job per batch."""
        tok_tris = {
            t: tuple(sorted(get_trigrams_from_token(t)))
            for t in dict.fromkeys(tokens)
        }
        todo = {t: tris for t, tris in tok_tris.items() if tris}
        result = {t: t for t in tok_tris}
        if not todo:
            return result
        pools = self._jaccard_pools(todo)
        for token, scored in pools.items():
            if not scored:
                continue
            # funnel 2: edit-distance bottom-N
            by_ed = sorted(
                scored, key=lambda c: (levenshtein(c[0], token), c[0])
            )[: self.edit_pool]
            # funnel 3: argmax document frequency
            best = min(by_ed, key=lambda c: (-c[2], c[0]))
            result[token] = best[0]
        return result

    def correct(self, token: str) -> str:
        return self.correct_many([token])[token]
