"""Upsert: re-ingested document versions supersede the old ones.

A document's identity is ``(repo, path)``; a re-crawl arrives with a new
``commit`` through the ordinary streaming staging and gets a fresh dense
doc id.  ``advance(upsert=True)`` then tombstones every older version of
the increment's keys (``IndexBuilder.supersede_old_versions``, scoped so
the reconciliation is O(increment)); ``compact()`` purges them
physically.  Two versions of the same key inside one increment resolve
to the highest doc id (latest within the arrival wave).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.build.builder import IndexBuilder
from search_engine_spark.config import EngineConfig
from search_engine_spark.plans.parser import SearchMode
from search_engine_spark.query.engine import SearchEngine
from search_engine_spark.streaming import StreamingIndexer
from search_engine_spark.testing.synth import synth_corpus

N = 150
N_UPD = 15  # doc_id % 10 == 0
# chunk_docs divides N: the batch build ends chunk-aligned, so the
# streaming update wave can append to it
CFG = EngineConfig(
    chunk_docs=10, chunks_per_batch=2, block_docs=8, n_term_buckets=8
)


@pytest.fixture(scope="module")
def upserted(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("upsert")
    index_dir = str(base / "idx")
    corpus = spark.createDataFrame(synth_corpus(n_docs=N, seed=11))
    IndexBuilder(spark, index_dir, CFG).build_all(corpus)

    indexer = StreamingIndexer(spark, index_dir, str(base / "stg"), CFG)
    docs = indexer.builder.store.read_docs()
    upd_keys = docs.where(F.col("doc_id") % 10 == 0).select(
        "doc_id", "repo", "path", "commit"
    )
    assert upd_keys.count() == N_UPD
    v2 = (
        corpus.join(upd_keys, ["repo", "path", "commit"])
        .select(
            "repo", "path",
            F.lit("c_v2").alias("commit"),
            "lang",
            F.concat(F.col("content"), F.lit(" zzupdated")).alias("content"),
        )
    )
    # one key gets a SECOND new version in the same wave — the higher
    # doc id (later within-increment sort position) must win
    v3 = (
        v2.join(
            docs.where(F.col("doc_id") == 0).select("repo", "path"),
            ["repo", "path"],
        )
        .select(
            "repo", "path",
            F.lit("c_v3").alias("commit"),
            "lang",
            F.concat(F.col("content"), F.lit(" zzthird")).alias("content"),
        )
    )
    wave = v2.unionByName(v3)
    src = str(base / "arrivals")
    wave.write.mode("overwrite").parquet(src)
    from search_engine_spark.sources.corpus import CORPUS_SCHEMA

    indexer.start(
        spark.readStream.schema(CORPUS_SCHEMA).parquet(src),
        available_now=True,
    )
    res = indexer.advance(final=True, upsert=True)
    old_ids = {r.doc_id for r in upd_keys.select("doc_id").collect()}
    return indexer, index_dir, res, old_ids


def test_increment_supersedes_old_versions(upserted, spark):
    indexer, index_dir, res, old_ids = upserted
    # 16 staged (15 v2 + 1 v3); superseded = 15 originals + the v2 the
    # v3 out-versions inside the same increment
    assert res["indexed"] == N_UPD + 1
    assert res["superseded"] == N_UPD + 1
    assert res["num_docs"] == N + N_UPD + 1

    eng = SearchEngine(spark, index_dir, CFG)
    hits = eng.search("zzupdated", SearchMode.OR, num_return=1000)
    ids = {r.doc_id for r in hits.collect()}
    assert len(ids) == N_UPD and all(i >= N for i in ids)
    assert not ids & old_ids
    # in-wave double version: only the v3 row survives for that key
    third = eng.search("zzthird", SearchMode.OR, num_return=10).collect()
    assert len(third) == 1 and third[0].doc_id in ids


def test_old_versions_gone_from_complement(upserted, spark):
    _ix, index_dir, _res, old_ids = upserted
    eng = SearchEngine(spark, index_dir, CFG)
    comp = eng.search("zzupdated", SearchMode.NOT, num_return=10_000)
    comp_ids = {r.doc_id for r in comp.collect()}
    assert not comp_ids & old_ids
    # 166 total - 16 tombstoned - 15 zzupdated survivors
    assert len(comp_ids) == (N + N_UPD + 1) - (N_UPD + 1) - N_UPD


def test_full_reconcile_is_idempotent(upserted):
    indexer, _d, _res, _o = upserted
    assert indexer.builder.supersede_old_versions()["deleted"] == 0


def test_compact_purges_superseded(upserted, spark):
    indexer, index_dir, _res, old_ids = upserted
    before = {
        (r.doc_id, round(r.score, 6))
        for r in SearchEngine(spark, index_dir, CFG)
        .search("zzupdated", SearchMode.OR, num_return=1000)
        .collect()
    }
    out = indexer.builder.compact()
    assert out["compacted"] and out["purged_docs"] == N_UPD + 1
    indexer.builder.vacuum()
    assert not os.path.isdir(indexer.builder.store.tombstones_path)
    eng = SearchEngine(spark, index_dir, CFG)
    assert int(eng.stats["num_docs"]) == N
    after = eng.search("zzupdated", SearchMode.OR, num_return=1000).collect()
    # same winners (scores shift: stats recomputed over survivors)
    assert {r.doc_id for r in after} == {d for d, _s in before}
    assert not {r.doc_id for r in after} & old_ids
