"""Structured-Streaming ingestion: staged arrival -> chunk-aligned
increments -> index identical to a one-shot batch build over the same
corpus (and rank-identical to the refsem oracle at every step)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.build.builder import IndexBuilder
from search_engine_spark.config import EngineConfig
from search_engine_spark.oracle.refsem import RefSemIndex
from search_engine_spark.plans.parser import SearchMode
from search_engine_spark.query.engine import SearchEngine
from search_engine_spark.streaming import StreamingIndexer
from search_engine_spark.testing.synth import corpus_to_tokens, synth_corpus

CFG = EngineConfig(chunk_docs=64, chunks_per_batch=2, block_docs=8,
                   n_term_buckets=8)
QUERIES = [
    ("zqmerge zqshard", SearchMode.OR),
    ("zqmerge", SearchMode.AND),
    ("zqmerge AND ( zqshard OR codec_2 )", SearchMode.QUERY_EVALUATOR),
]


def _waves():
    """150 docs in two arrival waves whose key prefixes make arrival
    order == global (repo,path,commit) order, so streaming doc ids equal
    the batch build's ids and full rank-identity is checkable."""
    rows = synth_corpus(n_docs=150, seed=7)
    wave1 = [dict(r, repo="a-" + r["repo"]) for r in rows[:96]]
    wave2 = [dict(r, repo="b-" + r["repo"]) for r in rows[96:]]
    return wave1, wave2


def _ranked(engine, query, mode):
    got = engine.search(query, mode).collect()
    return [(r.doc_id, pytest.approx(r.score, rel=1e-9))
            for r in sorted(got, key=lambda r: r.rank)]


def test_streaming_ingest_matches_batch_build(spark, tmp_path):
    from pyspark.sql import types as T

    wave1, wave2 = _waves()
    schema = T.StructType.fromDDL(
        "repo string, path string, commit string, lang string, content string"
    )
    src_dir = str(tmp_path / "arrivals")
    index_dir = str(tmp_path / "stream_idx")
    staging = str(tmp_path / "staging")
    cols = ["repo", "path", "commit", "lang", "content"]

    spark.createDataFrame(wave1, schema=schema).select(*cols).write.mode(
        "append"
    ).parquet(src_dir)
    indexer = StreamingIndexer(spark, index_dir, staging, CFG)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    indexer.start(stream, available_now=True)
    r1 = indexer.advance()
    # 96 staged docs -> one full 64-doc chunk indexed, 32 left staged
    assert r1["indexed"] == 64 and r1["staged_tail"] == 32
    assert r1["num_docs"] == 64

    # intermediate index is rank-identical to the oracle over the first
    # 64 docs (sorted order == arrival order by construction)
    first64 = sorted(wave1, key=lambda r: (r["repo"], r["path"], r["commit"]))[:64]
    oracle64 = RefSemIndex(corpus_to_tokens(first64))
    eng64 = SearchEngine(spark, index_dir, CFG)
    for q, m in QUERIES:
        _n, ref = oracle64.search_text(q, m)
        assert _ranked(eng64, q, m) == [
            (d, pytest.approx(s, rel=1e-9)) for s, d in ref
        ], (q, "intermediate")

    # idempotent when nothing new is alignable
    assert indexer.advance()["indexed"] == 0

    # wave 2 arrives; the file-sink checkpoint stages only the new files
    spark.createDataFrame(wave2, schema=schema).select(*cols).write.mode(
        "append"
    ).parquet(src_dir)
    stream2 = spark.readStream.schema(schema).parquet(src_dir)
    indexer.start(stream2, available_now=True)
    assert indexer.staged_corpus().count() == 150  # no duplicates staged
    r2 = indexer.advance(final=True)
    assert r2["indexed"] == 86 and r2["num_docs"] == 150

    # final index == one-shot batch build over the combined corpus
    all_rows = wave1 + wave2
    batch_dir = str(tmp_path / "batch_idx")
    IndexBuilder(spark, batch_dir, CFG).build_all(
        spark.createDataFrame(all_rows, schema=schema)
    )
    stream_eng = SearchEngine(spark, index_dir, CFG)
    batch_eng = SearchEngine(spark, batch_dir, CFG)
    docs_a = sorted(tuple(r) for r in stream_eng.store.read_docs().collect())
    docs_b = sorted(tuple(r) for r in batch_eng.store.read_docs().collect())
    assert docs_a == docs_b
    oracle = RefSemIndex(corpus_to_tokens(all_rows))
    for q, m in QUERIES:
        a = _ranked(stream_eng, q, m)
        assert a == _ranked(batch_eng, q, m), q
        _n, ref = oracle.search_text(q, m)
        assert a == [(d, pytest.approx(s, rel=1e-9)) for s, d in ref], q
    # per-row sha invariant holds over the streamed corpus
    res = IndexBuilder(spark, index_dir, CFG).verify_corpus(
        spark.createDataFrame(all_rows, schema=schema)
    )
    assert res == {"rows": 150, "missing": 0, "sha_mismatch": 0}


def test_streaming_many_small_waves(spark, tmp_path):
    """Waves smaller than a chunk accumulate in staging until a chunk
    boundary is crossed; lineage batches stay chunk-aligned throughout."""
    from pyspark.sql import types as T

    rows = synth_corpus(n_docs=100, seed=11)
    # arrival prefix a0 < a1 < a2 keeps arrival order == sort order
    waves = [
        [dict(r, repo=f"a{w}-" + r["repo"]) for r in rows[w * 33:(w + 1) * 33]]
        for w in range(3)
    ]
    schema = T.StructType.fromDDL(
        "repo string, path string, commit string, lang string, content string"
    )
    src = str(tmp_path / "arrivals")
    indexer = StreamingIndexer(
        spark, str(tmp_path / "idx"), str(tmp_path / "stg"), CFG
    )
    cols = ["repo", "path", "commit", "lang", "content"]
    seen = 0
    for w, wave in enumerate(waves):
        spark.createDataFrame(wave, schema=schema).select(*cols).write.mode(
            "append"
        ).parquet(src)
        indexer.start(
            spark.readStream.schema(schema).parquet(src), available_now=True
        )
        r = indexer.advance()
        seen += len(wave)
        assert r["num_docs"] == (seen // 64) * 64
        assert r["num_docs"] + r["staged_tail"] == seen
    r = indexer.advance(final=True)
    assert r["num_docs"] == 99
    eng = SearchEngine(spark, str(tmp_path / "idx"), CFG)
    all_sorted = sorted(
        (row for wave in waves for row in wave),
        key=lambda x: (x["repo"], x["path"], x["commit"]),
    )
    oracle = RefSemIndex(corpus_to_tokens(all_sorted))
    _n, ref = oracle.search_text("zqmerge", SearchMode.AND)
    assert _ranked(eng, "zqmerge", SearchMode.AND) == [
        (d, pytest.approx(s, rel=1e-9)) for s, d in ref
    ]


def test_streaming_torn_increment_detected(spark, tmp_path):
    """A docs-table append without its lineage commit (torn increment)
    must be detected on the next advance, not silently re-numbered."""
    from pyspark.sql import types as T

    rows = synth_corpus(n_docs=80, seed=13)
    schema = T.StructType.fromDDL(
        "repo string, path string, commit string, lang string, content string"
    )
    src = str(tmp_path / "arrivals")
    cols = ["repo", "path", "commit", "lang", "content"]
    spark.createDataFrame(rows, schema=schema).select(*cols).write.parquet(src)
    indexer = StreamingIndexer(
        spark, str(tmp_path / "idx"), str(tmp_path / "stg"), CFG
    )
    indexer.start(
        spark.readStream.schema(schema).parquet(src), available_now=True
    )
    assert indexer.advance()["indexed"] == 64
    # simulate the torn state: extra docs rows, no lineage for them
    store = indexer.builder.store
    extra = store.read_docs().limit(1).withColumn(
        "doc_id", F.col("doc_id") + 10_000
    )
    extra.write.mode("append").parquet(store.docs_path)
    with pytest.raises(RuntimeError, match="torn"):
        indexer.advance(final=True)


def test_advance_before_any_staging_is_noop(spark, tmp_path):
    indexer = StreamingIndexer(
        spark, str(tmp_path / "idx"), str(tmp_path / "stg"), CFG
    )
    assert indexer.advance() == {
        "indexed": 0, "staged_tail": 0, "num_docs": 0,
    }
