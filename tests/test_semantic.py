"""Semantic+traditional blend (Q26) vs a pure-numpy oracle.

The oracle recomputes the reference pipeline end-to-end
(inverted_index.py:1478-1619): exact cosine top-k over the corpus
embeddings, 10-dim features with un-pruned idfs, seeded-MLP scores,
min-max normalization of both signals, ``cos_norm + (e^mlp_norm - 1)``,
stable sort.  Embeddings come from the B13 ingestion pipeline over the
same synthetic corpus (vec id == doc id)."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.build.builder import IndexBuilder
from search_engine_spark.config import EngineConfig
from search_engine_spark.functions.bm25 import fielded_bm25
from search_engine_spark.oracle.refsem import RefSemIndex
from search_engine_spark.pipeline import embeddings as embmod
from search_engine_spark.query.engine import SearchEngine
from search_engine_spark.ranking.model import RankingModel
from search_engine_spark.testing.synth import corpus_to_tokens, synth_corpus

CFG = EngineConfig(chunk_docs=64, chunks_per_batch=2, block_docs=8,
                   n_term_buckets=8)


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    rows = synth_corpus(n_docs=150, seed=7)
    corpus = spark.createDataFrame(rows)
    index_dir = str(tmp_path_factory.mktemp("semidx"))
    IndexBuilder(spark, index_dir, CFG).build_all(corpus)
    engine = SearchEngine(spark, index_dir, CFG)
    oracle = RefSemIndex(corpus_to_tokens(rows))
    # embeddings over the engine's dense doc-id order (title=path,
    # body=content like the corpus mapping)
    docs = engine.store.read_docs().join(
        corpus, ["repo", "path", "commit"]
    ).select("doc_id", "path", "content")
    emb = embmod.embed_pipeline(
        docs, id_col="doc_id", body_col="content", title_col="path",
        model_dim=16, truncate_dim=8,
    ).withColumnRenamed("id", "vec_id").cache()
    emb_np = {
        r.vec_id: np.array(r.embedding) for r in emb.collect()
    }
    return engine, oracle, emb, emb_np


def _oracle_semantic(oracle, emb_np, query_tokens, qvec, n_cand, n_ret,
                     model, stats):
    qv = np.asarray(qvec)
    ids = np.array(sorted(emb_np))
    mat = np.stack([emb_np[i] for i in ids])
    cos = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    order = np.lexsort((ids, -cos))[:n_cand]
    cand, cscores = ids[order], cos[order]
    cn = (cscores - cscores.min()) / (cscores.max() - cscores.min() + 1e-8)
    # 10-dim features, un-pruned idfs (df=0 -> ln((N+.5)/.5))
    n = oracle.num_docs
    idfs = np.array([
        np.log((n - len(oracle.index[t].doc_ids) + 0.5)
               / (len(oracle.index[t].doc_ids) + 0.5))
        if t in oracle.index else np.log((n + 0.5) / 0.5)
        for t in query_tokens
    ])
    k = len(query_tokens)
    m = cand.size
    tfb = np.zeros((m, k), dtype=np.int64)
    tft = np.zeros((m, k), dtype=np.int64)
    fob = np.ones((m, k))
    fot = np.ones((m, k))
    dl = np.array([oracle.doc_lengths[d] for d in cand], dtype=np.float64)
    tl = np.array([oracle.title_lengths[d] for d in cand], dtype=np.float64)
    for j, t in enumerate(query_tokens):
        p = oracle.index.get(t)
        if p is None:
            continue
        lookup = {d: i for i, d in enumerate(p.doc_ids)}
        for i, d in enumerate(cand.tolist()):
            pi = lookup.get(d)
            if pi is None:
                continue
            tfb[i, j] = len(p.pos_body[pi])
            tft[i, j] = len(p.pos_title[pi])
            if p.pos_body[pi]:
                fob[i, j] = p.pos_body[pi][0] / dl[i]
            if p.pos_title[pi]:
                fot[i, j] = p.pos_title[pi][0] / tl[i]
    score, sb, st_ = fielded_bm25(
        idfs, tfb, tft, dl, tl, stats["avg_doc_len"],
        stats["avg_title_len"], k1=1.6, b=0.75, title_weight=2.0,
    )
    feats = np.empty((m, 10))
    feats[:, 0], feats[:, 1], feats[:, 2] = score, sb, st_
    feats[:, 3] = fob.mean(axis=1)
    feats[:, 4] = fot.mean(axis=1)
    feats[:, 5] = fob.min(axis=1)
    feats[:, 6] = fot.min(axis=1)
    feats[:, 7] = dl / stats["max_doc_len"]
    feats[:, 8] = tl / stats["max_title_len"]
    feats[:, 9] = (fot < 1.0).any(axis=1).astype(np.float64)
    mlp = model.forward(feats)
    mn = (mlp - mlp.min()) / (mlp.max() - mlp.min() + 1e-8)
    blend = cn + (np.exp(mn) - 1.0)
    # stable sort desc by blend; ties keep cosine (candidate) order
    out = sorted(
        zip(blend.tolist(), cscores.tolist(), cand.tolist()),
        key=lambda x: (-x[0], -x[1], x[2]),
    )[:n_ret]
    return [(d, s) for s, _c, d in out]


def test_semantic_blend_matches_numpy_oracle(setup):
    engine, oracle, emb, emb_np = setup
    model = RankingModel.seeded()
    stats = {
        "avg_doc_len": float(engine.stats["avg_doc_len"]),
        "avg_title_len": float(engine.stats["avg_title_len"]),
        "max_doc_len": int(engine.stats["max_doc_len"]),
        "max_title_len": int(engine.stats["max_title_len"]),
    }
    for query, probe_doc in [("zqmerge zqshard", 0), ("parse_1 token", 33),
                             ("unknown_term_xyz zqmerge", 7)]:
        qvec = [float(v) for v in emb_np[probe_doc]]
        got = engine.semantic_search(
            query, qvec, embeddings=emb, num_semantic_candidates=30,
            num_return=10, model=model,
        ).collect()
        got = sorted(got, key=lambda r: r.rank)
        expect = _oracle_semantic(
            oracle, emb_np, engine._tokenize(query), qvec, 30, 10, model,
            stats,
        )
        assert [r.doc_id for r in got] == [d for d, _s in expect], query
        for r, (_d, s) in zip(got, expect):
            assert r.score == pytest.approx(s, rel=1e-9, abs=1e-12), query


def test_semantic_candidates_beyond_corpus_are_dropped(setup, spark):
    """An embeddings table with ids past the indexed corpus must not
    crash the feature kernel — unknown candidates are dropped."""
    from pyspark.sql import functions as F

    engine, _oracle, emb, emb_np = setup
    beyond = emb.withColumn("vec_id", F.col("vec_id") + 10_000)
    both = emb.unionByName(beyond)
    qvec = [float(v) for v in emb_np[0]]
    got = engine.semantic_search(
        "zqmerge", qvec, embeddings=both, num_semantic_candidates=40,
        num_return=10,
    ).collect()
    assert 0 < len(got) <= 10
    n_docs = int(engine.stats["num_docs"])
    assert all(r.doc_id < n_docs for r in got)


def test_semantic_with_materialized_ann_index(setup, tmp_path_factory):
    """The ANN-index path returns the same rows as brute force when the
    probed buckets cover the true top-k (exact re-score inside)."""
    from search_engine_spark.pipeline import similarity

    engine, _oracle, emb, emb_np = setup
    path = str(tmp_path_factory.mktemp("semann"))
    idx = similarity.LshIndex.build(emb, path, n_planes=2)
    qvec = [float(v) for v in emb_np[0]]
    got = engine.semantic_search(
        "zqmerge zqshard", qvec, ann_index=idx,
        num_semantic_candidates=20, num_return=5,
    ).collect()
    assert 0 < len(got) <= 5
    # candidates all come from probed buckets; scores finite and ranked
    scores = [r.score for r in sorted(got, key=lambda r: r.rank)]
    assert scores == sorted(scores, reverse=True)
