"""Re-ranker training twin: gradient correctness (finite differences),
negative-slot selection quirk, metrics, distributed == driver gradients,
and end-to-end training on the synthetic dataset pipeline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.pipeline import dataset as ds
from search_engine_spark.ranking import metrics, train
from search_engine_spark.ranking.model import RankingModel

SF_DIR = "/root/testdata/sf0.001"


def test_neg_rank_names_reference_quirk():
    # utils/dataset.py:31-51 with num_negative_samples = 10 + 2
    assert train.neg_rank_names(None) == [1, 2, 3, 4, 5, 100, 99, 98, 97, 96]
    assert train.neg_rank_names(3) == [1, 2, 4, 5, 6, 100, 99, 98, 97, 96]
    assert train.neg_rank_names(97) == [1, 2, 3, 4, 5, 100, 99, 98, 96, 95]
    assert train.neg_rank_names(6) == [1, 2, 3, 4, 5, 100, 99, 98, 97, 96]
    # match > half drops rank 6 as well (increasing = range(1, half))
    assert train.neg_rank_names(95) == [1, 2, 3, 4, 5, 100, 99, 98, 97, 96]
    for m in [None, 1, 6, 95, 100]:
        assert len(train.neg_rank_names(m)) == 10


def test_listwise_loss_gradient_finite_diff():
    rng = np.random.default_rng(3)
    s = rng.standard_normal((4, 6))
    t = np.zeros((4, 6))
    t[:, 0] = 1.0
    loss, g = train.listwise_loss_grad(s, t)
    eps = 1e-6
    for i in (0, 3):
        for j in (0, 2, 5):
            sp = s.copy(); sp[i, j] += eps
            sm = s.copy(); sm[i, j] -= eps
            num = (train.listwise_loss_grad(sp, t)[0]
                   - train.listwise_loss_grad(sm, t)[0]) / (2 * eps)
            assert g[i, j] == pytest.approx(num, rel=1e-4, abs=1e-8)


def test_mlp_backward_finite_diff():
    rng = np.random.default_rng(5)
    model = RankingModel.seeded(hidden=8, seed=5)
    w = model.w
    X = rng.standard_normal((3, 4, 10))
    T = np.zeros((3, 4)); T[:, 0] = 1.0
    loss, grads = train.forward_backward(w, X, T)
    eps = 1e-6
    for key in ("w1", "w3", "b2"):
        flat = w[key].ravel()
        for idx in (0, flat.size // 2):
            orig = flat[idx]
            flat[idx] = orig + eps
            lp, _ = train.forward_backward(w, X, T)
            flat[idx] = orig - eps
            lm, _ = train.forward_backward(w, X, T)
            flat[idx] = orig
            num = (lp - lm) / (2 * eps)
            assert grads[key].ravel()[idx] == pytest.approx(
                num, rel=1e-3, abs=1e-8
            ), key


def test_metrics_reference_semantics():
    # positive in slot 0; rank = 1 + #(scores strictly greater)
    pred = np.array([
        [3.0, 1.0, 2.0],   # rank 1
        [1.0, 3.0, 2.0],   # rank 3
        [2.0, 2.0, 1.0],   # tie -> rank 1 (strict >)
    ])
    assert metrics.positive_ranks(pred).tolist() == [1, 3, 1]
    assert metrics.mrr(pred) == pytest.approx((1 + 1 / 3 + 1) / 3)
    assert metrics.mrr(pred, num_topk=2) == pytest.approx((1 + 0 + 1) / 3)
    d = 1 / np.log2(3 + 1)
    assert metrics.ndcg(pred) == pytest.approx((1 + d + 1) / 3)


@pytest.fixture(scope="module")
def examples(spark):
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs = docs0.select(
        F.col("doc_id").alias("docid"),
        F.col("source").alias("title"),
        F.col("text").alias("body"),
    )
    piv = ds.rank_pivot(ds.synth_top100(docs0))
    train_j = ds.join_train(docs, ds.synth_qrels(docs0),
                            ds.synth_queries(docs0))
    labeled = ds.with_row_index(
        ds.label_matches(train_j.join(F.broadcast(piv), "queryid"),
                         [str(r) for r in ds.TARGET_RANKS]),
        ["queryid", "docid"],
    )
    r = docs.agg(
        F.sum(F.size(ds.tokens_col("body"))).alias("sb"),
        F.sum(F.size(ds.tokens_col("title"))).alias("st"),
        F.count("*").alias("n"),
    ).head()
    with_idf = ds.query_idf_lists(labeled, ds.term_dfs(docs), int(r.n))
    feats = ds.offline_features(with_idf, r.sb / r.n, r.st / r.n)
    wide = ds.negatives_features_wide(
        feats.select("index", "queryid", "query", "query_idfs",
                     *[f"`{c}`" for c in ds.TARGET_RANKS]),
        docs, r.sb / r.n, r.st / r.n,
    )
    full = feats.select("index", "match", *ds.FEATURE_COLUMNS).join(
        wide, "index"
    )
    pdf = full.toPandas().sort_values("index").reset_index(drop=True)
    return train.build_examples(pdf)


def test_training_improves_ranking(examples):
    X, T = examples
    assert X.shape[1:] == (11, 10)
    model0 = RankingModel.seeded(hidden=32, seed=17)
    before = train.evaluate(model0, X)
    model, hist = train.fit(
        X, T, epochs=30, batch_size=16, lr=3e-3, hidden=32, seed=17,
        X_val=X, T_val=T,
    )
    after = train.evaluate(model, X)
    assert hist[-1]["loss"] < hist[0]["loss"]
    # positives have genuinely better features (they match the query), so
    # training on this set must beat the random-init ranking
    assert after["mrr@10"] > before["mrr@10"]
    assert after["mrr@10"] > 0.5


def test_distributed_grads_equal_driver(spark, examples):
    X, T = examples
    w = RankingModel.seeded(hidden=16, seed=9).w
    df = train.examples_to_df(spark, X, T).repartition(4)
    d_loss, d_grads, n = train.distributed_grads(df, w)
    loss, grads = train.forward_backward(w, X, T)
    assert n == X.shape[0]
    assert d_loss == pytest.approx(loss, rel=1e-12)
    for k in grads:
        assert np.allclose(d_grads[k], grads[k], rtol=1e-10, atol=1e-12), k
