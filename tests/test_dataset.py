"""Offline training-dataset pipeline properties beyond the SQL contracts
(tests the generic operators; the value-level math is hash-checked by the
dataset_* driver contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.pipeline import dataset as ds

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def parts(spark):
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs = docs0.select(
        F.col("doc_id").alias("docid"),
        F.col("source").alias("title"),
        F.col("text").alias("body"),
    )
    piv = ds.rank_pivot(ds.synth_top100(docs0))
    train = ds.join_train(
        docs, ds.synth_qrels(docs0), ds.synth_queries(docs0)
    )
    labeled = ds.with_row_index(
        ds.label_matches(
            train.join(F.broadcast(piv), "queryid"),
            [str(r) for r in ds.TARGET_RANKS],
        ),
        ["queryid", "docid"],
    )
    r = docs.agg(
        F.sum(F.size(ds.tokens_col("body"))).alias("sb"),
        F.sum(F.size(ds.tokens_col("title"))).alias("st"),
        F.count("*").alias("n"),
    ).head()
    with_idf = ds.query_idf_lists(
        labeled, ds.term_dfs(docs), int(r.n)
    )
    return docs, with_idf, r.sb / r.n, r.st / r.n


def test_pivot_one_column_per_rank(spark):
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    piv = ds.rank_pivot(ds.synth_top100(docs0))
    assert piv.columns == ["queryid"] + [str(r) for r in ds.TARGET_RANKS]
    row = piv.orderBy("queryid").head()
    # docid formula: (q*7 + 13*rank) % n
    n = docs0.count()
    assert row["1"] == (row.queryid * 7 + 13 * 1) % n
    assert row["100"] == (row.queryid * 7 + 13 * 100) % n


def test_negatives_wide_shape_and_norms(parts):
    docs, with_idf, avg_bl, avg_tl = parts
    wide = ds.negatives_features_wide(
        with_idf.select(
            "index", "queryid", "query", "query_idfs",
            *[f"`{r}`" for r in ds.TARGET_RANKS],
        ),
        docs, avg_bl, avg_tl,
    )
    # index + 12 ranks x 10 features
    assert len(wide.columns) == 1 + 12 * 10
    for r in ds.TARGET_RANKS:
        for c in ds.FEATURE_COLUMNS:
            assert f"{c}_{r}" in wide.columns
    rows = wide.collect()
    assert len(rows) == with_idf.count()
    # per-rank max normalization: every rank column's norm max is exactly 1
    for r in (1, 100):
        mx = max(row[f"body_length_norm_{r}"] for row in rows)
        assert mx == pytest.approx(1.0)


def test_negatives_melted_join_equals_per_rank_join(parts):
    """The melt->single-join path must agree with the reference-shaped
    per-rank join for a spot rank (create-dataset.py:99-113)."""
    docs, with_idf, avg_bl, avg_tl = parts
    labeled = with_idf.select(
        "index", "query", "query_idfs", *[f"`{r}`" for r in ds.TARGET_RANKS]
    )
    long = ds.melt_negatives(
        labeled, [str(r) for r in ds.TARGET_RANKS],
        keep_cols=["index", "query", "query_idfs"],
    )
    melted_r6 = {
        r["index"]: r.docid
        for r in long.where(F.col("neg_rank") == "6").collect()
    }
    direct = {
        r["index"]: r["6"]
        for r in labeled.select("index", "`6`").collect()
    }
    assert melted_r6 == direct


def test_hash_split_stable_under_repartition(parts):
    _docs, with_idf, _a, _b = parts
    base = with_idf.select("index")
    s1 = base.withColumn("split", ds.split_col())
    s2 = base.repartition(13).withColumn("split", ds.split_col())
    a = {r["index"]: r.split for r in s1.collect()}
    b = {r["index"]: r.split for r in s2.collect()}
    assert a == b
    frames = ds.seeded_split(with_idf)
    total = sum(f.count() for f in frames.values())
    assert total == with_idf.count()
    # disjoint
    ids = [set(r["index"] for r in f.select("index").collect())
           for f in frames.values()]
    assert not (ids[0] & ids[1]) and not (ids[0] & ids[2])


def test_zero_token_query_gets_empty_idfs(spark, parts):
    docs, _w, avg_bl, avg_tl = parts
    pairs = spark.createDataFrame(
        [(0, "", 3)], "index long, query string, docid long"
    ).join(docs, "docid")
    out = ds.query_idf_lists(pairs, ds.term_dfs(docs), 500)
    row = out.head()
    assert row.query_idfs == []
    feats = ds.offline_features(out, avg_bl, avg_tl).head()
    assert feats.bm25_score == 0.0
    assert feats.in_title == 0
    assert feats.body_first_occurrence_mean == 1.0  # absent sentinel
    assert feats.title_first_occurrence_min == 1.0
