"""Pipeline operator properties beyond the SQL contracts: LSH ANN recall
vs the exact baseline, MinHash/SimHash detection of planted near-dups,
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.pipeline import dedup, multimodal, similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_lsh_recall_vs_bruteforce(emb):
    """LSH-bucketed ANN must recover most of the exact top-10 (recall@10
    >= 0.5 averaged over probe queries with Hamming-1 probing)."""
    hits = total = 0
    for qid in range(5):
        qvec = [
            float(v)
            for v in emb.where(F.col("vec_id") == qid).head()["embedding"]
        ]
        exact = {
            r.id for r in similarity.cosine_topk(emb, qvec, k=10).collect()
        }
        approx = {
            r.id for r in similarity.lsh_topk(emb, qvec, k=10).collect()
        }
        hits += len(exact & approx)
        total += len(exact)
    assert hits / total >= 0.5, f"recall {hits}/{total}"


def test_lsh_is_subset_of_bucket_scored_exactly(emb):
    """Every LSH result's cosine equals the exact cosine (re-scoring is
    exact; only the candidate set is approximate)."""
    qvec = [float(v) for v in emb.where(F.col("vec_id") == 3).head()["embedding"]]
    exact = {
        r.id: r.cos
        for r in similarity.cosine_topk(emb, qvec, k=500).collect()
    }
    for r in similarity.lsh_topk(emb, qvec, k=10).collect():
        assert r.cos == pytest.approx(exact[r.id], rel=1e-12)


def test_minhash_finds_planted_neardups(spark, docs):
    """Append lightly-perturbed copies of 10 docs; the MinHash-LSH pipeline
    must pair each copy with its source at high Jaccard."""
    perturbed = (
        docs.where(F.col("doc_id") < 10)
        .withColumn("doc_id", F.col("doc_id") + 10_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail_marker")))
    )
    both = docs.unionByName(perturbed)
    pairs = dedup.minhash_dedup_pairs(
        both, "doc_id", "text", threshold=0.5
    ).collect()
    found = {(r.id1, r.id2) for r in pairs}
    planted = {(i, i + 10_000) for i in range(10)}
    assert len(planted & found) >= 8, sorted(found)[:20]
    for r in pairs:
        assert 0.0 <= r.jaccard <= 1.0


def test_simhash_on_planted_dups(spark, docs):
    """Exact copies have identical SimHash (hamming 0) and are paired."""
    copies = docs.where(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 20_000
    )
    sims = dedup.simhash_table(docs.unionByName(copies), "doc_id", "text")
    pairs = dedup.simhash_near_pairs(sims, max_hamming=0).collect()
    found = {(r.id1, r.id2) for r in pairs}
    assert {(i, i + 20_000) for i in range(5)} <= found


def test_multimodal_stub_paths(docs):
    binary = multimodal.attach_binary(docs.limit(20), "doc_id", "text")
    feats = multimodal.decode_features(binary).collect()
    assert len(feats) == 20
    for r in feats:
        assert r.width == r.n_bytes % 256
        assert len(r.feat) == 4
        assert r.feat[0] == pytest.approx(r.n_bytes / 1000.0)
    with pytest.raises(NotImplementedError):
        multimodal.sample_frames(binary, deterministic_fake=False)
    frames = multimodal.sample_frames(
        binary, n_frames=2, deterministic_fake=True
    ).collect()
    assert len(frames) == 40


def test_ivf_recall_vs_bruteforce(emb):
    """IVF (k-means coarse quantizer + nprobe cells) must recover most of
    the exact top-10; re-scored cosines are exact."""
    hits = total = 0
    for qid in range(5):
        qvec = [
            float(v)
            for v in emb.where(F.col("vec_id") == qid).head()["embedding"]
        ]
        exact_rows = similarity.cosine_topk(emb, qvec, k=10).collect()
        exact = {r.id for r in exact_rows}
        exact_cos = {r.id: r.cos for r in exact_rows}
        approx = similarity.ivf_topk(emb, qvec, k=10).collect()
        for r in approx:
            if r.id in exact_cos:
                assert r.cos == pytest.approx(exact_cos[r.id], rel=1e-12)
        hits += len(exact & {r.id for r in approx})
        total += len(exact)
    assert hits / total >= 0.6, f"recall {hits}/{total}"


def test_ivf_deterministic(emb):
    qvec = [float(v) for v in emb.where(F.col("vec_id") == 1).head()["embedding"]]
    a = similarity.ivf_topk(emb, qvec, k=5).collect()
    b = similarity.ivf_topk(emb, qvec, k=5).collect()
    assert [(r.id, r.cos) for r in a] == [(r.id, r.cos) for r in b]
