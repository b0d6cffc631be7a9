"""Pipeline operator properties beyond the SQL contracts: LSH ANN recall
vs the exact baseline, MinHash/SimHash detection of planted near-dups,
multimodal plumbing."""

from __future__ import annotations

import os

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


@pytest.fixture(scope="module")
def lsh_index(emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("annlsh"))
    return similarity.LshIndex.build(emb, path)


@pytest.fixture(scope="module")
def ivf_index(emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("annivf"))
    return similarity.IvfIndex.build(emb, path)


def test_lsh_recall_vs_bruteforce(emb, lsh_index):
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
            r.id for r in similarity.lsh_topk(lsh_index, qvec, k=10).collect()
        }
        hits += len(exact & approx)
        total += len(exact)
    assert hits / total >= 0.5, f"recall {hits}/{total}"


def test_lsh_is_subset_of_bucket_scored_exactly(emb, lsh_index):
    """Every LSH result's cosine equals the exact cosine (re-scoring is
    exact; only the candidate set is approximate)."""
    qvec = [float(v) for v in emb.where(F.col("vec_id") == 3).head()["embedding"]]
    exact = {
        r.id: r.cos
        for r in similarity.cosine_topk(emb, qvec, k=500).collect()
    }
    for r in similarity.lsh_topk(lsh_index, qvec, k=10).collect():
        assert r.cos == pytest.approx(exact[r.id], rel=1e-12)


def test_assigners_match_expression_specification(emb):
    """The in-batch numpy bucket/cell assigners must be bit-identical to
    the JVM expression forms they replaced (lsh_bucket_col /
    ivf_assign_col — the specification the SQL oracles derive from)."""
    import numpy as np

    sub = emb.limit(120)
    planes = similarity.hyperplanes(64, 4, 11)
    expr = {
        r.vec_id: r.b
        for r in sub.withColumn(
            "b", similarity.lsh_bucket_col(F.col("embedding"), planes)
        ).select("vec_id", "b").collect()
    }
    batch = {
        r.vec_id: r.b2
        for r in similarity._with_assignment(
            sub, planes, "lsh", "embedding", "b2"
        ).select("vec_id", "b2").collect()
    }
    assert expr == batch
    sample = np.array(
        [[float(v) for v in r.embedding]
         for r in sub.orderBy("vec_id").collect()]
    )
    cents = similarity.kmeans_centroids(sample, 8, seed=11)
    expr_c = {
        r.vec_id: r.c
        for r in sub.withColumn(
            "c", similarity.ivf_assign_col(F.col("embedding"), cents)
        ).select("vec_id", "c").collect()
    }
    batch_c = {
        r.vec_id: r.c2
        for r in similarity._with_assignment(
            sub, cents, "ivf", "embedding", "c2"
        ).select("vec_id", "c2").collect()
    }
    assert expr_c == batch_c


def _partition_filter_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lsh_scan_is_partition_pruned(emb, lsh_index):
    """The materialized LSH topk must read ONLY the probed bucket
    partitions — PartitionFilters on `bucket`, not a full scan with a
    post-filter (the round-1 per-query bucket computation scanned
    everything)."""
    qvec = [float(v) for v in emb.where(F.col("vec_id") == 2).head()["embedding"]]
    probe = similarity.lsh_probe_buckets(lsh_index.planes, qvec, 1)
    plan = _partition_filter_plan(lsh_index.topk(qvec, k=10))
    assert "PartitionFilters" in plan
    assert "bucket" in plan
    # the pruned scan must mention the probed bucket values
    assert any(str(b) in plan for b in probe)


def test_ivf_scan_is_partition_pruned(emb, ivf_index):
    qvec = [float(v) for v in emb.where(F.col("vec_id") == 2).head()["embedding"]]
    plan = _partition_filter_plan(ivf_index.topk(qvec, k=10))
    assert "PartitionFilters" in plan
    assert "ivf_cell" in plan


def test_ann_index_append_incremental(spark, emb, tmp_path_factory):
    """append() folds new vectors into the existing partitions with the
    persisted quantizer: an incrementally-built index returns exactly
    what a one-shot build over the union returns."""
    first = emb.where(F.col("vec_id") < 300)
    rest = emb.where(F.col("vec_id") >= 300)
    inc = similarity.LshIndex.build(
        first, str(tmp_path_factory.mktemp("lshinc"))
    )
    inc.append(rest)
    full = similarity.LshIndex.build(
        emb, str(tmp_path_factory.mktemp("lshfull"))
    )
    qvec = [float(v) for v in emb.where(F.col("vec_id") == 350).head()["embedding"]]
    a = [(r.id, r.cos) for r in inc.topk(qvec, k=10).collect()]
    b = [(r.id, r.cos) for r in full.topk(qvec, k=10).collect()]
    assert a == b
    assert inc.table().count() == 500
    ivf = similarity.IvfIndex.build(
        first, str(tmp_path_factory.mktemp("ivfinc"))
    )
    ivf.append(rest)
    assert ivf.table().count() == 500
    got = {r.id for r in ivf.topk(qvec, k=10).collect()}
    assert 350 in got  # the query vector itself arrived via append


def test_ann_delete_and_compact(spark, emb, tmp_path_factory):
    """Vector tombstones: deleted ids vanish from probes immediately,
    repeat deletes are idempotent, results are identical before and after
    the physical compaction, and compaction retires the tombstones while
    preserving partition pruning."""
    for cls, name in [
        (similarity.LshIndex, "lshdel"), (similarity.IvfIndex, "ivfdel")
    ]:
        idx = cls.build(emb, str(tmp_path_factory.mktemp(name)))
        qvec = [
            float(v)
            for v in emb.where(F.col("vec_id") == 2).head()["embedding"]
        ]
        before = {r.id for r in idx.topk(qvec, k=10).collect()}
        victims = sorted(before)[:3]
        assert idx.delete(victims) == 3
        assert idx.delete(victims) == 0  # idempotent
        logical = [(r.id, r.cos) for r in idx.topk(qvec, k=10).collect()]
        assert not ({i for i, _c in logical} & set(victims))
        assert len(logical) == 10  # pool refills from the same buckets
        assert idx.compact() == {"purged": 3}
        assert not os.path.isdir(os.path.join(idx.path, "tombstones"))
        physical = [(r.id, r.cos) for r in idx.topk(qvec, k=10).collect()]
        assert physical == logical
        # victims are physically gone from the table
        assert (
            idx.table().where(F.col("vec_id").isin(victims)).count() == 0
        )
        assert idx.table().count() == emb.count() - 3
        # partition column survived the rewrite (pruning still possible)
        assert idx._part_col in idx.table().columns
        assert idx.compact() == {"purged": 0}


def test_lsh_index_reopen_identical(spark, emb, lsh_index):
    """open() must reproduce build()'s results exactly (planes persisted)."""
    qvec = [float(v) for v in emb.where(F.col("vec_id") == 4).head()["embedding"]]
    reopened = similarity.LshIndex.open(spark, lsh_index.path)
    a = [(r.id, r.cos) for r in lsh_index.topk(qvec, k=10).collect()]
    b = [(r.id, r.cos) for r in reopened.topk(qvec, k=10).collect()]
    assert a == b


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


def test_dedup_components_chain_and_clique(spark):
    """Label propagation must collapse chains (A-B, B-C) and cliques into
    one component keyed by the minimum id, across multiple rounds."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # 4-chain -> component 1
         (10, 11), (10, 12), (11, 12),    # triangle -> component 10
         (20, 21)],                       # pair -> component 20
        "id1 long, id2 long",
    )
    comp = {r.id: r.component
            for r in dedup.dedup_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1,
                    10: 10, 11: 10, 12: 10,
                    20: 20, 21: 20}
    # empty input -> empty output
    assert dedup.dedup_components(pairs.where(F.lit(False))).count() == 0


def test_representatives_and_dedup_corpus(spark):
    """One survivor per duplicate cluster: the longest text wins, ties go
    to the smallest id; singletons never appear in the decision table and
    survive materialization untouched."""
    docs = spark.createDataFrame(
        [(1, "aa"), (2, "aaaa"), (3, "aa"),   # cluster {1,2,3}: 2 wins (longest)
         (10, "bb"), (11, "bb"),              # cluster {10,11}: tie -> 10
         (99, "solo")],                       # singleton, in no pair
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id1 long, id2 long"
    )
    reps = {
        r.id: (r.component, r.keep)
        for r in dedup.representatives(docs, pairs).collect()
    }
    assert reps == {1: (1, 0), 2: (1, 1), 3: (1, 0),
                    10: (10, 1), 11: (10, 0)}
    kept = {
        r.doc_id for r in dedup.dedup_corpus(docs, pairs).collect()
    }
    assert kept == {2, 10, 99}


def test_curated_corpus_materialization(spark, docs):
    """curated_corpus = decisions(keep=1) semi-join + PII scrub; reasons
    partition the corpus and precedence holds (a dup is 'near_dup' even
    if also low quality)."""
    from search_engine_spark.pipeline import curate

    d = docs.select("doc_id", "text")
    dec = curate.curate_decisions(
        d, min_quality=0.55, allowed_langs=("en",)
    ).cache()
    n = d.count()
    assert dec.count() == n  # one decision per doc
    by_reason = {
        r.reason: r["count"]
        for r in dec.groupBy("reason").count().collect()
    }
    assert by_reason.get("kept", 0) >= 1
    assert set(by_reason) <= {"kept", "near_dup", "lang", "low_quality"}
    assert all(
        (r.reason == "kept") == (r.keep == 1) for r in dec.collect()
    )
    out = curate.curated_corpus(
        d, min_quality=0.55, allowed_langs=("en",)
    )
    assert out.count() == by_reason.get("kept", 0)
    assert set(out.columns) == {"doc_id", "text"}
    dec.unpersist()


def test_contamination_report_and_decontaminated_corpus(spark):
    """A benchmark item's source doc (and a doc embedding the item's
    text verbatim) are flagged; unrelated docs survive; the curate
    integration reports 'benchmark' with highest precedence."""
    from search_engine_spark.pipeline import curate

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliett kilo lima"
    )
    d = spark.createDataFrame(
        [
            (1, base),  # source of the bench item
            (2, "prefix words then " + base + " and a suffix"),  # embeds it
            (3, "totally different words about completely other topics "
                "nothing shared here at all with anything else"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, base)], "bench_id long, bench_text string"
    )
    rep = curate.contamination_report(
        d, bench, shingle_k=3, min_overlap_frac=0.5
    )
    flagged = {(r.id, r.bench_id) for r in rep.collect()}
    assert flagged == {(1, 100), (2, 100)}
    self_hit = rep.where(F.col("id") == 1).head()
    assert self_hit.n_hit == self_hit.n_bench  # full containment
    assert self_hit.overlap_frac == 1.0

    kept = curate.decontaminated_corpus(
        d, bench, shingle_k=3, min_overlap_frac=0.5
    )
    assert {r.doc_id for r in kept.collect()} == {3}

    dec = curate.curate_decisions(
        d, bench=bench, contamination_kwargs={"shingle_k": 3}
    )
    reasons = {r.id: r.reason for r in dec.collect()}
    assert reasons[1] == "benchmark" and reasons[2] == "benchmark"
    assert reasons[3] == "kept"


def test_pack_assignments_match_naive_scan_and_mixture_sampling(spark):
    """Distributed two-level prefix sum == a naive sequential scan;
    mixture sampling honors degenerate weights and is deterministic."""
    from search_engine_spark.pipeline import packing

    d = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1), "a" if i % 3 else "b") for i in range(50)],
        "doc_id long, text string, lang string",
    )
    a = (
        packing.pack_assignments(d, seq_len=10, bucket_span=8)
        .orderBy("id")
        .collect()
    )
    assert len(a) == 50
    prefix = 0
    for r in a:  # naive concat-and-chop reference
        assert (r.pack_id, r.pack_offset) == (prefix // 10, prefix % 10)
        prefix += r.n_tokens
    st = {
        r.pack_id: r.n_docs_started
        for r in packing.pack_stats(
            packing.pack_assignments(d, seq_len=10, bucket_span=8)
        ).collect()
    }
    assert sum(st.values()) == 50
    assert max(st) == (prefix - a[-1].n_tokens) // 10

    keep_all_a = packing.mixture_sample(
        d, {"a": 1.0, "b": 0.0}, group_col="lang"
    )
    got = {r.lang for r in keep_all_a.collect()}
    assert got == {"a"} and keep_all_a.count() == sum(1 for i in range(50) if i % 3)
    half1 = packing.mixture_sample(d, {"a": 0.5, "b": 0.5}, group_col="lang")
    half2 = packing.mixture_sample(d, {"a": 0.5, "b": 0.5}, group_col="lang")
    ids1 = sorted(r.doc_id for r in half1.collect())
    assert ids1 == sorted(r.doc_id for r in half2.collect())  # deterministic
    assert 0 < len(ids1) < 50
    with pytest.raises(ValueError):
        packing.mixture_sample(d, {"a": 1.5}, group_col="lang")


def test_repetition_scores_line_and_word_modes(spark):
    from search_engine_spark.pipeline import textstats

    d = spark.createDataFrame(
        [
            (1, "buy now\nbuy now\nbuy now\nunique line"),
            (2, "all lines\ndiffer here\ncompletely so"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    r = {
        x.id: x
        for x in textstats.repetition_scores(d, "doc_id", "text").collect()
    }
    assert (r[1].n_units, r[1].n_distinct_units, r[1].top_unit_count) == (4, 2, 3)
    assert r[1].dup_unit_frac == 0.5 and r[1].top_unit_frac == 0.75
    assert r[2].dup_unit_frac == 0.0 and r[2].top_unit_count == 1
    assert (r[3].n_units, r[3].dup_unit_frac, r[3].top_unit_frac) == (0, 0.0, 0.0)
    # word mode: separator is a regex argument
    w = textstats.repetition_scores(
        d.where(F.col("doc_id") == 1), "doc_id", "text", unit_sep="[\\s]+"
    ).head()
    assert w.n_units == 8 and w.top_unit_count == 3  # 'buy'/'now' x3


def test_take_token_budget_is_greedy_best_first(spark, docs):
    """Kept set == the naive sort-by-(quality desc, id) greedy prefix;
    the straddling doc is kept whole, everything after it dropped."""
    from search_engine_spark.pipeline import packing, textstats

    budget = 3000
    kept = packing.take_token_budget(
        docs, budget, id_col="doc_id", text_col="text"
    ).collect()
    prof = textstats.quality_scores(docs, "doc_id", "text").collect()
    order = sorted(prof, key=lambda r: (-r.quality, r.id))
    naive, prefix = [], 0
    for r in order:
        if prefix >= budget:
            break
        naive.append((r.id, prefix))
        prefix += r.n_tokens
    assert {r.id for r in kept} == {i for i, _ in naive}
    assert {(r.id, r.prefix_tokens) for r in kept} == set(naive)
    assert sum(r.n_tokens for r in kept) >= budget  # straddler included


def test_pii_scrub_counts_and_redaction(spark):
    from search_engine_spark.pipeline import textstats

    rows = spark.createDataFrame(
        [
            (1, "email me at a.b+c@ex-1.example.org thanks"),
            (2, "hosts 10.0.0.7 and 192.168.10.250 up"),
            (3, "key deadbeefcafebabe0123456789abcdef end"),
            (4, "clean text, no pii here 1.2.3 deadbeef"),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in textstats.pii_scrub(rows, "doc_id", "text").collect()}
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_hex_secret) == (1, 0, 0)
    assert out[1].scrubbed == "email me at <email> thanks"
    assert out[2].n_ipv4 == 2
    assert out[2].scrubbed == "hosts <ipv4> and <ipv4> up"
    assert out[3].n_hex_secret == 1
    assert out[3].scrubbed == "key <hex_secret> end"
    # short version strings / short hex never match
    assert (out[4].n_email, out[4].n_ipv4, out[4].n_hex_secret) == (0, 0, 0)
    assert out[4].scrubbed == "clean text, no pii here 1.2.3 deadbeef"


def test_simhash_on_planted_dups(spark, docs):
    """Exact copies have identical SimHash (hamming 0) and are paired."""
    copies = docs.where(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 20_000
    )
    sims = dedup.simhash_table(docs.unionByName(copies), "doc_id", "text")
    pairs = dedup.simhash_near_pairs(sims, max_hamming=0).collect()
    found = {(r.id1, r.id2) for r in pairs}
    assert {(i, i + 20_000) for i in range(5)} <= found


def test_lsh_band_bucket_cap_bounds_planted_skew(spark, docs):
    """Plant a degenerate bucket (300 identical docs -> every band
    collides) and cap buckets at 50: the pair count must stay bounded by
    the organic near-dups, the oversize report must name the dropped
    buckets, and the identical mass must still be caught by exact dedup."""
    base = docs.limit(30)
    boiler = (
        spark.range(300)
        .select(
            (F.col("id") + 500_000).alias("doc_id"),
            F.lit("license header boilerplate " * 8).alias("text"),
        )
    )
    both = base.select("doc_id", "text").unionByName(boiler)
    sigs = dedup.minhash_signatures(both, "doc_id", "text")
    capped = dedup.lsh_candidate_pairs(sigs, max_bucket_size=50).collect()
    # 300 identical docs alone would emit 300*299/2 = 44,850 pairs
    assert len(capped) < 1000
    assert not any(r.id1 >= 500_000 and r.id2 >= 500_000 for r in capped)
    report = dedup.oversize_band_buckets(sigs, max_bucket_size=50).collect()
    assert len(report) >= 4  # all 4 bands of the boilerplate bucket
    assert all(r.n_docs == 300 for r in report)
    # the dropped mass is exactly what exact-dup grouping catches
    groups = dedup.exact_dup_groups(both, "doc_id", "text").collect()
    assert any(g.n_docs == 300 for g in groups)


def test_embed_ingest_shapes_and_invariants(spark, docs):
    """B13 plumbing: unit-norm truncated embeddings, batch-size- and
    partitioning-invariant, real-model names stubbed."""
    import numpy as np

    from search_engine_spark.pipeline import embeddings

    small = docs.limit(40)
    out = embeddings.embed_pipeline(
        small, title_col="source", model_dim=16, truncate_dim=8,
        batch_size=7,
    ).collect()
    assert len(out) == 40
    by_id = {}
    for r in out:
        v = np.array(r.embedding)
        assert v.shape == (8,)
        assert np.linalg.norm(v) == pytest.approx(1.0, rel=1e-9)
        by_id[r.id] = v
    # batch size and input partitioning must not change values
    out2 = embeddings.embed_pipeline(
        small.repartition(5), title_col="source", model_dim=16,
        truncate_dim=8, batch_size=32,
    ).collect()
    for r in out2:
        assert np.array_equal(np.array(r.embedding), by_id[r.id])
    # real model names raise without sentence-transformers; when the
    # package imports (or ref_harness stubbed it in sys.modules, which
    # other tests in the same session do) the seam returns a lazy
    # encoder instead — both are the designed behavior
    import sys

    if "sentence_transformers" not in sys.modules:
        try:
            import sentence_transformers  # noqa: F401
        except ImportError:
            with pytest.raises(NotImplementedError):
                embeddings.get_encoder("nomic-ai/nomic-embed-text-v1.5")
    else:
        assert callable(
            embeddings.get_encoder("nomic-ai/nomic-embed-text-v1.5")
        )
    # layer-norm twin of torch.nn.functional.layer_norm semantics —
    # direct numpy check on one synthetic text, independent of the table
    enc = embeddings.fake_md5_encoder(16)
    one = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    row = embeddings.embed_pipeline(
        one, title_col=None, model_dim=16, truncate_dim=8
    ).head()
    raw1 = enc(["search_document: hello"])[0]
    ln1 = (raw1 - raw1.mean()) / np.sqrt(raw1.var() + 1e-5)
    tr1 = ln1[:8]
    exp1 = tr1 / max(np.linalg.norm(tr1), 1e-12)
    assert np.allclose(np.array(row.embedding), exp1, rtol=1e-9)


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


def test_ivf_recall_vs_bruteforce(emb, ivf_index):
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
        approx = similarity.ivf_topk(ivf_index, qvec, k=10).collect()
        for r in approx:
            if r.id in exact_cos:
                assert r.cos == pytest.approx(exact_cos[r.id], rel=1e-12)
        hits += len(exact & {r.id for r in approx})
        total += len(exact)
    assert hits / total >= 0.6, f"recall {hits}/{total}"


def test_ivf_deterministic_across_builds(spark, emb, tmp_path_factory):
    """Two independent builds over differently-partitioned inputs must
    train identical centroids and return identical top-k (the quantizer
    sample is orderBy(id)-deterministic — ADVICE similarity.py:141)."""
    import numpy as np

    a = similarity.IvfIndex.build(
        emb, str(tmp_path_factory.mktemp("ivfa"))
    )
    b = similarity.IvfIndex.build(
        emb.repartition(7), str(tmp_path_factory.mktemp("ivfb"))
    )
    assert np.array_equal(a.centroids, b.centroids)
    qvec = [float(v) for v in emb.where(F.col("vec_id") == 1).head()["embedding"]]
    ra = [(r.id, r.cos) for r in a.topk(qvec, k=5).collect()]
    rb = [(r.id, r.cos) for r in b.topk(qvec, k=5).collect()]
    assert ra == rb


def test_minhash_kernel_bit_matches_expression_spec(docs):
    """The in-batch signature/shingle kernels must bit-match their JVM
    expression specifications (integer md5-prefix + modular math is
    exact in both runtimes) — same guarantee the ANN assigners have."""
    from pyspark.sql import functions as F

    sample = docs.limit(40)
    spec = {
        r.id: list(r.sig)
        for r in sample.select(
            F.col("doc_id").alias("id"),
            dedup.minhash_sig_col("text", 16, 3, 7).alias("sig"),
        ).collect()
    }
    got = {
        r.id: list(r.sig)
        for r in dedup.minhash_signatures(sample, "doc_id", "text").collect()
    }
    assert got == spec

    # shingle_table: same SETS as shingles_col (order is unspecified)
    spec_sh = {
        r.id: set(r.sh)
        for r in sample.select(
            F.col("doc_id").alias("id"),
            dedup.shingles_col("text", 3).alias("sh"),
        ).collect()
    }
    got_sh = {
        r.id: set(r.sh)
        for r in dedup.shingle_table(sample, "doc_id", "text", 3).collect()
    }
    assert got_sh == spec_sh


def test_text_profile_kernel_bit_matches_expression_spec(spark, docs):
    """text_profile (one Arrow pass for quality + lang) must bit-match
    the Catalyst expression specs — including float ratios and Spark's
    HALF_UP round(…, 6), which Python's half-even round does NOT give
    (the kernel goes through Decimal(repr(x)))."""
    from search_engine_spark.pipeline import textstats

    edge = spark.createDataFrame(
        [
            (9001, ""),                                # empty text
            (9002, "!!! ??? ,,,"),                     # punct-only
            (9003, "THE The the und der die est les"), # lang tie material
            (9004, "a" * 333),                         # one long token
            (9005, "the " * 77),                       # stop-ratio 1.0
        ],
        "doc_id long, text string",
    )
    sample = docs.select("doc_id", "text").limit(60).unionByName(edge)
    spec = {
        r["id"]: tuple(r)[1:]
        for r in sample.select(
            F.col("doc_id").alias("id"),
            *textstats.quality_cols("text"),
            *textstats.lang_cols("text"),
        ).collect()
    }
    got = {
        r["id"]: tuple(r)[1:]
        for r in textstats.text_profile(sample, "doc_id", "text").collect()
    }
    assert got == spec  # exact equality, floats included


def test_simhash_kernel_bit_matches_expression_spec(docs):
    from pyspark.sql import functions as F

    sample = docs.limit(40)
    spec = {
        r.id: r.simhash
        for r in sample.select(
            F.col("doc_id").alias("id"),
            dedup.simhash_col("text").alias("simhash"),
        ).collect()
    }
    got = {
        r.id: r.simhash
        for r in dedup.simhash_table(sample, "doc_id", "text").collect()
    }
    assert got == spec


def test_two_phase_components_match_label_propagation(spark):
    """Large-star/small-star labels == min-label propagation labels on
    random graphs (both = component-min contract)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(17)
    pairs = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    pdf = spark.createDataFrame(
        [(a, b) for a, b in pairs if a != b], "id1 long, id2 long"
    )
    want = {
        (r.id, r.component)
        for r in dedup.dedup_components(pdf, max_iter=50).collect()
    }
    got = {
        (r.id, r.component)
        for r in dedup.components_two_phase(pdf).collect()
    }
    assert got == want


def test_two_phase_components_handle_long_chains(spark):
    """A 400-node chain (diameter 399): label propagation at the default
    round budget correctly refuses; two-phase converges in O(log n)
    rounds with the right single component."""
    import pytest as _pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(399)], "id1 long, id2 long"
    )
    with _pytest.raises(RuntimeError, match="converge"):
        dedup.dedup_components(chain, max_iter=8)
    rows = dedup.components_two_phase(chain, max_iter=12).collect()
    assert len(rows) == 400
    assert {r.component for r in rows} == {0}


def test_fingerprints_kernel_bit_matches_expression_spec(spark, docs):
    from pyspark.sql import functions as F

    from search_engine_spark.pipeline import textstats as ts

    sample = docs.limit(40).unionByName(
        # short docs exercise the shorter-than-one-window path
        spark.createDataFrame(
            [(90001, "one two"), (90002, ""), (90003, "a b c d e f g")],
            "doc_id long, text string",
        ).withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .withColumn("n_chars", F.length("text")),
        allowMissingColumns=True,
    )
    spec = {
        r.id: (r.n_fingerprints, r.min_fp, r.max_fp)
        for r in sample.select(
            F.col("doc_id").alias("id"), *ts.fingerprints_cols("text")
        ).collect()
    }
    got = {
        r.id: (r.n_fingerprints, r.min_fp, r.max_fp)
        for r in ts.fingerprints(sample, "doc_id", "text").collect()
    }
    assert got == spec


def test_fake_decode_batch_bit_identical_to_rowwise():
    """The segmented-reduction batch kernel must reproduce the per-object
    fake decode exactly (including empty payloads and batch edges)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    payloads = [bytes(rng.integers(0, 256, size=int(n), dtype=np.uint8))
                for n in [0, 1, 2, 300, 257, 0, 4096, 17]]
    pdf = pd.DataFrame({"id": range(len(payloads)), "payload": payloads})
    got = multimodal._fake_decode_batch(pdf)
    for i, buf in enumerate(payloads):
        n, w, h, feat = multimodal._fake_decode(buf)
        row = got.iloc[i]
        assert (row["n_bytes"], row["width"], row["height"]) == (n, w, h)
        assert list(row["feat"]) == feat, (i, list(row["feat"]), feat)


def test_ann_compact_crash_between_renames_recovers(
    spark, emb, tmp_path_factory, monkeypatch
):
    """A crash in the middle of compact()'s directory swap (table moved
    to retired, staged copy not yet promoted) must be recoverable: open()
    finishes the swap, probes see the purged table, leftovers cleaned."""
    idx = similarity.LshIndex.build(
        emb, str(tmp_path_factory.mktemp("lshcrash"))
    )
    qvec = [
        float(v) for v in emb.where(F.col("vec_id") == 2).head()["embedding"]
    ]
    before = {r.id for r in idx.topk(qvec, k=10).collect()}
    victims = sorted(before)[:3]
    idx.delete(victims)

    real_rename = os.rename

    def crash_after_retire(a, b):
        real_rename(a, b)
        if os.path.basename(a) == "table":  # just retired the live table
            raise RuntimeError("injected crash")

    monkeypatch.setattr(os, "rename", crash_after_retire)
    with pytest.raises(RuntimeError, match="injected crash"):
        idx.compact()
    monkeypatch.undo()
    assert not os.path.isdir(os.path.join(idx.path, "table"))

    reopened = similarity.LshIndex.open(spark, idx.path)
    assert os.path.isdir(os.path.join(idx.path, "table"))
    assert not os.path.isdir(os.path.join(idx.path, "table_retired"))
    assert not os.path.isdir(os.path.join(idx.path, "table_compacting"))
    got = [(r.id, r.cos) for r in reopened.topk(qvec, k=10).collect()]
    assert not ({i for i, _c in got} & set(victims))
    assert (
        reopened.table().where(F.col("vec_id").isin(victims)).count() == 0
    )
