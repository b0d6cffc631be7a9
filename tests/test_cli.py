"""CLI end-to-end: build -> search (all modes incl. SEMANTIC) -> embed ->
ann-build -> make-dataset --train -> stream-ingest, sharing the test
session via getOrCreate."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark import cli
from search_engine_spark.testing.synth import synth_corpus


@pytest.fixture(scope="module")
def ws(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cliws")
    corpus_path = str(base / "corpus.parquet")
    spark.createDataFrame(synth_corpus(n_docs=100, seed=31)).write.parquet(
        corpus_path
    )
    return spark, base, corpus_path


def _run(capsys, argv):
    cli.main(argv)
    return capsys.readouterr().out


def test_cli_build_and_search(ws, capsys):
    spark, base, corpus_path = ws
    idx = str(base / "idx")
    out = _run(capsys, [
        "build", "--corpus", corpus_path, "--index", idx,
        "--chunk-docs", "64", "--chunks-per-batch", "2",
        "--term-buckets", "8",
    ])
    built = json.loads(out.strip().splitlines()[-1])
    assert built["stats"]["num_docs"] == 100
    out = _run(capsys, [
        "search", "--index", idx, "--query", "zqmerge", "--mode", "AND",
    ])
    assert "zqmerge" not in out or len(out.splitlines()) >= 1


def test_cli_embed_ann_semantic(ws, capsys):
    spark, base, corpus_path = ws
    idx = str(base / "idx")
    emb_path = str(base / "emb.parquet")
    out = _run(capsys, [
        "embed", "--corpus", corpus_path, "--output", emb_path,
        "--id-col", "path", "--body-col", "content",
        "--model-dim", "16", "--truncate-dim", "8",
    ])
    # path is a string id — re-emit with integer ids matching the index
    # (vec_id == doc_id): easiest via the docs table join
    from search_engine_spark.query.engine import SearchEngine
    from search_engine_spark.config import EngineConfig

    eng = SearchEngine(spark, idx, EngineConfig())
    docs = eng.store.read_docs().select("doc_id", "path")
    emb = spark.read.parquet(emb_path).join(
        docs, F.col("vec_id") == F.col("path")
    ).select(F.col("doc_id").alias("vec_id"), "embedding")
    emb_ids = str(base / "emb_ids.parquet")
    emb.write.parquet(emb_ids)

    ann_dir = str(base / "ann_lsh")
    out = _run(capsys, [
        "ann-build", "--embeddings", emb_ids, "--output", ann_dir,
        "--kind", "lsh",
    ])
    meta = json.loads(out.strip().splitlines()[-1])
    assert meta["kind"] == "lsh" and os.path.isdir(
        os.path.join(ann_dir, "table")
    )

    out = _run(capsys, [
        "search", "--index", idx, "--query", "zqmerge zqshard",
        "--mode", "SEMANTIC", "--embeddings", emb_ids,
        "--query-vec-id", "0", "--k", "5",
    ])
    assert "results in" not in out  # timing goes to stderr
    assert len([l for l in out.splitlines() if l.strip()]) >= 1


def test_cli_make_dataset_train(ws, capsys):
    spark, base, _corpus = ws
    docs_path = str(base / "docs_tbl.parquet")
    spark.createDataFrame(
        [(i, f"doc text tokens number {i} zq{i % 7}", f"src{i % 3}")
         for i in range(120)],
        "doc_id long, text string, source string",
    ).write.parquet(docs_path)
    out_dir = str(base / "dataset")
    out = _run(capsys, [
        "make-dataset", "--documents", docs_path, "--output", out_dir,
        "--train", "--epochs", "3",
    ])
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["train"] + summary["val"] + summary["test"] == 12
    assert os.path.exists(os.path.join(out_dir, "ranking_model.npz"))
    assert "mrr10" in summary
    assert os.path.isdir(os.path.join(out_dir, "train-split.parquet"))


def test_cli_make_dataset_engine_mined_and_trained_serving(ws, capsys):
    """Full loop: candidates mined from the index's own BM25 run ->
    trained weights -> served via search --rerank --model."""
    spark, base, _corpus_path = ws
    # a bigger unpruned index: queries must be able to reach 100
    # candidates for the full 12-rank pivot to survive the null filter
    big_corpus = str(base / "corpus_big.parquet")
    spark.createDataFrame(synth_corpus(n_docs=160, seed=41)).write.mode(
        "overwrite"
    ).parquet(big_corpus)
    idx = str(base / "idx_unpruned")
    _run(capsys, [
        "build", "--corpus", big_corpus, "--index", idx,
        "--chunk-docs", "64", "--chunks-per-batch", "2",
        "--term-buckets", "8", "--idf-threshold=-1e18",
    ])
    # docs table derived from the same corpus the index was built on,
    # so mined candidate doc ids line up with qrels doc ids
    from search_engine_spark.query.engine import SearchEngine
    from search_engine_spark.config import EngineConfig

    eng = SearchEngine(spark, idx, EngineConfig())
    docs_tbl = str(base / "docs_from_idx.parquet")
    corpus = spark.read.parquet(big_corpus)
    (
        eng.store.read_docs()
        .join(corpus, ["repo", "path", "commit"])
        .select(
            "doc_id", F.col("content").alias("text"),
            F.col("path").alias("source"),
        )
        .write.parquet(docs_tbl)
    )
    out_dir = str(base / "dataset_mined")
    out = _run(capsys, [
        "make-dataset", "--documents", docs_tbl, "--output", out_dir,
        "--index", idx, "--train", "--epochs", "2",
    ])
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["train"] + summary["val"] + summary["test"] >= 1
    weights = os.path.join(out_dir, "ranking_model.npz")
    assert os.path.exists(weights)
    out = _run(capsys, [
        "search", "--index", idx, "--query", "zqmerge zqshard",
        "--mode", "OR", "--rerank", "--model", weights, "--k", "5",
    ])
    assert len([l for l in out.splitlines() if l.strip()]) >= 1


def test_cli_stream_ingest(ws, capsys):
    spark, base, _corpus = ws
    src = str(base / "arrivals")
    rows = synth_corpus(n_docs=70, seed=33)
    spark.createDataFrame(rows).select(
        "repo", "path", "commit", "lang", "content"
    ).write.mode("append").parquet(src)
    out = _run(capsys, [
        "stream-ingest", "--source", src,
        "--index", str(base / "sidx"), "--staging", str(base / "sstg"),
        "--chunk-docs", "64", "--chunks-per-batch", "2",
        "--term-buckets", "8", "--final",
    ])
    res = json.loads(out.strip().splitlines()[-1])
    assert res["indexed"] == 70 and res["num_docs"] == 70


def test_cli_compose(ws, capsys):
    """mixture + token budget + packing end-to-end through the CLI."""
    spark, base, _corpus = ws
    src = str(base / "compose_in")
    spark.createDataFrame(
        [
            (i, " ".join(f"t{i}w{j}" for j in range(10)),
             "en" if i % 2 else "de")
            for i in range(40)
        ],
        "doc_id long, text string, lang string",
    ).write.parquet(src)
    out_dir = str(base / "compose_out")
    pack_dir = str(base / "compose_packs")
    out = _run(capsys, [
        "compose", "--input", src, "--output", out_dir,
        "--mixture", "en=1.0,de=0.0", "--token-budget", "120",
        "--pack-out", pack_dir, "--pack-seq-len", "50",
    ])
    res = json.loads(out.strip().splitlines()[-1])
    assert res["input_rows"] == 40
    # de dropped entirely; 10-token docs -> budget 120 keeps 12 en docs
    assert res["kept_rows"] == 12
    kept = spark.read.parquet(out_dir)
    assert kept.where(F.col("lang") == "de").count() == 0
    # 12 docs x 10 tokens / 50-token packs -> 3 packs
    assert res["n_packs"] == 3
    asn = spark.read.parquet(pack_dir)
    assert asn.count() == 12
    assert asn.agg(F.max("pack_id")).head()[0] == 2


def test_cli_curate(ws, capsys):
    spark, base, _corpus = ws
    src = str(base / "curate_in")
    base_text = (
        lambda i: "the and of to is "  # stopwords keep quality up
        + " ".join(f"w{i}x{j}" for j in range(12))
        + " mail me at bob@example.com"
    )
    docs = spark.createDataFrame(
        [(i, base_text(i)) for i in range(20)]
        + [(100, base_text(0) + " extra")],  # near-dup of doc 0
        "doc_id long, text string",
    )
    docs.write.parquet(src)
    out_dir = str(base / "curate_out")
    dec_dir = str(base / "curate_dec")
    out = _run(capsys, [
        "curate", "--input", src, "--output", out_dir,
        "--decisions", dec_dir, "--min-quality", "0.3",
    ])
    res = json.loads(out.strip().splitlines()[-1])
    assert res["input_rows"] == 21
    assert res["reasons"].get("near_dup") == 1  # the shorter twin drops
    assert res["kept_rows"] == res["input_rows"] - sum(
        v for k, v in res["reasons"].items() if k != "kept"
    )
    curated = spark.read.parquet(out_dir)
    assert curated.count() == res["kept_rows"]
    # PII scrub applied on the way out
    assert curated.where(F.col("text").contains("bob@example.com")).count() == 0
    assert spark.read.parquet(dec_dir).count() == 21

    # --bench: doc 5's text as an eval item drops doc 5 with reason
    # 'benchmark' (highest precedence), on top of the run above
    bench_dir = str(base / "curate_bench")
    spark.createDataFrame(
        [(900, base_text(5))], "bench_id long, bench_text string"
    ).write.parquet(bench_dir)
    out2_dir = str(base / "curate_out2")
    dec2_dir = str(base / "curate_dec2")
    out2 = _run(capsys, [
        "curate", "--input", src, "--output", out2_dir,
        "--decisions", dec2_dir, "--min-quality", "0.3",
        "--bench", bench_dir, "--bench-shingle-k", "3",
    ])
    res2 = json.loads(out2.strip().splitlines()[-1])
    assert res2["reasons"].get("benchmark", 0) >= 1
    dec2 = spark.read.parquet(dec2_dir)
    assert dec2.where(
        (F.col("id") == 5) & (F.col("reason") == "benchmark")
    ).count() == 1


def test_cli_repl(ws, capsys, monkeypatch):
    """The interactive query loop (reference main.py REPL twin): one warm
    engine, stdin-scripted queries, mid-session :mode/:k switches, parse
    errors don't kill the loop, :q exits."""
    import io

    spark, base, corpus_path = ws
    idx = str(base / "idx")  # built by test_cli_build_and_search
    monkeypatch.setattr(
        "sys.stdin",
        io.StringIO(
            "zqmerge\n"
            "\n"
            ":k 3\n"
            ":mode or\n"
            "zqmerge zqshard\n"
            "((bad\n"
            ":q\n"
        ),
    )
    out = _run(capsys, [
        "repl", "--index", idx, "--mode", "AND", "--corpus", corpus_path,
    ])
    lines = [l for l in out.splitlines() if l.strip()]
    assert lines, out
    # ranked rows: "rank  score  doc_id  repo/path | snippet"
    assert any("|" in l for l in lines)  # snippets joined from the corpus
    ranks = [int(l.split()[0]) for l in lines]
    assert ranks[0] == 1 and max(ranks) <= 10
    # after :k 3 the OR query returns at most 3 rows (trailing block)
    tail = [l for l in lines if l.split()[0].isdigit()]
    assert sum(1 for l in tail if l.split()[0] == "1") == 2  # two queries ran
