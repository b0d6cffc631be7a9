"""Benchmark harness: index-build throughput + query latency p50/p99.

Usage:
  python bench.py                      # one run at $SPARK_GRAFT_CPUS (def 32)
  python bench.py --cores 8            # pin core count
  python bench.py --scaling            # run at 8 and 32 cores (subprocesses),
                                       # report throughput + scaling efficiency

Input: ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) ``documents``
table, deterministically replicated ``$SPARK_GRAFT_REPLICAS`` (default 8)
times — same text, distinct (repo, path) — to give the build a real load
while keeping the term-skew profile.  No external data.

Prints ONE JSON line:
  {"metric": "index_build_docs_per_sec", "value": N, "unit": "docs/sec",
   "queries": {name: median_sec, ...}, "sf": F, ...extra detail keys...}

The north-star metrics covered: index-build docs/sec + postings/sec +
bytes compressed, query p50/p99 latency over the benchmark query set, and
(--scaling) throughput scaling efficiency between N and 4N cores — the
sandbox stand-in for N vs 4N executors (BASELINE.md §sandbox evidence).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_QUERIES = [
    ("term", "dup", "AND"),
    ("and2", "dup small", "AND"),
    ("and3", "scan merge sort", "AND"),
    ("or2", "dup small", "OR"),
    ("or4", "line group join order", "OR"),
    ("phrase", "batch batch", "PHRASE"),
    ("not", "dup", "NOT"),
    ("bool", "dup AND line OR group", "QUERY_EVALUATOR"),
]


def build_corpus(spark, sf_dir: str, replicas: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    return docs.crossJoin(rep).select(
        F.format_string("corpus/r%03d", F.col("rep")).alias("repo"),
        F.format_string("p%012d.txt", F.col("doc_id")).alias("path"),
        F.lit("c0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def run_bench(cores: int, sf_dir: str, replicas: int, repeats: int) -> dict:
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    from pyspark.sql import SparkSession

    from search_engine_spark.build.builder import IndexBuilder
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.plans.parser import SearchMode
    from search_engine_spark.query.engine import SearchEngine

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"se_bench_{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cfg = EngineConfig(
        tokenizer="simplemma",
        idf_threshold=-1.0e18,  # no pruning: queries do real scoring work
        chunk_docs=1 << 14,
        chunks_per_batch=64,  # one lineage batch up to ~1M docs
        n_term_buckets=16,
    )
    corpus = build_corpus(spark, sf_dir, replicas).cache()
    n_docs = corpus.count()  # materialize input before the clock starts

    index_dir = tempfile.mkdtemp(prefix=f"se_bench_{cores}_")
    try:
        builder = IndexBuilder(spark, index_dir, cfg)
        t0 = time.time()
        builder.build_docs(corpus)
        batch_metrics = builder.build_postings(corpus, resume=False)
        builder.finalize()
        build_wall = time.time() - t0
        n_postings = sum(m["n_postings"] for m in batch_metrics)
        n_bytes = sum(m["bytes_postings"] for m in batch_metrics)

        engine = SearchEngine(spark, index_dir, cfg)
        # warm up the scan paths once
        engine.search("dup", SearchMode.AND).collect()

        per_query: dict[str, float] = {}
        all_lat: list[float] = []
        for name, q, mode in BENCH_QUERIES:
            lats = []
            for _ in range(repeats):
                t = time.time()
                engine.search(q, SearchMode[mode]).collect()
                lats.append(time.time() - t)
            per_query[name] = statistics.median(lats)
            all_lat.extend(lats)
        all_lat.sort()
        p50 = statistics.median(all_lat)
        p99 = all_lat[min(len(all_lat) - 1, int(0.99 * len(all_lat)))]

        # batched throughput: all queries in one job
        t = time.time()
        engine.search_batch(
            [(q, SearchMode[mode]) for _, q, mode in BENCH_QUERIES]
        ).collect()
        batch_wall = time.time() - t
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()

    return {
        "cores": cores,
        "n_docs": int(n_docs),
        "build_wall_sec": round(build_wall, 3),
        "build_docs_per_sec": round(n_docs / build_wall, 1),
        "build_postings_per_sec": round(n_postings / build_wall, 1),
        "postings_bytes_compressed": int(n_bytes),
        "queries": {k: round(v, 4) for k, v in per_query.items()},
        "query_p50_sec": round(p50, 4),
        "query_p99_sec": round(p99, 4),
        "query_batch_all_sec": round(batch_wall, 4),
    }


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_REPLICAS", "8"))
    cores = args.cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if args.scaling:
        # same job, same input, two parallelism levels (sandbox stand-in
        # for N vs 4N executors — see BASELINE.md)
        results = {}
        for c in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--cores", str(c), "--json-only",
                 "--repeats", str(args.repeats)],
                capture_output=True, text=True, check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            results[c] = json.loads(line)
        thr8 = results[8]["detail"]["build_docs_per_sec"]
        thr32 = results[32]["detail"]["build_docs_per_sec"]
        eff = thr32 / (4.0 * thr8)
        summary = {
            "metric": "scaling_efficiency_8_to_32_cores",
            "value": round(eff, 3),
            "unit": "ratio",
            "sf": _sf_of(sf_dir),
            "build_docs_per_sec_8": thr8,
            "build_docs_per_sec_32": thr32,
            "detail": {str(c): r["detail"] for c, r in results.items()},
        }
        print(json.dumps(summary))
        return

    detail = run_bench(cores, sf_dir, replicas, args.repeats)
    result = {
        "metric": "index_build_docs_per_sec",
        "value": detail["build_docs_per_sec"],
        "unit": "docs/sec",
        "queries": detail["queries"],
        "sf": _sf_of(sf_dir),
        "query_p50_sec": detail["query_p50_sec"],
        "query_p99_sec": detail["query_p99_sec"],
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
