"""spark-submit entry point.

Cluster launch (the north-star deployment shape)::

  zip -r se_spark.zip search_engine_spark
  spark-submit --py-files se_spark.zip -m ... \
      cli.py build --corpus s3://bucket/corpus --index s3://bucket/index
  spark-submit --py-files se_spark.zip \
      cli.py search --index s3://bucket/index --query "dup AND line" --mode QUERY_EVALUATOR

Local smoke::

  python -m search_engine_spark.cli build --corpus /root/testdata/... --index /tmp/idx

The session comes from ``SparkSession.builder.getOrCreate()`` so all
cluster sizing (executors, memory, shuffle partitions) flows in from
spark-submit / spark-defaults; the engine only sets Arrow on.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _spark(app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName(app)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def cmd_build(args: argparse.Namespace) -> None:
    from search_engine_spark.build.builder import IndexBuilder
    from search_engine_spark.config import EngineConfig

    spark = _spark("se-build")
    cfg = EngineConfig(
        tokenizer=args.tokenizer,
        chunk_docs=args.chunk_docs,
        chunks_per_batch=args.chunks_per_batch,
        n_term_buckets=args.term_buckets,
    )
    corpus = spark.read.parquet(args.corpus)
    builder = IndexBuilder(spark, args.index, cfg)
    t0 = time.time()
    builder.build_docs(corpus)
    metrics = builder.build_postings(
        corpus, resume=not args.no_resume, max_batches=args.max_batches
    )
    stats = builder.finalize()
    if args.trigrams:
        builder.build_trigrams()
    wall = time.time() - t0
    n_docs = sum(m["n_docs"] for m in metrics)
    print(
        json.dumps(
            {
                "built_batches": [m["batch_id"] for m in metrics],
                "n_docs_this_run": n_docs,
                "docs_per_sec": round(n_docs / wall, 1) if wall else None,
                "stats": stats,
            }
        )
    )


def cmd_search(args: argparse.Namespace) -> None:
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.plans.parser import SearchMode
    from search_engine_spark.query.engine import SearchEngine

    spark = _spark("se-search")
    cfg = EngineConfig(
        tokenizer=args.tokenizer, enable_spelling=args.spelling
    )
    engine = SearchEngine(spark, args.index, cfg)
    mode = SearchMode[args.mode]
    t0 = time.time()
    if args.rerank:
        ranked = engine.search_reranked(args.query, mode, num_return=args.k)
    else:
        ranked = engine.search(args.query, mode, num_return=args.k)
    out = engine.with_doc_info(ranked).collect()
    wall = time.time() - t0
    for r in out:
        print(f"{r.rank:3d}  {r.score:12.6f}  {r.doc_id:10d}  {r.repo}/{r.path}")
    print(f"-- {len(out)} results in {wall:.3f}s", file=sys.stderr)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="search_engine_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build/resume the index")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--tokenizer", default="simplemma")
    b.add_argument("--chunk-docs", type=int, default=1 << 17)
    b.add_argument("--chunks-per-batch", type=int, default=64)
    b.add_argument("--term-buckets", type=int, default=32)
    b.add_argument("--max-batches", type=int, default=None)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--trigrams", action="store_true")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="query a built index")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument(
        "--mode",
        default="QUERY_EVALUATOR",
        choices=["AND", "OR", "NOT", "PHRASE", "QUERY_EVALUATOR"],
    )
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--tokenizer", default="simplemma")
    s.add_argument("--rerank", action="store_true")
    s.add_argument("--spelling", action="store_true")
    s.set_defaults(fn=cmd_search)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
