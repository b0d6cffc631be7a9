"""5.12M-doc compaction anchor: 5-batch index -> compact() -> 1 batch.

Measures query latency on the multi-batch layout, compaction wall +
postings/s, vacuum wall, and query latency on the compacted layout.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)

from pyspark.sql import SparkSession, functions as F

from search_engine_spark.build.builder import IndexBuilder
from search_engine_spark.config import EngineConfig
from search_engine_spark.plans.parser import SearchMode
from search_engine_spark.query.engine import SearchEngine

QUERIES = [
    ("term", "dup", "AND"),
    ("and2", "dup small", "AND"),
    ("and3", "scan merge sort", "AND"),
    ("or2", "dup small", "OR"),
    ("or4", "line group join order", "OR"),
    ("phrase", "batch batch", "PHRASE"),
    ("not", "dup", "NOT"),
    ("bool", "dup AND line OR group", "QUERY_EVALUATOR"),
]

spark = (
    SparkSession.builder.master("local[32]")
    .appName("se_scale5m_compact")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.task.cpus", "2")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

sf_dir = "/root/testdata/sf0.1"
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
rep = spark.range(1024).select(F.col("id").alias("rep"))
corpus = (
    docs.crossJoin(rep)
    .repartition(128)
    .select(
        F.format_string("corpus/r%03d", F.col("rep")).alias("repo"),
        F.format_string("p%012d.txt", F.col("doc_id")).alias("path"),
        F.lit("c0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    .cache()
)
n_docs = corpus.count()
print("corpus rows", n_docs, flush=True)

cfg = EngineConfig(
    tokenizer="simplemma",
    idf_threshold=-1.0e18,
    chunk_docs=1 << 14,
    chunks_per_batch=64,
    build_concurrency=3,
    n_term_buckets=16,
)
index_dir = "/tmp/se_idx_5m_compact"
import shutil

shutil.rmtree(index_dir, ignore_errors=True)
builder = IndexBuilder(spark, index_dir, cfg)
t0 = time.time()
builder.build_docs(corpus)
metrics = builder.build_postings(corpus, resume=False)
builder.finalize()
build_wall = time.time() - t0
n_postings = sum(m["n_postings"] for m in metrics)
print("build", round(build_wall, 1), "s;", len(metrics), "batches;",
      n_postings, "postings", flush=True)


def query_pass(tag):
    engine = SearchEngine(spark, index_dir, cfg)
    engine.search("dup", SearchMode.AND).collect()  # warm
    per = {}
    lats = []
    for name, q, mode in QUERIES:
        ls = []
        for _ in range(3):
            t = time.time()
            engine.search(q, SearchMode[mode]).collect()
            ls.append(time.time() - t)
        per[name] = round(statistics.median(ls), 4)
        lats.extend(ls)
    lats.sort()
    p50 = statistics.median(lats)
    p99 = lats[min(len(lats) - 1, int(0.99 * len(lats)))]
    print(tag, "p50", round(p50, 3), "p99", round(p99, 3), per, flush=True)
    return {"per_query": per, "p50": round(p50, 4), "p99": round(p99, 4)}


before = query_pass("before-compact")

t0 = time.time()
cres = builder.compact()
compact_wall = time.time() - t0
t0 = time.time()
vres = builder.vacuum()
vacuum_wall = time.time() - t0
print("compact", round(compact_wall, 1), "s; vacuum",
      round(vacuum_wall, 1), "s", cres, vres, flush=True)

after = query_pass("after-compact")

out = {
    "corpus_rows": n_docs,
    "n_batches_before": len(metrics),
    "n_postings": n_postings,
    "build_conc3_wall_sec": round(build_wall, 2),
    "queries_before_compact": before,
    "compact_wall_sec": round(compact_wall, 2),
    "compact_postings_per_sec": round(n_postings / compact_wall, 1),
    "vacuum_wall_sec": round(vacuum_wall, 2),
    "compact_result": {k: v for k, v in cres.items() if not hasattr(v, "collect")},
    "queries_after_compact": after,
}
with open("/tmp/scale5m_compact.json", "w") as f:
    json.dump(out, f, indent=1, default=str)
print(json.dumps(out, default=str), flush=True)
spark.stop()
