"""20.48M-doc anchor: sf0.1 documents x4096, pipelined lineage batches.

Same protocol as the 5.12M anchor (bench_runs/scale5m_compact.py) one
notch up: 20 bounded lineage batches (~1.05M docs each) submitted 3-wide,
then the headline ranked-query set.  Corpus is NOT cached (recomputing
the crossJoin is cheaper than 40+ GB of executor storage at this scale).
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
    .appName("se_scale20m")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.task.cpus", "2")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

sf_dir = "/root/testdata/sf0.1"
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
rep = spark.range(4096).select(F.col("id").alias("rep"))
corpus = (
    docs.crossJoin(rep)
    .repartition(256)
    .select(
        F.format_string("corpus/r%04d", F.col("rep")).alias("repo"),
        F.format_string("p%012d.txt", F.col("doc_id")).alias("path"),
        F.lit("c0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
)
# materialize as the production input shape: a parquet table sorted by
# (repo, path) so the builder's per-batch key-range filter prunes files
# (the in-memory crossJoin can't push filters, so each batch would
# rescan the whole synthetic corpus -- a harness artifact, not engine cost)
corpus_path = "/tmp/se_corpus_20m.parquet"
# _SUCCESS marker (not bare dir existence) gates the cache: a run killed
# mid-write leaves a partial dir that must be rebuilt, not benchmarked
if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
    t = time.time()
    corpus.orderBy("repo", "path").write.mode("overwrite").parquet(corpus_path)
    print("corpus materialize", round(time.time() - t, 1), "s", flush=True)
corpus = spark.read.parquet(corpus_path)
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
index_dir = "/tmp/se_idx_20m"
import shutil

shutil.rmtree(index_dir, ignore_errors=True)
builder = IndexBuilder(spark, index_dir, cfg)
t0 = time.time()
builder.build_docs(corpus)
docs_wall = time.time() - t0
t1 = time.time()
metrics = builder.build_postings(corpus, resume=False)
postings_wall = time.time() - t1
t1 = time.time()
builder.finalize()
finalize_wall = time.time() - t1
build_wall = time.time() - t0
n_postings = sum(m["n_postings"] for m in metrics)
n_bytes = sum(m.get("bytes_postings", 0) for m in metrics)
print("build", round(build_wall, 1), "s;", len(metrics), "batches;",
      n_postings, "postings", flush=True)

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
out = {
    "corpus_rows": n_docs,
    "n_batches": len(metrics),
    "n_postings": n_postings,
    "postings_bytes_compressed": int(n_bytes),
    "build_wall_sec": round(build_wall, 2),
    "build_docs_per_sec": round(n_docs / build_wall, 1),
    "build_postings_per_sec": round(n_postings / build_wall, 1),
    "phases": {
        "docs_sec": round(docs_wall, 2),
        "postings_sec": round(postings_wall, 2),
        "finalize_sec": round(finalize_wall, 2),
    },
    "queries": per,
    "query_p50_sec": round(statistics.median(lats), 4),
    "query_p99_sec": round(lats[min(len(lats) - 1, int(0.99 * len(lats)))], 4),
}
with open("/tmp/scale20m.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
spark.stop()
