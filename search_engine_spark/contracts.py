"""Driver-contract queries: Spark engine vs DuckDB-SQL oracle.

Each entry pairs a ``(spark, sf_dir) -> DataFrame`` callable with an ANSI/
DuckDB SQL string over the same parquet tables; the driver compares
row-count + schema + value-hash at sf=0.01 (``CORRECTNESS_r{N}.json``).

The contract index is built over the driver's ``documents`` table mapped
to the corpus input shape with:

* ``tokenizer="simple"`` — ``[a-z0-9_]+`` over lowercased text, exactly
  ``regexp_extract_all(lower(text), '[a-z0-9_]+')`` in DuckDB, so the SQL
  oracle tokenizes identically;
* zero-padded paths (``p%012d.txt``) so the engine's dense
  ``(repo, path, commit)`` doc-id order equals the source ``doc_id``;
* IDF-threshold pruning disabled (the synthetic vocabulary is tiny, so
  nearly every term would be pruned; parity of the *pruning* semantics is
  covered by the oracle fixture tests, not the SQL contract).

Float-parity rules baked into the SQL strings:

* per-term BM25 contributions are combined with an explicit left-to-right
  ``+`` chain (one join per term), matching the engine's column-order
  summation — never an aggregate ``SUM`` whose order is unspecified;
* constants are written as the same expressions the engine evaluates
  (``1.6 + 1.0``, ``1.0 - 0.75``) so both sides fold to identical doubles;
* scores are rounded to 6 decimals on both sides (the only remaining
  divergence is sub-ulp noise from division ordering, ~1e-15 relative).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.plans.parser import SearchMode

# contract scoring constants (= engine defaults, inlined into SQL below)
K1 = 1.6
B = 0.75

CONTRACT_CONFIG = EngineConfig(
    tokenizer="simple",
    idf_threshold=-1.0e18,   # disable pruning for SQL-oracle coverage
    chunk_docs=1024,
    chunks_per_batch=8,
    n_term_buckets=8,
    block_docs=128,
)

_ENGINES: dict[str, object] = {}

_TOK_SQL = "regexp_extract_all(lower(text), '[a-z0-9_]+')"

# shared CTE prologue for scoring oracles
_SCORE_CTES = f"""
WITH tokl AS (
  SELECT doc_id, {_TOK_SQL} AS l FROM documents
),
dl AS (SELECT doc_id, len(l)::BIGINT AS dl FROM tokl),
st AS (SELECT count(*)::BIGINT AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
flat AS (SELECT doc_id, unnest(l) AS tok FROM tokl),
tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM flat GROUP BY doc_id, tok),
dfs AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok)
"""


def _contrib_sql(term: str) -> str:
    """One term's BM25 contribution as a scalar correlated to c.doc_id/d.dl.

    Mirrors ``functions/bm25.py``: idf = ln((n-df+0.5)/(df+0.5)),
    w = tf / (1-b + b*dl/avgdl) (title tf is 0 by construction),
    contribution = idf * (w*(k1+1)) / (w+k1).
    """
    return f"""
      COALESCE((
        SELECT ln((st.n - dfs.df + 0.5) / (dfs.df + 0.5))
               * ((tf.tf / ((1.0 - {B}) + {B} * (d.dl / st.avgdl))) * ({K1} + 1.0))
               / ((tf.tf / ((1.0 - {B}) + {B} * (d.dl / st.avgdl))) + {K1})
        FROM tf JOIN dfs ON dfs.tok = tf.tok
        WHERE tf.doc_id = c.doc_id AND tf.tok = '{term}'
      ), 0.0)"""


def _score_chain(terms: list[str]) -> str:
    """Left-to-right ``+`` chain of per-term contributions (engine column
    order; IEEE addition is commutative but not associative, so order is
    pinned)."""
    parts = [_contrib_sql(t) for t in terms]
    chain = parts[0]
    for p in parts[1:]:
        chain = f"({chain} + {p})"
    return chain


def corpus_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver ``documents`` table -> the engine's corpus input shape
    (BASELINE.json input_hint), preserving doc_id order via zero-padded
    paths."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.lit("corpus").alias("repo"),
        F.format_string("p%012d.txt", F.col("doc_id")).alias("path"),
        F.lit("c0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def get_engine(spark: SparkSession, sf_dir: str):
    """Build (or reuse) the contract index for an sf dir; returns
    SearchEngine.  Builds are resumable, so a cached partial build
    completes instead of restarting."""
    from search_engine_spark.build.builder import IndexBuilder
    from search_engine_spark.query.engine import SearchEngine

    key = os.path.abspath(sf_dir)
    if key in _ENGINES:
        return _ENGINES[key]
    # bump LAYOUT_V whenever the on-disk index layout changes — a stale
    # cached dir under /tmp from an older layout must not be reused
    LAYOUT_V = "v2-doclens-in-postings"
    tag = hashlib.sha256(f"{key}|{LAYOUT_V}".encode()).hexdigest()[:12]
    index_dir = os.path.join(tempfile.gettempdir(), f"se_contract_{tag}")
    builder = IndexBuilder(spark, index_dir, CONTRACT_CONFIG)
    corpus = corpus_from_documents(spark, sf_dir)
    if not os.path.isdir(os.path.join(index_dir, "stats")):
        builder.build_all(corpus, resume=True)
    engine = SearchEngine(spark, index_dir, CONTRACT_CONFIG)
    _ENGINES[key] = engine
    return engine


def _ranked(engine, query: str, mode: SearchMode, k: int) -> DataFrame:
    out = engine.search(query, mode, num_return=k)
    return out.select(
        F.col("doc_id"),
        F.round(F.col("score"), 6).alias("score"),
    )


# ---------------------------------------------------------------- queries

TERM_LIST = ["dup", "batch", "stream", "spark", "window", "scan", "zzzmissing"]


def q_docs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs table: dense ids, token doc_len, per-row sha256 invariant."""
    engine = get_engine(spark, sf_dir)
    lens = engine.store.read_doc_lens()
    return engine.store.read_docs().join(lens, "doc_id").select(
        "doc_id", F.col("doc_len").cast("long").alias("doc_len"), "sha256"
    )


SQL_DOCS_TABLE = f"""
SELECT doc_id,
       len({_TOK_SQL})::BIGINT AS doc_len,
       sha256(text) AS sha256
FROM documents
"""


def q_collection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    engine = get_engine(spark, sf_dir)
    s = engine.stats
    return spark.createDataFrame(
        [
            (
                int(s["num_docs"]),
                float(s["avg_doc_len"]),
                int(s["max_doc_len"]),
                int(s["total_postings"]),
            )
        ],
        "num_docs long, avg_doc_len double, max_doc_len long, total_postings long",
    )


# title tokens ('p%012d', 'txt') add exactly 2 postings per doc
SQL_COLLECTION_STATS = f"""
WITH tokl AS (SELECT doc_id, {_TOK_SQL} AS l FROM documents),
pairs AS (SELECT DISTINCT doc_id, unnest(l) AS tok FROM tokl)
SELECT (SELECT count(*) FROM documents)::BIGINT AS num_docs,
       (SELECT sum(len(l)) FROM tokl)::DOUBLE
         / (SELECT count(*) FROM documents) AS avg_doc_len,
       (SELECT max(len(l)) FROM tokl)::BIGINT AS max_doc_len,
       ((SELECT count(*) FROM pairs)
        + 2 * (SELECT count(*) FROM documents))::BIGINT AS total_postings
"""


def q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency for a fixed probe-term list, from the index's
    term_stats table (validates the distributed posting merge)."""
    engine = get_engine(spark, sf_dir)
    return (
        engine.store.read_term_stats()
        .where(F.col("term").isin(TERM_LIST))
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
    )


SQL_TERM_DF = f"""
WITH flat AS (
  SELECT DISTINCT doc_id, unnest({_TOK_SQL}) AS tok FROM documents
)
SELECT tok AS term, count(*)::BIGINT AS df
FROM flat
WHERE tok IN ({", ".join(repr(t) for t in TERM_LIST)})
GROUP BY tok
"""


def q_search_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked free-text OR retrieval (block-max WAND path), top-20."""
    return _ranked(get_engine(spark, sf_dir), "dup small", SearchMode.OR, 20)


SQL_SEARCH_OR = (
    _SCORE_CTES
    + f"""
SELECT c.doc_id, round({_score_chain(["dup", "small"])}, 6)::DOUBLE AS score
FROM (SELECT DISTINCT doc_id FROM tf WHERE tok IN ('dup', 'small')) c
JOIN dl d ON d.doc_id = c.doc_id, st
ORDER BY {_score_chain(["dup", "small"])} DESC, c.doc_id
LIMIT 20
"""
)


def q_search_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ranked(get_engine(spark, sf_dir), "dup small", SearchMode.AND, 20)


SQL_SEARCH_AND = (
    _SCORE_CTES
    + f"""
SELECT c.doc_id, round({_score_chain(["dup", "small"])}, 6)::DOUBLE AS score
FROM (SELECT doc_id FROM tf WHERE tok = 'dup'
      INTERSECT SELECT doc_id FROM tf WHERE tok = 'small') c
JOIN dl d ON d.doc_id = c.doc_id, st
ORDER BY {_score_chain(["dup", "small"])} DESC, c.doc_id
LIMIT 20
"""
)


def q_search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase query "batch batch" (adjacent positions), top-20."""
    return _ranked(
        get_engine(spark, sf_dir), "batch batch", SearchMode.PHRASE, 20
    )


# phrase columns are [batch, batch] -> score = c + c
SQL_SEARCH_PHRASE = (
    _SCORE_CTES
    + f""",
pos AS (
  SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS p FROM tokl
),
hits AS (
  SELECT DISTINCT a.doc_id
  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
  WHERE a.tok = 'batch' AND b.tok = 'batch'
)
SELECT c.doc_id,
       round(({_contrib_sql("batch")} + {_contrib_sql("batch")}), 6)::DOUBLE AS score
FROM hits c JOIN dl d ON d.doc_id = c.doc_id, st
ORDER BY ({_contrib_sql("batch")} + {_contrib_sql("batch")}) DESC, c.doc_id
LIMIT 20
"""
)


def q_search_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT query: complement of 'dup', reference semantics (zero scores,
    ascending doc ids), top-20."""
    return _ranked(get_engine(spark, sf_dir), "dup", SearchMode.NOT, 20)


SQL_SEARCH_NOT = f"""
WITH flat AS (SELECT DISTINCT doc_id, unnest({_TOK_SQL}) AS tok FROM documents)
SELECT doc_id, 0.0::DOUBLE AS score
FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM flat WHERE tok = 'dup')
ORDER BY doc_id
LIMIT 20
"""


def q_search_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean query language: (dup AND line) OR group — shunting-yard
    precedence AND > OR; scoring columns in leaf order [dup, line, group]."""
    return _ranked(
        get_engine(spark, sf_dir),
        "dup AND line OR group",
        SearchMode.QUERY_EVALUATOR,
        20,
    )


SQL_SEARCH_BOOLEAN = (
    _SCORE_CTES
    + f"""
SELECT c.doc_id,
       round({_score_chain(["dup", "line", "group"])}, 6)::DOUBLE AS score
FROM (
  SELECT doc_id FROM (
    SELECT doc_id FROM tf WHERE tok = 'dup'
    INTERSECT SELECT doc_id FROM tf WHERE tok = 'line'
  )
  UNION SELECT doc_id FROM tf WHERE tok = 'group'
) c
JOIN dl d ON d.doc_id = c.doc_id, st
ORDER BY {_score_chain(["dup", "line", "group"])} DESC, c.doc_id
LIMIT 20
"""
)


def q_streaming_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-ingest twin of the docs_table contract: the corpus
    arrives through readStream -> exactly-once staging ->
    StreamingIndexer.advance(final=True); the resulting docs table (dense
    ids + sha256) must hash-match the same SQL oracle shape the batch
    build satisfies (single-wave arrival => arrival order == sort
    order)."""
    import shutil

    from search_engine_spark.streaming import StreamingIndexer

    key = os.path.abspath(sf_dir)
    tag = hashlib.sha256(f"{key}|stream|v1".encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"se_stream_{tag}")
    index_dir = os.path.join(base, "idx")
    indexer = StreamingIndexer(
        spark, index_dir, os.path.join(base, "stg"), CONTRACT_CONFIG
    )
    if not os.path.isdir(os.path.join(index_dir, "stats")):
        shutil.rmtree(base, ignore_errors=True)
        src = os.path.join(base, "arrivals")
        corpus_from_documents(spark, sf_dir).write.mode("overwrite").parquet(
            src
        )
        from search_engine_spark.sources.corpus import CORPUS_SCHEMA

        stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(src)
        indexer.start(stream, available_now=True)
        indexer.advance(final=True)
    return indexer.builder.store.read_docs().select(
        "doc_id", "path", "sha256"
    )


SQL_STREAMING_DOCS = """
SELECT doc_id,
       printf('p%012d.txt', doc_id) AS path,
       sha256(text) AS sha256
FROM documents
"""


def q_search_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic+traditional blend (Q26): ANN cosine candidates -> BM25
    features + seeded MLP -> min-max blend cos_norm + (e^mlp_norm - 1).
    Rows-only contract (the MLP head is not SQL-expressible); the blend
    math is rank-identity-tested against a numpy oracle in
    tests/test_semantic.py."""
    engine = get_engine(spark, sf_dir)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qvec = [
        float(v)
        for v in emb.where(F.col("vec_id") == 0).head()["embedding"]
    ]
    out = engine.semantic_search(
        "dup small", qvec, embeddings=emb,
        num_semantic_candidates=50, num_return=10,
    )
    return out.select(
        "doc_id", F.round(F.col("score"), 6).alias("score"), "rank"
    )


CORE_QUERIES = {
    "streaming_ingest_docs": (q_streaming_docs, SQL_STREAMING_DOCS),
    "search_semantic_topk": (q_search_semantic, None),
    "docs_table": (q_docs_table, SQL_DOCS_TABLE),
    "collection_stats": (q_collection_stats, SQL_COLLECTION_STATS),
    "term_df": (q_term_df, SQL_TERM_DF),
    "search_or_topk": (q_search_or, SQL_SEARCH_OR),
    "search_and_topk": (q_search_and, SQL_SEARCH_AND),
    "search_phrase_topk": (q_search_phrase, SQL_SEARCH_PHRASE),
    "search_not_topk": (q_search_not, SQL_SEARCH_NOT),
    "search_boolean_topk": (q_search_boolean, SQL_SEARCH_BOOLEAN),
}
