"""Offline training-dataset pipeline — Spark twin of the reference's
dataset-preparation scripts:

* ``/root/reference/create-dataset.py`` — qrels ⋈ queries ⋈ docs join
  (:29), top/bottom candidate filter (:52), rank pivot (:57), per-rank
  negatives join (:99-113), match-label coalesce (:67-71), row index (:74);
* ``/root/reference/create-dataset-features.py:109-363`` — offline
  10-feature extraction (BM25 fielded/body/title, first-occurrence
  mean/min, length norms, in_title) over raw (query, document) text;
* ``/root/reference/create-dataset-negatives.ipynb`` — fill_null(0) on the
  length norms, 12-way join of per-rank feature frames on ``index``,
  seeded shuffle + 80/10/10 split.

Spark-first deviations (semantics preserved, plan shape changed):

* the reference materializes 12 per-rank TSVs and joins 12 frames on
  ``index``; here the 12 negative columns are **melted** into one long
  frame, joined against the docs table ONCE, featurized once, and pivoted
  back — one shuffle join + one pivot aggregation instead of 12 joins,
  identical wide output;
* the split is a **deterministic md5-hash split** rather than the
  notebook's seeded global shuffle + slice: a global shuffle is a total
  order over the dataset (single-partition sort at 10^12 rows) and
  Spark's ``randomSplit`` re-samples per partitioning; the hash split is
  reproducible cell-by-cell on any cluster layout and in the DuckDB
  oracle.  Fractions are honoured in expectation exactly as the
  reference's slicing honours them exactly.

Everything is JVM-side expressions (no Python UDFs): tokenization is
``regexp_extract_all``, per-token tf/first-occurrence are higher-order
array functions, BM25 is a left-to-right ``aggregate`` over
``zip_with`` — the same accumulation order as the reference's token-order
sum (``fielded_bm25_score``, create-dataset-features.py:40-50, which
skips idf==0 tokens: adding their 0.0 contribution is bit-identical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# reference create-dataset.py:64 — 6 hard (top) + 6 easy (bottom) negatives
TARGET_RANKS = [1, 2, 3, 4, 5, 6, 95, 96, 97, 98, 99, 100]

FEATURE_COLUMNS = [  # reference ranking_model/utils/dataset.py:5-16
    "bm25_score",
    "bm25_score_body",
    "bm25_score_title",
    "body_first_occurrence_mean",
    "title_first_occurrence_mean",
    "body_first_occurrence_min",
    "title_first_occurrence_min",
    "body_length_norm",
    "title_length_norm",
    "in_title",
]

TOKEN_RE = "[a-z0-9_]+"


def tokens_col(col: str | Column, regex: str = TOKEN_RE) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(regex), 0)


# ------------------------------------------------------------ D2: joins

def join_train(
    docs: DataFrame, qrels: DataFrame, queries: DataFrame
) -> DataFrame:
    """docs ⋈ qrels on docid ⋈ queries on queryid
    (create-dataset.py:29).  qrels/queries are tiny next to docs —
    broadcast them so the docs scan never shuffles."""
    return docs.join(F.broadcast(qrels), "docid").join(
        F.broadcast(queries), "queryid"
    )


# ------------------------------------------------------------ D4: pivot

def rank_pivot(
    top100: DataFrame, ranks: list[int] | None = None
) -> DataFrame:
    """Candidate ranks -> one column per rank holding the docid
    (create-dataset.py:52-57): filter to the target ranks, then
    ``groupBy(queryid).pivot(rank)``.  Column names are the rank numbers
    as strings, like the reference's polars pivot."""
    ranks = ranks or TARGET_RANKS
    return (
        top100.where(F.col("rank").isin(ranks))
        .groupBy("queryid")
        .pivot("rank", ranks)
        .agg(F.first("docid"))
    )


# ------------------------------------------------------------ D5: labels

def label_matches(df: DataFrame, target_cols: list[str]) -> DataFrame:
    """match = name of the rank column whose docid equals the relevant
    docid, else null (create-dataset.py:67-71's when/coalesce chain)."""
    match = F.coalesce(
        *[
            F.when(F.col("docid") == F.col(f"`{c}`"), F.lit(c))
            for c in target_cols
        ]
    )
    return df.withColumn("match", match)


# ------------------------------------------------------------ D6: row index

def with_row_index(
    df: DataFrame, order_cols: list[str], name: str = "index"
) -> DataFrame:
    """Deterministic dense 0-based row index ordered by ``order_cols``
    (create-dataset.py:74).  A global ``row_number`` window is a
    single-partition sort — acceptable here because the frame is one row
    per qrel (queries, not documents); for corpus-sized frames use the
    sort + per-partition-offset scheme in ``sources/corpus.py``.

    ``order_cols`` must be a unique key: ties would make the index —
    and everything built on it (the seeded split, the oracles) —
    nondeterministic across runs.  Enforced with one count-distinct pass
    (the frame is qrels-sized; callers pass the full (queryid, docid)
    key, which stays unique even when real qrels have several relevant
    docs per query)."""
    dup = (
        df.groupBy(*order_cols).count().where(F.col("count") > 1).limit(1)
    ).head()
    if dup is not None:
        raise ValueError(
            f"with_row_index order_cols {order_cols} are not a unique "
            f"key (e.g. {tuple(dup)[:-1]} appears {dup['count']} times); "
            f"tie order would be nondeterministic — pass the full "
            f"(queryid, docid) key"
        )
    w = Window.orderBy(*order_cols)
    return df.withColumn(name, F.row_number().over(w) - 1)


# ------------------------------------------------------------ D8-D9: features

def _bm25_sum(idfs: Column, weights: Column, k1: float) -> Column:
    """sum_i idf_i * (w_i*(k+1))/(w_i+k), left-to-right in token order —
    fielded_bm25_score (create-dataset-features.py:40-50)."""
    return F.aggregate(
        F.zip_with(
            idfs,
            weights,
            lambda i, w: i * (w * F.lit(k1 + 1.0)) / (w + F.lit(k1)),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def _first_occurrence(qtoks: Column, ftoks: Column, flen: Column) -> Column:
    """Per query token: 0-based first index in the field / field length,
    sentinel 1.0 when absent (create-dataset-features.py:262-293)."""
    return F.transform(
        F.transform(qtoks, lambda t: F.array_position(ftoks, t)),
        lambda p: F.when(p > 0, (p - 1).cast("double") / flen).otherwise(
            F.lit(1.0)
        ),
    )


def term_dfs(
    docs: DataFrame,
    body_col: str = "body",
    title_col: str | None = "title",
    regex: str = TOKEN_RE,
) -> DataFrame:
    """(token, df): document frequency over body ∪ title tokens — the
    reference's ``get_idf`` reads the merged index's doc-list length
    (create-dataset-features.py:54-68), whose postings union both fields."""
    toks = tokens_col(body_col, regex)
    if title_col is not None:
        toks = F.array_union(toks, tokens_col(title_col, regex))
    return (
        docs.select(F.explode(F.array_distinct(toks)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("df"))
    )


def query_idf_lists(
    pairs: DataFrame,
    term_df: DataFrame,
    num_docs: int,
    query_col: str = "query",
    regex: str = TOKEN_RE,
) -> DataFrame:
    """Attach ``query_idfs: array<double>`` aligned with the query's token
    order.  idf = ln((N - df + 0.5)/(df + 0.5)); unknown token -> 0.0
    (get_idf's miss branch, create-dataset-features.py:68).

    Distinct queries are exploded, joined once against the term
    dictionary (shuffle keyed on token; the query side is tiny), then the
    per-query idf list is re-assembled in token order and broadcast back
    onto the pairs frame."""
    distinct_q = pairs.select(query_col).distinct()
    exploded = distinct_q.select(
        query_col,
        F.posexplode(tokens_col(query_col, regex)).alias("pos", "token"),
    )
    idf = F.log(
        (F.lit(float(num_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    with_idf = (
        exploded.join(term_df, "token", "left")
        .select(
            query_col,
            "pos",
            F.coalesce(idf, F.lit(0.0)).alias("idf"),
        )
    )
    lists = with_idf.groupBy(query_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "idf"))),
            lambda s: s["idf"],
        ).alias("query_idfs")
    )
    # zero-token query: empty idf list (the groupBy above has no row)
    empty = F.array().cast("array<double>")
    return pairs.join(F.broadcast(lists), query_col, "left").withColumn(
        "query_idfs", F.coalesce(F.col("query_idfs"), empty)
    )


def offline_features(
    pairs: DataFrame,
    avg_body_len: float,
    avg_title_len: float,
    query_col: str = "query",
    body_col: str = "body",
    title_col: str = "title",
    k1: float = 1.6,
    b: float = 0.75,
    title_weight: float = 2.0,
    regex: str = TOKEN_RE,
    norm_partition_cols: list[str] | None = None,
) -> DataFrame:
    """Append the 10 ranking features to a (query, document) pairs frame
    that already carries ``query_idfs`` (see :func:`query_idf_lists`) —
    create-dataset-features.py:109-318, all JVM expressions.

    ``*_length_norm`` divide by the frame-wide max (reference :315-318 —
    dataset max, not index max), brought in via a broadcast of a 1-row
    aggregate; pass ``norm_partition_cols`` to take the max per group
    instead (the reference featurizes each per-rank negatives file
    separately, so its max is per rank — the negatives path passes
    ``["neg_rank"]`` to reproduce that).  fill_null(0) on the norms
    mirrors the negatives notebook's D10 step."""
    qtoks = tokens_col(query_col, regex)
    btoks = tokens_col(body_col, regex)
    ttoks = tokens_col(title_col, regex)
    df = (
        pairs.withColumn("_qt", qtoks)
        .withColumn("_bt", btoks)
        .withColumn("_tt", ttoks)
        .withColumn("body_length", F.size("_bt").cast("long"))
        .withColumn("title_length", F.size("_tt").cast("long"))
    )

    def weights(ftoks: str, flen: str, avg: float) -> Column:
        denom = (
            F.lit(1.0 - b)
            + F.lit(b) * (F.col(flen).cast("double") / F.lit(avg))
        )
        return F.transform(
            F.col("_qt"),
            lambda t: F.size(F.filter(F.col(ftoks), lambda x: x == t)).cast(
                "double"
            )
            / denom,
        )

    df = (
        df.withColumn("_wb", weights("_bt", "body_length", avg_body_len))
        .withColumn("_wt", weights("_tt", "title_length", avg_title_len))
        .withColumn(
            "_wc",
            F.zip_with(
                "_wb", "_wt", lambda x, y: x + F.lit(title_weight) * y
            ),
        )
        .withColumn("_fob", _first_occurrence(
            F.col("_qt"), F.col("_bt"), F.col("body_length")))
        .withColumn("_fot", _first_occurrence(
            F.col("_qt"), F.col("_tt"), F.col("title_length")))
    )
    qlen = F.size("_qt").cast("double")

    def mean(col: str) -> Column:
        # zero-token query: no occurrences to average — fall back to the
        # 1.0 "absent" sentinel (ANSI mode would raise on 0/0)
        return F.when(
            qlen > 0,
            F.aggregate(col, F.lit(0.0), lambda a, x: a + x) / qlen,
        ).otherwise(F.lit(1.0))

    df = df.select(
        "*",
        _bm25_sum(F.col("query_idfs"), F.col("_wc"), k1).alias("bm25_score"),
        _bm25_sum(F.col("query_idfs"), F.col("_wb"), k1).alias(
            "bm25_score_body"
        ),
        _bm25_sum(F.col("query_idfs"), F.col("_wt"), k1).alias(
            "bm25_score_title"
        ),
        mean("_fob").alias("body_first_occurrence_mean"),
        mean("_fot").alias("title_first_occurrence_mean"),
        F.coalesce(F.array_min("_fob"), F.lit(1.0)).alias(
            "body_first_occurrence_min"
        ),
        F.coalesce(F.array_min("_fot"), F.lit(1.0)).alias(
            "title_first_occurrence_min"
        ),
        F.exists("_fot", lambda x: x < 1.0)
        .cast("int")
        .alias("in_title"),
    )
    if norm_partition_cols:
        w = Window.partitionBy(*norm_partition_cols)
        df = df.withColumn("_max_bl", F.max("body_length").over(w)).withColumn(
            "_max_tl", F.max("title_length").over(w)
        )
    else:
        maxes = df.agg(
            F.max("body_length").alias("_max_bl"),
            F.max("title_length").alias("_max_tl"),
        )
        df = df.crossJoin(F.broadcast(maxes))
    df = df.select(
        "*",
        F.coalesce(
            F.col("body_length") / F.col("_max_bl"), F.lit(0.0)
        ).alias("body_length_norm"),
        F.coalesce(
            F.col("title_length") / F.col("_max_tl"), F.lit(0.0)
        ).alias("title_length_norm"),
    )
    return df.drop(
        "_qt", "_bt", "_tt", "_wb", "_wt", "_wc", "_fob", "_fot",
        "_max_bl", "_max_tl",
    )


# ------------------------------------------------------------ D11: negatives

def melt_negatives(
    labeled: DataFrame,
    target_cols: list[str],
    keep_cols: list[str] = ("index", "queryid", "query", "query_idfs"),
) -> DataFrame:
    """Wide per-rank docid columns -> long (.., neg_rank, docid) — the
    Spark-shaped half of the reference's 12 per-rank joins
    (create-dataset.py:99-113)."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in target_cols)
    keep = [f"`{c}`" for c in keep_cols]
    return labeled.selectExpr(
        *keep, f"stack({len(target_cols)}, {pairs}) as (neg_rank, docid)"
    )


def negatives_features_wide(
    labeled: DataFrame,
    docs: DataFrame,
    avg_body_len: float,
    avg_title_len: float,
    target_cols: list[str] | None = None,
    feature_cols: list[str] | None = None,
    **feat_kw,
) -> DataFrame:
    """Per-rank negative-document features, one column per
    (feature, rank): melt -> ONE join with docs -> featurize once ->
    pivot back on ``index``.  Output column names follow the reference's
    ``{feature}_{rank}`` suffix convention (negatives notebook join
    suffixes)."""
    target_cols = target_cols or [str(r) for r in TARGET_RANKS]
    feature_cols = feature_cols or FEATURE_COLUMNS
    long = melt_negatives(labeled, target_cols)
    joined = long.join(docs, "docid")
    feats = offline_features(
        joined, avg_body_len, avg_title_len,
        norm_partition_cols=["neg_rank"], **feat_kw
    )
    wide = (
        feats.groupBy("index")
        .pivot("neg_rank", target_cols)
        .agg(*[F.first(c).alias(c) for c in feature_cols])
    )
    # spark names multi-agg pivot columns "{rank}_{feature}" — rename to
    # the reference's "{feature}_{rank}"
    for r in target_cols:
        for c in feature_cols:
            wide = wide.withColumnRenamed(f"{r}_{c}", f"{c}_{r}")
    return wide


# ------------------------------------------------------------ D12: split

def split_col(
    id_col: str = "index",
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: int = 42,
) -> Column:
    """Deterministic hash split: u = md5-prefix(seed ||'_'|| id) / 2^32 in
    [0, 1), bucketed by cumulative weights.  Stable under any
    repartitioning (unlike ``randomSplit``) and bit-replicable in the
    DuckDB oracle; twin of the notebook's seed-42 shuffle + 80/10/10
    slice (create-dataset-negatives.ipynb)."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("_", F.lit(seed), F.col(id_col))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        / F.lit(float(1 << 32))
    )
    acc = 0.0
    expr = F.lit(names[-1])
    cases = []
    for w, n in zip(weights[:-1], names[:-1]):
        acc += w
        cases.append((acc, n))
    for bound, name in reversed(cases):
        expr = F.when(u < bound, F.lit(name)).otherwise(expr)
    return expr


def seeded_split(
    df: DataFrame,
    id_col: str = "index",
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: int = 42,
) -> dict[str, DataFrame]:
    """-> {name: frame} (train/val/test parquet sinks in the notebook)."""
    tagged = df.withColumn("split", split_col(id_col, weights, names, seed))
    return {n: tagged.where(F.col("split") == n).drop("split") for n in names}


# -------------------------------------------------- synthetic inputs
# The sandbox mandates deterministic small-scale stand-ins for the
# reference's MS-MARCO qrels/queries/top100 TSVs (no external data).
# Everything below is a pure function of the driver `documents` table,
# replicated expression-for-expression in the DuckDB contract oracles.

def synth_queries(docs: DataFrame, every: int = 10) -> DataFrame:
    """One query per docs row with doc_id % every == 0: queryid =
    doc_id/every, text = the doc's first two tokens (guaranteed
    answerable)."""
    toks = tokens_col("text")
    return docs.where(F.col("doc_id") % every == 0).select(
        (F.col("doc_id") / every).cast("long").alias("queryid"),
        F.concat_ws(" ", F.slice(toks, 1, 2)).alias("query"),
    )


def synth_qrels(docs: DataFrame, every: int = 10) -> DataFrame:
    return docs.where(F.col("doc_id") % every == 0).select(
        (F.col("doc_id") / every).cast("long").alias("queryid"),
        F.col("doc_id").alias("docid"),
        F.lit(1).alias("rel"),
    )


def top100_from_engine(
    engine,
    queries: DataFrame,
    n_cand: int = 100,
    mode=None,
) -> DataFrame:
    """Candidate rankings mined from the engine's own BM25 retrieval —
    the provenance the reference's top100 TSV has (an upstream ranked
    run).  One batched job for all queries; output shape matches
    :func:`synth_top100` (queryid, rank, docid, score).

    The queries table is collected (it is qrels-sized, not corpus-sized)
    and dispatched through ``search_batch`` so every query shares one
    postings scan; past ``chunk_size`` queries the chunked path keeps
    driver state and kernel closures bounded (one scan per slice)."""
    from search_engine_spark.plans.parser import SearchMode

    mode = mode or SearchMode.OR
    rows = queries.select("queryid", "query").collect()
    qids = [int(r.queryid) for r in rows]
    ranked = engine.search_batch_chunked(
        [(r.query, mode) for r in rows], num_return=n_cand
    )
    mapping = engine.spark.createDataFrame(
        list(enumerate(qids)), "qid int, queryid long"
    )
    return (
        ranked.join(F.broadcast(mapping), "qid")
        .select(
            "queryid",
            F.col("rank"),
            F.col("doc_id").alias("docid"),
            F.col("score"),
        )
    )


def synth_top100(docs: DataFrame, every: int = 10, n_cand: int = 100) -> DataFrame:
    """Deterministic ranked candidate list per query: docid =
    (queryid*7 + 13*rank) mod N (13 coprime to the corpus sizes in play →
    ranks map to distinct docs).  Stands in for the reference's
    BM25-produced top100 TSV; the pivot/label/negatives plumbing is
    agnostic to where the ranking came from."""
    n = docs.count()
    queries = docs.where(F.col("doc_id") % every == 0).select(
        (F.col("doc_id") / every).cast("long").alias("queryid")
    )
    return queries.select(
        "queryid",
        F.explode(F.sequence(F.lit(1), F.lit(n_cand))).alias("rank"),
    ).select(
        "queryid",
        "rank",
        ((F.col("queryid") * 7 + 13 * F.col("rank")) % n).alias("docid"),
        (F.lit(float(n_cand)) - F.col("rank")).alias("score"),
    )
