"""Training-data composition ops: sequence packing + mixture sampling.

``pack_assignments``: GPT-style concat-and-chop packing — documents are
concatenated in a deterministic order and chopped into fixed
``seq_len``-token training sequences; each document gets the pack it
starts in and its token offset inside that pack.  The running token
total is computed as a DISTRIBUTED two-level prefix sum (per-bucket
window + broadcast prefix of the tiny bucket-sums table), never a
global single-partition window — the classic Spark scale trap for
`Window.orderBy` with no partitionBy (one task would stream the whole
corpus).  At 100 TB the wide side is two corpus projections and one
bucket-local window shuffle; the bucket-sums table is
``corpus/bucket_span`` rows (thousands), broadcast.

``mixture_sample``: deterministic domain-mixture sampling — keep each
document with probability ``weights[group]`` using a salted md5 hash of
its id (exactly reproducible across runs/partitionings; no RNG state,
no ``sample()`` nondeterminism).  This is the "20% code, 40% web, ..."
composition step of a pretraining pipeline as a pure-JVM projection —
one corpus scan, zero shuffles.

Both ops are integer/hash-exact and contracted against DuckDB oracles
(`packing_assignments`, `mixture_sample` in contracts_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.pipeline import textstats
from search_engine_spark.pipeline.dedup import tokens_col

# 2^32 as double — the hash-fraction denominator (md5 first 8 hex chars)
_HASH_DEN = float(1 << 32)


def _hash_frac(col, seed: int):
    """Uniform [0,1) fraction from a salted md5 of ``col`` — the same
    construction as dataset.py's split hash (stable under repartition)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", col.cast("string"), F.lit(str(seed)))), 1, 8),
        16,
        10,
    ).cast("long")
    return h / F.lit(_HASH_DEN)


def pack_assignments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    bucket_span: int = 1 << 17,
) -> DataFrame:
    """Per-document pack assignment for concat-and-chop packing.

    Documents are ordered by ``id_col`` (must be numeric and unique —
    the dense ids the build assigns), concatenated, and chopped into
    ``seq_len``-token sequences.  Returns ``(id, n_tokens, pack_id,
    pack_offset)`` where ``pack_id = prefix_tokens // seq_len`` and
    ``pack_offset = prefix_tokens % seq_len`` (``prefix_tokens`` = tokens of
    all earlier documents); a document spans packs
    ``pack_id .. (prefix_tokens + n_tokens - 1) // seq_len``.

    The prefix sum is two-level: window inside ``id // bucket_span``
    buckets, plus a broadcast-joined exclusive prefix over the per-bucket
    totals — no global-order window anywhere.
    """
    idc = F.col(id_col)
    d = docs.select(
        idc.alias("id"),
        (idc / F.lit(int(bucket_span))).cast("long").alias("_bucket"),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
    )
    # tiny: one row per bucket -> exclusive prefix over bucket order
    bucket_prefix = (
        d.groupBy("_bucket")
        .agg(F.sum("n_tokens").alias("_bsum"))
        .withColumn(
            "_bprefix",
            F.coalesce(
                F.sum("_bsum").over(
                    Window.orderBy("_bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
        .drop("_bsum")
    )
    in_bucket = Window.partitionBy("_bucket").orderBy("id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = (
        d.join(F.broadcast(bucket_prefix), "_bucket")
        .withColumn(
            "_prefix",
            F.col("_bprefix")
            + F.coalesce(F.sum("n_tokens").over(in_bucket), F.lit(0)),
        )
        .select(
            "id",
            "n_tokens",
            (F.col("_prefix") / F.lit(int(seq_len))).cast("long").alias(
                "pack_id"
            ),
            (F.col("_prefix") % F.lit(int(seq_len))).cast("long").alias(
                "pack_offset"
            ),
        )
    )
    return out


def pack_stats(assignments: DataFrame, seq_len: int = 2048) -> DataFrame:
    """Per-pack summary from :func:`pack_assignments` output:
    ``(pack_id, n_docs_started, first_id, tokens_started)`` — the docs
    that START in each pack (a doc's tail tokens spill into later
    packs; every pack except the last is exactly ``seq_len`` full)."""
    return (
        assignments.groupBy("pack_id")
        .agg(
            F.count("*").cast("long").alias("n_docs_started"),
            F.min("id").alias("first_id"),
            F.sum("n_tokens").cast("long").alias("tokens_started"),
        )
    )


def take_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_quality_buckets: int = 100,
) -> DataFrame:
    """Best-first selection under a token budget: rank documents by
    (quality DESC, id) — quality from ``textstats.quality_scores`` —
    and keep every document whose *exclusive* running token total is
    still under ``budget_tokens`` (the straddling document is kept
    whole).  This is the "curate the best N-billion tokens" step of a
    pretraining pipeline.

    Returns ``(id, n_tokens, quality, prefix_tokens)`` for the kept
    documents.

    The running total uses the same two-level distributed prefix sum as
    :func:`pack_assignments`, with ``floor(quality * K)`` as the bucket
    (quality is bounded [0,1], so buckets are orderable and the
    per-bucket totals table is at most K rows) — quality-descending
    global order without a corpus-wide single-task window.
    """
    k = int(n_quality_buckets)
    prof = textstats.quality_scores(docs, id_col, text_col).select(
        "id", F.col("n_tokens").cast("long").alias("n_tokens"), "quality"
    )
    d = prof.withColumn(
        "_bucket",
        F.least(F.floor(F.col("quality") * k), F.lit(k - 1)).cast("long"),
    )
    bucket_prefix = (
        d.groupBy("_bucket")
        .agg(F.sum("n_tokens").alias("_bsum"))
        .withColumn(
            "_bprefix",
            F.coalesce(
                F.sum("_bsum").over(
                    Window.orderBy(F.col("_bucket").desc()).rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
        .drop("_bsum")
    )
    in_bucket = Window.partitionBy("_bucket").orderBy(
        F.col("quality").desc(), "id"
    ).rowsBetween(Window.unboundedPreceding, -1)
    return (
        d.join(F.broadcast(bucket_prefix), "_bucket")
        .withColumn(
            "prefix_tokens",
            F.col("_bprefix")
            + F.coalesce(F.sum("n_tokens").over(in_bucket), F.lit(0)),
        )
        .where(F.col("prefix_tokens") < F.lit(int(budget_tokens)))
        .select("id", "n_tokens", "quality", "prefix_tokens")
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 7,
    default_weight: float = 0.0,
) -> DataFrame:
    """Deterministic mixture sampling: keep a document iff
    ``hash_frac(id, seed) < weights[its group]`` (groups absent from
    ``weights`` use ``default_weight``).  Expected output composition
    follows the weights; membership is exactly reproducible and
    partition-independent.  Returns the input rows (all columns) that
    survive.  Weights must be in [0, 1] — upsampling is a separate
    concern (duplicating rows changes dedup/packing semantics)."""
    for g, w in weights.items():
        if not (0.0 <= float(w) <= 1.0):
            raise ValueError(f"weight for {g!r} must be in [0,1], got {w}")
    rate = F.lit(float(default_weight))
    for g, w in sorted(weights.items()):
        rate = F.when(F.col(group_col) == g, F.lit(float(w))).otherwise(rate)
    return docs.where(_hash_frac(F.col(id_col), seed) < rate)
