"""Composed corpus curation: the end-to-end keep/drop decision a
training-data pipeline runs before a corpus becomes training data.

One call chains the already-contracted primitives into a single decision
table — near-duplicate removal (MinHash-LSH pairs -> connected components
-> cluster representatives, `dedup.representatives`), language filtering
(`textstats.lang_id`) and quality filtering (`textstats.quality_scores`)
— with a deterministic reason precedence (``near_dup`` > ``lang`` >
``low_quality``), and :func:`curated_corpus` materializes the surviving
documents with PII scrubbed (`textstats.pii_scrub`).

Scale shape: quality/lang/PII are pure-JVM projection passes over the
corpus scan; the duplicate channel shuffles only signature bands and the
(tiny) cluster-member table; the final decision join is a corpus scan
against broadcast-size drop sets.  Nothing here is driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.pipeline import dedup, textstats


def curate_decisions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    neardup_threshold: float = 0.5,
    min_quality: float = 0.0,
    allowed_langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """Per-document keep/drop decision table: ``(id, keep, reason)``
    with ``reason`` one of ``near_dup`` / ``lang`` / ``low_quality`` /
    ``kept`` (first matching rule wins, in that order — a document that
    is both a duplicate and low quality reports ``near_dup``)."""
    pairs = dedup.minhash_dedup_pairs(
        docs, id_col, text_col, threshold=neardup_threshold
    )
    dup_drop = (
        dedup.representatives(docs, pairs, id_col, text_col)
        .where(F.col("keep") == 0)
        .select("id", F.lit(1).alias("_dup"))
    )
    # quality + lang evaluate in ONE Arrow-batched corpus pass
    # (textstats.text_profile — bit-identical to the contracted
    # expression specs, one tokenization per row); the only join is the
    # broadcast of the tiny duplicate drop set
    d = (
        textstats.text_profile(docs, id_col, text_col)
        .select("id", "quality", "lang_pred")
        .join(F.broadcast(dup_drop), "id", "left")
    )
    reason = F.when(F.col("_dup") == 1, F.lit("near_dup"))
    if allowed_langs is not None:
        reason = reason.when(
            ~F.col("lang_pred").isin(list(allowed_langs)), F.lit("lang")
        )
    reason = reason.when(
        F.col("quality") < F.lit(float(min_quality)), F.lit("low_quality")
    )
    return d.select(
        "id",
        F.when(reason.isNull(), 1).otherwise(0).cast("int").alias("keep"),
        F.coalesce(reason, F.lit("kept")).alias("reason"),
    )


def curated_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scrub_pii: bool = True,
    **decision_kwargs,
) -> DataFrame:
    """Materialize the curated corpus: survivors of
    :func:`curate_decisions`, with ``text_col`` replaced by its
    PII-scrubbed form (unless ``scrub_pii=False``).  All other columns
    pass through unchanged."""
    keep = (
        curate_decisions(docs, id_col, text_col, **decision_kwargs)
        .where(F.col("keep") == 1)
        .select(F.col("id").alias(id_col))
    )
    out = docs.join(keep, id_col, "left_semi")
    if scrub_pii:
        scrubbed = textstats.pii_scrub(out, id_col, text_col).select(
            F.col("id").alias(id_col), "scrubbed"
        )
        out = (
            out.drop(text_col)
            .join(scrubbed, id_col)
            .withColumnRenamed("scrubbed", text_col)
        )
    return out
