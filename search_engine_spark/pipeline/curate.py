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
    bench: DataFrame | None = None,
    contamination_kwargs: dict | None = None,
) -> DataFrame:
    """Per-document keep/drop decision table: ``(id, keep, reason)``
    with ``reason`` one of ``benchmark`` / ``near_dup`` / ``lang`` /
    ``low_quality`` / ``kept`` (first matching rule wins, in that order
    — a document that is both a duplicate and low quality reports
    ``near_dup``).  Passing ``bench`` adds benchmark decontamination
    (:func:`contamination_report`) as the highest-precedence drop."""
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
    if bench is not None:
        contaminated = (
            contamination_report(
                docs, bench, id_col, text_col, **(contamination_kwargs or {})
            )
            .select("id")
            .distinct()
            .select("id", F.lit(1).alias("_bench"))
        )
        d = d.join(F.broadcast(contaminated), "id", "left")
    else:
        d = d.withColumn("_bench", F.lit(None).cast("int"))
    reason = F.when(F.col("_bench") == 1, F.lit("benchmark")).when(
        F.col("_dup") == 1, F.lit("near_dup")
    )
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


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "bench_text",
    shingle_k: int = 8,
    min_overlap_frac: float = 0.5,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: which corpus documents contain a
    benchmark/eval item's text (n-gram overlap), the standard check a
    pretraining pipeline runs so training data doesn't leak into eval
    scores (GPT-3 appendix C / PaLM-style k-gram overlap).

    A document is flagged against a benchmark item when the fraction of
    the item's distinct ``shingle_k``-gram word shingles that also occur
    in the document reaches ``min_overlap_frac`` (and at least
    ``min_hits`` shingles).  Returns one row per flagged (document,
    benchmark item) pair: ``(id, bench_id, n_hit, n_bench,
    overlap_frac)``.

    Scale shape: the benchmark side is eval sets — MBs against a 100-TB
    corpus — so its exploded shingles BROADCAST; the corpus pays one
    tokenize/shingle projection pass (in-batch Arrow kernel, no
    shuffle), the broadcast hash join keeps only matching shingles, and
    the one real shuffle aggregates that near-empty hit stream by
    (doc, bench item).  No corpus-sized shuffle anywhere.
    """
    doc_grams = (
        dedup.shingle_table(docs, id_col, text_col, shingle_k)
        .select("id", F.explode("sh").alias("gram"))
        .where(F.col("gram") != "")
    )
    bench_grams = (
        dedup.shingle_table(bench, bench_id_col, bench_text_col, shingle_k)
        .select(
            F.col("id").alias("bench_id"),
            F.size("sh").alias("n_bench"),
            F.explode("sh").alias("gram"),
        )
        .where(F.col("gram") != "")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("id", "bench_id", "n_bench")
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    return (
        hits.where(
            (F.col("n_hit") >= F.lit(int(min_hits)))
            & (F.col("n_hit") >= F.lit(float(min_overlap_frac)) * F.col("n_bench"))
        )
        .select(
            "id",
            "bench_id",
            "n_hit",
            F.col("n_bench").cast("long").alias("n_bench"),
            F.round(F.col("n_hit") / F.col("n_bench"), 6).alias("overlap_frac"),
        )
    )


def decontaminated_corpus(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **report_kwargs,
) -> DataFrame:
    """Corpus minus every document flagged by
    :func:`contamination_report` (anti-join on the tiny flagged set)."""
    flagged = contamination_report(
        docs, bench, id_col, text_col, **report_kwargs
    ).select(F.col("id").alias(id_col)).distinct()
    return docs.join(flagged, id_col, "left_anti")


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
