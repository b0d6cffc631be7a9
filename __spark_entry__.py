"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship ranked retrieval on sf0.001 — builds the contract
index (cached per sf dir) and runs a batched set of search queries through
the distributed engine (block-max WAND path included).

``queries`` / ``oracle_sql``: paired Spark-vs-DuckDB contracts — see
``search_engine_spark/contracts.py`` (core index/search family) and
``search_engine_spark/pipeline/contracts_pipeline.py`` (training-data
pipeline operators: dedup, similarity, text analysis).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from search_engine_spark.contracts import get_engine
    from search_engine_spark.plans.parser import SearchMode

    engine = get_engine(spark, "/root/testdata/sf0.001")
    ranked = engine.search_batch(
        [
            ("dup small", SearchMode.OR),
            ("dup small", SearchMode.AND),
            ("batch batch", SearchMode.PHRASE),
            ("dup AND line OR group", SearchMode.QUERY_EVALUATOR),
        ]
    )
    return engine.with_doc_info(ranked).select(
        "qid", "rank", "doc_id", "score", "path"
    )


def _registry() -> dict[str, tuple]:
    from search_engine_spark.contracts import (
        CORE_QUERIES,
        ordered_query,
        ordered_sql,
    )

    reg = dict(CORE_QUERIES)
    try:
        from search_engine_spark.pipeline.contracts_pipeline import (
            PIPELINE_QUERIES,
        )

        reg.update(PIPELINE_QUERIES)
    except ImportError:  # pipeline extras not present yet
        pass
    # Pin a deterministic total row order on BOTH sides of every contract:
    # the driver hashes rows in emitted order, which is shuffle-dependent
    # for any plan ending in a join/groupBy/window (r4: token_budget_select
    # was bit-identical in values but hash-mismatched on order alone).
    return {
        name: (
            ordered_query(fn),
            ordered_sql(sql) if sql is not None else None,
        )
        for name, (fn, sql) in reg.items()
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql
        for name, (_fn, sql) in _registry().items()
        if sql is not None
    }
