from search_engine_spark.plans.parser import (
    QueryNode,
    SearchMode,
    build_query_tree,
    shunting_yard,
    parse_query,
)

__all__ = [
    "QueryNode",
    "SearchMode",
    "build_query_tree",
    "shunting_yard",
    "parse_query",
]
