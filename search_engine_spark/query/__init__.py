from search_engine_spark.query.engine import SearchEngine
from search_engine_spark.query.plan import CompiledQuery, compile_query

__all__ = ["SearchEngine", "CompiledQuery", "compile_query"]
