from search_engine_spark.build.builder import IndexBuilder

__all__ = ["IndexBuilder"]
