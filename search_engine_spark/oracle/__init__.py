from search_engine_spark.oracle.refsem import RefSemIndex

__all__ = ["RefSemIndex"]
