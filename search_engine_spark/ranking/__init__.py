from search_engine_spark.ranking.model import RankingModel

__all__ = ["RankingModel"]
