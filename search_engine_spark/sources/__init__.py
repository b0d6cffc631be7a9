from search_engine_spark.sources.index_store import IndexStore
from search_engine_spark.sources.corpus import assign_doc_ids, load_corpus

__all__ = ["IndexStore", "assign_doc_ids", "load_corpus"]
