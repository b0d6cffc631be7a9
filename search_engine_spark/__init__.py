"""search_engine_spark — a PySpark-native full-text index + BM25 query engine.

A from-scratch rebuild of the capabilities of the reference engine
(``constantin-kuehne/search-engine``, a single-node mmap/struct-based Python
engine) re-expressed Spark-first:

* **Build** (:mod:`search_engine_spark.build`): tokenization + TF/position
  extraction as Arrow-vectorized ``mapInPandas``; posting lists constructed
  partition-parallel, merged via repartition-by-``(term, chunk)`` — the chunk
  key doubles as an explicit doc-range *salt* for skewed high-DF tokens —
  and persisted as a sharded parquet index with delta+varbyte compressed
  docID arrays and per-block max-score metadata.
* **Query** (:mod:`search_engine_spark.query`): Boolean / phrase / free-text
  queries planned on the driver, evaluated distributed per doc-range chunk
  inside one ``cogroup().applyInPandas`` kernel (block-max WAND with a
  bounded min-heap), global top-k via ``orderBy().limit`` (TakeOrderedAndProject).
* **Oracle** (:mod:`search_engine_spark.oracle`): an independent pure-Python
  re-implementation of the reference's query semantics (heap merge,
  fielded BM25 k1=1.6 b=0.75 title×2.0, IDF pruning sentinels) used to pin
  rank-identical fixtures.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the reference repo's observable behavior, and published IR
literature (SPIMI, varbyte, WAND/BMW).
"""

from search_engine_spark.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
