"""Structured-Streaming ingestion: continuous corpus arrival folded into
the batch index through chunk-aligned, lineage-gated increments."""

from search_engine_spark.streaming.ingest import StreamingIndexer

__all__ = ["StreamingIndexer"]
