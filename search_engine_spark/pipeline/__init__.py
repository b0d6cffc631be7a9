"""Large-scale training-data pipeline operators over the engine's corpus:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard, band
buckets capped against degenerate-content skew), embedding similarity
search (brute-force cosine + materialized LSH / IVF ANN indexes with
partition-pruned probes), embedding ingestion (batched pluggable encoder,
layer-norm/truncate/L2), the offline training-dataset pipeline (rank
pivot, match labels, negatives join, hash split, expression-only ranking
features), text analysis (language id, quality scoring, token counting,
fingerprinting), corpus curation (composed keep/drop decisions, PII
scrub, benchmark decontamination), training-data composition (sequence
packing, domain-mixture sampling, token-budget selection), and
multimodal binary-column plumbing.

Everything is built from JVM-side ``pyspark.sql.functions`` higher-order
expressions (whole-stage codegen, no Python in the hot path) except the
encoder/decoder stages and quantizer assignments, which are Arrow-batched
``mapInPandas`` by design (model slots + shared-subexpression-heavy array
math that Catalyst would re-inline per element).
"""
