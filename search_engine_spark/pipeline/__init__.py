"""Large-scale training-data pipeline operators over the engine's corpus:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search (brute-force cosine + LSH-bucketed), text analysis
(language id, quality scoring, token counting, fingerprinting), and
multimodal binary-column plumbing.

Everything is built from JVM-side ``pyspark.sql.functions`` higher-order
expressions (whole-stage codegen, no Python in the hot path) except the
multimodal decoder, which is an Arrow-batched ``mapInPandas`` by design.
"""
