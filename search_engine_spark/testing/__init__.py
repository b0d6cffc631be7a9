from search_engine_spark.testing.synth import synth_corpus, corpus_to_tokens

__all__ = ["synth_corpus", "corpus_to_tokens"]
