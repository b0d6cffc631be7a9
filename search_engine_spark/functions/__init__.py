from search_engine_spark.functions.tokenizer import get_tokenizer, tokenize_text
from search_engine_spark.functions.codec import (
    vb_encode,
    vb_decode,
    delta_encode_docs,
    delta_decode_docs,
    encode_positions,
    decode_positions,
)
from search_engine_spark.functions.bm25 import (
    calculate_idf,
    term_weight,
    fielded_bm25,
)

__all__ = [
    "get_tokenizer",
    "tokenize_text",
    "vb_encode",
    "vb_decode",
    "delta_encode_docs",
    "delta_decode_docs",
    "encode_positions",
    "decode_positions",
    "calculate_idf",
    "term_weight",
    "fielded_bm25",
]
