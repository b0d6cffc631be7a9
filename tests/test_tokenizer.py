import pytest

from search_engine_spark.functions.tokenizer import (
    simple_tokenize,
    simplemma_tokenize,
    tokenize_text,
)


def test_basic_words():
    assert simplemma_tokenize("Hello World") == ["hello", "world"]


def test_lowercasing_and_identifiers():
    toks = simplemma_tokenize("def read_parquet(Path): return DF_2")
    assert "read_parquet" in toks
    assert "df_2" in toks


def test_punctuation_tokens():
    toks = simplemma_tokenize("a, b.")
    assert toks[0] == "a"
    # punctuation is emitted as tokens (simplemma behavior)
    assert "," in toks


def test_url():
    toks = simplemma_tokenize("see https://example.com/x?y=1 now")
    assert "https://example.com/x?y=1" in toks


def test_numbers():
    assert "3.14" in simplemma_tokenize("pi is 3.14 ok")


def test_unicode():
    toks = simplemma_tokenize("naïve café über")
    assert toks == ["naïve", "café", "über"]


def test_simple_tokenizer_sql_replicable():
    assert simple_tokenize("The quick-brown fox_2!") == [
        "the",
        "quick",
        "brown",
        "fox_2",
    ]


def test_dispatch():
    assert tokenize_text("a b", "simple") == ["a", "b"]


def test_parity_with_real_simplemma():  # pragma: no cover
    simplemma = pytest.importorskip("simplemma", reason="simplemma not installed")
    cases = [
        "Hello, World! It's 3.14% done — see https://x.y/z?a=1.",
        "def foo_bar(x): return x*2  # comment",
        "naïve café über $100 1990s",
    ]
    for text in cases:
        assert simplemma_tokenize(text) == simplemma.simple_tokenizer(text.lower())
