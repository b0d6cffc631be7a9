"""Tokenizers.

The reference tokenizes with ``simplemma.simple_tokenizer`` over lowercased
text (``/root/reference/search_engine/preprocessing.py:40-44``).  simplemma
is not importable in this environment, so :data:`SIMPLEMMA_TOKREGEX` is a
re-derivation of the public simplemma project's tokenizer regex
(adbar/simplemma, ``simplemma/tokenizer.py``, MIT license) written from its
documented behavior: word-ish tokens (letters/digits/underscore with inner
``*_-``), currency/number tokens, URLs, and punctuation runs.  A parity test
against the real ``simplemma.simple_tokenizer`` runs when the package is
importable (see ``tests/test_tokenizer.py``) and is skipped otherwise; all
fixtures in this repo are generated with THIS tokenizer so engine/oracle
rank-identity is exact regardless.

``SimpleTokenizer`` is a deliberately SQL-replicable word splitter
(lowercase + ``[a-z0-9_]+`` runs) used for the DuckDB-oracle contract
queries in ``__spark_entry__.py``.
"""

from __future__ import annotations

import re
from typing import Callable

# Re-derived from the public simplemma tokenizer (adbar/simplemma,
# simplemma/tokenizer.py).  Alternatives ordered: number-prefixed words,
# URLs, word tokens (optional currency/at/hash prefix), punctuation runs.
SIMPLEMMA_TOKREGEX = re.compile(
    r"(?:"
    r"(?:[€$¥£+-]?[0-9][0-9.,:%/-]*|St\.)[\w_€-]+"
    r"|https?://[^ ]+"
    r"|[€$¥£@#§]?\w[\w*_-]*"
    r"|[,;:\.?!¿¡‽⸮…()\[\]–—~/«»‹›“”„\"‟'']+"
    r")"
)

SIMPLE_TOKREGEX = re.compile(r"[a-z0-9_]+")


def simplemma_tokenize(text: str) -> list[str]:
    """lowercase + simplemma-style token extraction.

    Mirrors the reference's ``tokenize_text``
    (``preprocessing.py:40-44``): ``simple_tokenizer(text.lower())``.
    """
    return SIMPLEMMA_TOKREGEX.findall(text.lower())


def simple_tokenize(text: str) -> list[str]:
    """lowercase + ``[a-z0-9_]+`` runs — replicable in ANSI SQL via
    ``regexp_extract_all(lower(x), '[a-z0-9_]+')`` (DuckDB) /
    ``regexp_extract_all`` (Spark)."""
    return SIMPLE_TOKREGEX.findall(text.lower())


_TOKENIZERS: dict[str, Callable[[str], list[str]]] = {
    "simplemma": simplemma_tokenize,
    "simple": simple_tokenize,
}


def get_tokenizer(name: str) -> Callable[[str], list[str]]:
    try:
        return _TOKENIZERS[name]
    except KeyError:  # pragma: no cover
        raise ValueError(f"unknown tokenizer {name!r}; one of {sorted(_TOKENIZERS)}")


def tokenize_text(text: str, tokenizer: str = "simplemma") -> list[str]:
    return get_tokenizer(tokenizer)(text)
