"""Tokenizers.

The reference tokenizes with ``simplemma.simple_tokenizer`` over lowercased
text (``/root/reference/search_engine/preprocessing.py:40-44``).  simplemma
is not installable in this environment, so :data:`SIMPLEMMA_TOKREGEX` is a
VENDORED transcription of the public simplemma project's ``TOKREGEX``
(adbar/simplemma, ``simplemma/tokenizer.py``, MIT license): the same four
alternatives in the same order — currency/number-prefixed compounds (plus
the ``St.`` abbreviation case), URLs, word tokens with optional
currency/at/hash/section prefix, and punctuation runs.  When the package is
importable, ``tests/test_tokenizer.py`` asserts BYTE equality of the
pattern string against ``simplemma.TOKREGEX.pattern`` and behavior parity
of ``simplemma_tokenize`` vs ``simple_tokenizer`` (skipped otherwise); all
fixtures in this repo are generated with THIS tokenizer so engine/oracle
rank-identity is exact regardless.

``SimpleTokenizer`` is a deliberately SQL-replicable word splitter
(lowercase + ``[a-z0-9_]+`` runs) used for the DuckDB-oracle contract
queries in ``__spark_entry__.py``.
"""

from __future__ import annotations

import re
from typing import Callable

# Vendored from the public simplemma tokenizer (adbar/simplemma,
# simplemma/tokenizer.py, MIT).  Alternatives ordered: number-prefixed
# compounds (+ "St." abbreviation), URLs, word tokens (optional
# currency/at/hash/section prefix), punctuation runs.  Note the FULLWIDTH
# yen sign (U+FFE5) in the currency classes — that is upstream's choice.
#
# The transcription is FROZEN by SIMPLEMMA_TOKREGEX_SHA256 below
# (asserted by tests/test_tokenizer.py), so an accidental edit can never
# silently change tokenization; every fixture/oracle in this repo is
# generated with this exact pattern.  Upstream byte-parity itself is
# env-gated: on a host where simplemma IS installable, run
#   python -m pytest tests/test_tokenizer.py -q
# and test_parity_with_real_simplemma compares the pattern bytes (and
# prints upstream's hash on mismatch for recording here).
SIMPLEMMA_TOKREGEX = re.compile(
    r"(?:"
    r"(?:[€$￥£+-]?[0-9][0-9.,:%/-]*|St\.)[\w_€-]+"
    r"|https?://[^ ]+"
    r"|[€$￥£@#§]?\w[\w*_-]*"
    r"|[,;:\.?!¿¡‽⸮…()\[\]–{}—―/‒_“„”⹂‚‘’‛′″‟'\"«»‹›<>=+−×÷•·]+"
    r")"
)

# SHA-256 of SIMPLEMMA_TOKREGEX.pattern (UTF-8) — the frozen transcription
SIMPLEMMA_TOKREGEX_SHA256 = (
    "bbf87ca52898837e7831f062324147757d96f66a89b67ca22bbecba44cc30a8d"
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


# ----- code-aware subtoken splitting (the input_hint payload is source
# code; identifier-aware tokenization lets `getValue`, `get_value` and
# `GetValue` all match a `get value` query).  Boundary rules are the
# standard two-regex camel split (acronym-then-word first, then
# lower/digit-to-upper), followed by lowercase + `[a-z0-9]+` runs — the
# underscore is a separator here, which also splits snake_case.  Each
# step is replicable in SQL (`regexp_replace(..., 'g')` +
# `regexp_extract_all`), so DuckDB oracles can tokenize identically.
_CODE_ACRONYM = re.compile(r"([A-Z]+)([A-Z][a-z])")
_CODE_CAMEL = re.compile(r"([a-z0-9])([A-Z])")
CODE_TOKREGEX = re.compile(r"[a-z0-9]+")


def code_tokenize(text: str) -> list[str]:
    """camelCase/PascalCase/UPPERCamel/snake_case -> lowercase subtokens.

    ``HTTPServer`` -> [http, server]; ``getValue2X`` -> [get, value2, x];
    ``read_parquet`` -> [read, parquet].
    """
    t = _CODE_ACRONYM.sub(r"\1 \2", text)
    t = _CODE_CAMEL.sub(r"\1 \2", t)
    return CODE_TOKREGEX.findall(t.lower())


_TOKENIZERS: dict[str, Callable[[str], list[str]]] = {
    "simplemma": simplemma_tokenize,
    "simple": simple_tokenize,
    "code": code_tokenize,
}


def get_tokenizer(name: str) -> Callable[[str], list[str]]:
    try:
        return _TOKENIZERS[name]
    except KeyError:  # pragma: no cover
        raise ValueError(f"unknown tokenizer {name!r}; one of {sorted(_TOKENIZERS)}")


def tokenize_text(text: str, tokenizer: str = "simplemma") -> list[str]:
    return get_tokenizer(tokenizer)(text)
