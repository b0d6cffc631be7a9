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


def test_simplemma_documented_golden_fixtures():
    """Golden fixtures pinned to the upstream simplemma project's own
    documented tokenizer behavior (adbar/simplemma README / tokenizer
    docstring examples), lowercased first like the reference's
    ``tokenize_text`` (preprocessing.py:40-44).  These run always —
    unlike test_parity_with_real_simplemma, which needs the package —
    so rank-identity's tokenizer foundation is evidenced on real prose,
    URLs, numbers, currency, and hyphen/underscore compounds."""
    # README example (adbar/simplemma: simple_tokenizer docs)
    assert simplemma_tokenize(
        "Lorem ipsum dolor sit amet, consectetur adipiscing elit, "
        "sed do eiusmod tempor incididunt ut labore et dolore magna "
        "aliqua."
    ) == [
        "lorem", "ipsum", "dolor", "sit", "amet", ",", "consectetur",
        "adipiscing", "elit", ",", "sed", "do", "eiusmod", "tempor",
        "incididunt", "ut", "labore", "et", "dolore", "magna", "aliqua",
        ".",
    ]
    # behavior classes of the documented TOKREGEX alternatives
    assert simplemma_tokenize(
        "Sent from my iPhone — check https://example.org/page?q=1 now!"
    ) == [
        "sent", "from", "my", "iphone", "—", "check",
        "https://example.org/page?q=1", "now", "!",
    ]
    assert simplemma_tokenize(
        "on 01.01.2024 we paid $50.00 for 3-year-old wine-bottles"
    ) == [
        "on", "01.01.2024", "we", "paid", "$50.00", "for", "3-year-old",
        "wine-bottles",
    ]
    assert simplemma_tokenize("state-of-the-art co_operation x86_64") == [
        "state-of-the-art", "co_operation", "x86_64",
    ]
    # punctuation runs collapse into one token; quotes/brackets included
    assert simplemma_tokenize('wait... ("really?!")') == [
        "wait", "...", '("', "really", '?!")',
    ]


def test_vendored_tokregex_is_frozen():
    """The vendored pattern's recorded SHA-256 pins the transcription:
    any edit to SIMPLEMMA_TOKREGEX (typo, 'cleanup', re-derivation) fails
    here even on hosts where simplemma itself is not installable."""
    import hashlib

    from search_engine_spark.functions.tokenizer import (
        SIMPLEMMA_TOKREGEX,
        SIMPLEMMA_TOKREGEX_SHA256,
    )

    actual = hashlib.sha256(
        SIMPLEMMA_TOKREGEX.pattern.encode("utf-8")
    ).hexdigest()
    assert actual == SIMPLEMMA_TOKREGEX_SHA256


def test_parity_with_real_simplemma():  # pragma: no cover
    # importorskip the SUBMODULE: ref_harness stubs bare `simplemma` in
    # sys.modules for the oracle, and the stub has no tokenizer submodule
    tokenizer_mod = pytest.importorskip(
        "simplemma.tokenizer", reason="real simplemma not installed"
    )
    import simplemma

    # the vendored pattern must be BYTE-identical to upstream's TOKREGEX
    TOKREGEX = tokenizer_mod.TOKREGEX

    from search_engine_spark.functions.tokenizer import SIMPLEMMA_TOKREGEX

    if SIMPLEMMA_TOKREGEX.pattern != TOKREGEX.pattern:
        import hashlib

        up = hashlib.sha256(TOKREGEX.pattern.encode("utf-8")).hexdigest()
        pytest.fail(
            "vendored pattern diverges from installed simplemma "
            f"TOKREGEX (upstream sha256={up}); reconcile the "
            "transcription in functions/tokenizer.py"
        )
    cases = [
        "Hello, World! It's 3.14% done — see https://x.y/z?a=1.",
        "def foo_bar(x): return x*2  # comment",
        "naïve café über $100 1990s",
    ]
    for text in cases:
        assert simplemma_tokenize(text) == simplemma.simple_tokenizer(text.lower())


# ----- code-aware subtoken tokenizer ("code") -----


def test_code_tokenizer_boundaries():
    from search_engine_spark.functions.tokenizer import code_tokenize

    # camelCase / PascalCase / acronym-then-word / digit boundaries
    assert code_tokenize("getValue") == ["get", "value"]
    assert code_tokenize("HTTPServer") == ["http", "server"]
    assert code_tokenize("XMLHttpRequest") == ["xml", "http", "request"]
    assert code_tokenize("getValue2X") == ["get", "value2", "x"]
    # snake_case and mixed identifiers; underscore is a separator
    assert code_tokenize("read_parquet") == ["read", "parquet"]
    assert code_tokenize("parseHTTPResponse_v2") == [
        "parse", "http", "response", "v2",
    ]
    # code-ish line: punctuation separates, all variants meet in the middle
    assert code_tokenize("def readParquet(file_path): return DF_2") == [
        "def", "read", "parquet", "file", "path", "return", "df", "2",
    ]
    # plain lowercase prose is untouched (== simple minus underscores)
    assert code_tokenize("key agg row scan") == ["key", "agg", "row", "scan"]


def test_code_tokenizer_registered():
    from search_engine_spark.functions.tokenizer import get_tokenizer

    assert get_tokenizer("code")("aB") == ["a", "b"]


def test_code_index_matches_identifier_variants(spark, tmp_path):
    """An index built with tokenizer='code' retrieves camelCase, snake_case
    and PascalCase spellings of the same identifier for one query."""
    from search_engine_spark.build.builder import IndexBuilder
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.plans.parser import SearchMode
    from search_engine_spark.query.engine import SearchEngine

    rows = [
        ("r", f"f{i}.py", "c", "python", content)
        for i, content in enumerate([
            "def getValue(self): pass",
            "def get_value(x): pass",
            "class GetValue: pass",
            "completely unrelated tokens here",
        ])
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    cfg = EngineConfig(
        tokenizer="code", chunk_docs=8, chunks_per_batch=2,
        n_term_buckets=4, idf_threshold=-1.0e18,
    )
    idx = str(tmp_path / "code_idx")
    IndexBuilder(spark, idx, cfg).build_all(corpus)
    eng = SearchEngine(spark, idx, cfg)
    hits = eng.search("get value", SearchMode.AND, num_return=10).collect()
    assert {r.doc_id for r in hits} == {0, 1, 2}


# ----- code tokenizer: hostile-identifier property tests (r4) -----

import hypothesis.strategies as st
from hypothesis import given, settings

from search_engine_spark.functions.tokenizer import CODE_TOKREGEX, code_tokenize

_HOSTILE_GOLDENS = [
    ("__dunder__", ["dunder"]),
    ("__init__subclass__", ["init", "subclass"]),
    ("HTTPServerV2", ["http", "server", "v2"]),
    ("X509Certificate", ["x509", "certificate"]),
    ("parseHTML5Doc", ["parse", "html5", "doc"]),
    ("getXMLHTTPRequest2", ["get", "xmlhttp", "request2"]),
    ("ABCdefGHI", ["ab", "cdef", "ghi"]),
    # only lower/digit->UPPER boundaries split; "2c3" has none
    ("a1B2c3", ["a1", "b2c3"]),
    ("snake_case_mixedCamelABC", ["snake", "case", "mixed", "camel", "abc"]),
    ("UPPERCASE", ["uppercase"]),
    ("x", ["x"]),
    ("123", ["123"]),
    ("", []),
    ("___", []),
    ("A", ["a"]),
    ("aB", ["a", "b"]),
    ("ABc", ["a", "bc"]),
]


def test_code_tokenizer_hostile_goldens():
    for ident, want in _HOSTILE_GOLDENS:
        assert code_tokenize(ident) == want, ident


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=80))
def test_code_tokenizer_preserves_alnum_stream(s):
    """Splitting only inserts boundaries: the concatenated subtokens are
    exactly the [a-z0-9] characters of the lowercased input, in order."""
    toks = code_tokenize(s)
    assert "".join(toks) == "".join(CODE_TOKREGEX.findall(s.lower()))
    assert all(CODE_TOKREGEX.fullmatch(t) for t in toks)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=80))
def test_code_tokenizer_fixpoint(s):
    """Subtokens are already fully split: re-tokenizing their space-join
    is the identity (queries and documents normalize identically)."""
    toks = code_tokenize(s)
    assert code_tokenize(" ".join(toks)) == toks


_ASCII_IDENT = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(_ASCII_IDENT)
def test_code_tokenizer_matches_duckdb_sql_twin(s):
    """The contract oracle tokenizes with a SQL twin of code_tokenize;
    the two must agree on arbitrary hostile ASCII identifiers (the
    contract corpus only exercises lowercase prose doc-side)."""
    import duckdb

    sql = (
        "SELECT regexp_extract_all(lower(regexp_replace(regexp_replace("
        "?, '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'), "
        "'([a-z0-9])([A-Z])', '\\1 \\2', 'g')), '[a-z0-9]+')"
    )
    got = duckdb.execute(sql, [s]).fetchone()[0]
    assert got == code_tokenize(s), s
