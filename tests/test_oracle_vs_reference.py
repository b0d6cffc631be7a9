"""Parity: my pure-Python oracle vs the REFERENCE'S OWN code (stubbed I/O).

Runs the reference's intersection/union/phrase/evaluator/BM25/top-k
(/root/reference/search_engine/inverted_index.py) over in-memory postings
and asserts my RefSemIndex produces identical (num_matched, top-k) — the
strongest available rank-identity evidence in this sandbox.
"""

from __future__ import annotations

import os

import pytest

from search_engine_spark.oracle.refsem import RefSemIndex
from search_engine_spark.plans.parser import SearchMode
from search_engine_spark.testing.synth import corpus_to_tokens, synth_corpus

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not present"
)

QUERIES = [
    ("zqmerge", SearchMode.AND),
    ("zqmerge zqshard", SearchMode.AND),
    ("zqmerge zqshard query", SearchMode.AND),
    ("parse_1 OR codec_2", SearchMode.OR),
    ("zqmerge zqshard", SearchMode.OR),
    ('"zqmerge zqshard"', SearchMode.PHRASE),
    ("zqmerge zqshard", SearchMode.PHRASE),
    ("unknown_term_xyz", SearchMode.AND),
    ("unknown_term_xyz zqmerge", SearchMode.AND),
    ("def", SearchMode.AND),  # pruned (idf < 1.5)
    ("def data", SearchMode.AND),  # all pruned
    ("def zqmerge", SearchMode.AND),  # pruned + kept (zip truncation quirk)
    ("def zqmerge zqshard", SearchMode.OR),
    ("zqmerge AND ( zqshard OR codec_2 )", SearchMode.QUERY_EVALUATOR),
    ("zqmerge AND NOT zqshard", SearchMode.QUERY_EVALUATOR),
    ('"zqmerge zqshard" OR codec_2', SearchMode.QUERY_EVALUATOR),
    ("zqmerge zqshard OR parse_1", SearchMode.QUERY_EVALUATOR),
    ("NOT zqmerge", SearchMode.QUERY_EVALUATOR),
    ("zqmerge AND ( parse_1 OR NOT codec_2 )", SearchMode.QUERY_EVALUATOR),
    ("tiny", SearchMode.AND),
]


@pytest.fixture(scope="module")
def corpora():
    out = []
    for seed, n in [(42, 120), (7, 300)]:
        rows = synth_corpus(n_docs=n, seed=seed)
        out.append(corpus_to_tokens(rows))
    return out


def _ref_search(ref_idx, query, mode, ref_mod, k=10):
    num_matched, threads = ref_idx.traditional_search(
        query=query,
        mode=getattr(ref_mod.SearchMode, mode.value),
        num_bm25_candidates=100,
        num_return=k,
        snippet_length=10,
    )
    return num_matched, [(s, int(info.original_docid)) for s, info in threads]


def _norm(results):
    return sorted(((round(s, 9), d) for s, d in results), key=lambda x: (-x[0], x[1]))


def test_oracle_matches_reference(corpora):
    from tests.ref_harness import make_reference_index

    for docs in corpora:
        ref_idx, ref_mod = make_reference_index(docs)
        mine = RefSemIndex(docs)
        for query, mode in QUERIES:
            try:
                ref_n, ref_top = _ref_search(ref_idx, query, mode, ref_mod)
            except (IndexError, TypeError):
                # degenerate reference paths we pin differently
                # (all-pruned sentinel -> doc -1); oracle must return empty
                n, top = mine.search_text(query, mode)
                assert top == [] or all(s == 0.0 for s, _ in top), (query, mode)
                continue
            my_n, my_top = mine.search_text(query, mode)
            if any(d == -1 for _, d in ref_top):
                # reference's all-pruned sentinel leaks doc -1 into scoring
                # (inverted_index.py:251-252); we pin this path to empty
                assert my_top == [], (query, mode)
                continue
            if ref_top and all(s == 0.0 for s, _ in ref_top):
                # zero-score results (NOT mode): reference order is a Python
                # set-iteration detail; compare count + membership semantics
                assert my_n == ref_n, (query, mode)
                assert all(s == 0.0 for s, _ in my_top), (query, mode)
                continue
            assert my_n == ref_n, (query, mode)
            assert _norm(my_top) == _norm(ref_top), (query, mode)


def test_oracle_matches_reference_not_mode(corpora):
    """Top-level NOT mode: all-zero scores; count parity only."""
    from tests.ref_harness import make_reference_index

    docs = corpora[0]
    ref_idx, ref_mod = make_reference_index(docs)
    mine = RefSemIndex(docs)
    for query in ["zqmerge", "zqmerge zqshard", "unknown_term_xyz"]:
        ref_n, ref_top = _ref_search(ref_idx, query, SearchMode.NOT, ref_mod)
        my_n, my_top = mine.search_text(query, SearchMode.NOT)
        assert my_n == ref_n
        assert len(my_top) == len(ref_top)
        assert all(s == 0.0 for s, _ in my_top + ref_top)
