"""Property-based parity: random tiny corpora + random queries, oracle vs
the reference's own algorithms."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.oracle.refsem import RefSemIndex
from search_engine_spark.plans.parser import SearchMode

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not present"
)

VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff"]

doc_strategy = st.tuples(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3),  # title
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12),  # body
)

corpus_strategy = st.lists(doc_strategy, min_size=3, max_size=25)

query_strategy = st.one_of(
    st.tuples(
        st.lists(st.sampled_from(VOCAB + ["zz"]), min_size=1, max_size=3).map(
            " ".join
        ),
        st.sampled_from([SearchMode.AND, SearchMode.OR, SearchMode.PHRASE]),
    ),
    st.tuples(
        st.sampled_from(
            [
                "aa AND bb",
                "aa OR ( bb AND cc )",
                "aa AND NOT bb",
                '"aa bb" OR cc',
                "aa bb cc",
                "NOT aa",
                "( aa OR bb ) AND ( cc OR dd )",
            ]
        ),
        st.just(SearchMode.QUERY_EVALUATOR),
    ),
)


def _norm(results):
    return sorted(((round(s, 9), d) for s, d in results), key=lambda x: (-x[0], x[1]))


@given(corpus=corpus_strategy, q=query_strategy)
@settings(max_examples=150, deadline=None)
def test_random_parity(corpus, q):
    from tests.ref_harness import make_reference_index

    query, mode = q
    ref_idx, ref_mod = make_reference_index(corpus)
    mine = RefSemIndex(corpus)
    my_n, my_top = mine.search_text(query, mode)
    try:
        ref_n, ref_top = ref_idx.traditional_search(
            query=query,
            mode=getattr(ref_mod.SearchMode, mode.value),
            num_bm25_candidates=100,
            num_return=10,
            snippet_length=10,
        )
        ref_top = [(s, int(i.original_docid)) for s, i in ref_top]
    except (IndexError, TypeError, ZeroDivisionError):
        # degenerate reference paths we pin differently: the all-pruned
        # sentinel doc -1 reaches scoring (inverted_index.py:1732-1746)
        # and either indexes out of bounds or divides by zero when
        # tf' == -k1; the oracle returns empty instead (pinned deviation 3)
        assert my_top == [] or all(s == 0.0 for s, _ in my_top)
        return
    if any(d == -1 for _, d in ref_top):
        assert my_top == []
        return
    if ref_top and all(s == 0.0 for s, _ in ref_top):
        assert my_n == ref_n
        assert all(s == 0.0 for s, _ in my_top)
        return
    assert my_n == ref_n
    my_norm, ref_norm = _norm(my_top), _norm(ref_top)
    assert [s for s, _ in my_norm] == [s for s, _ in ref_norm]
    if not my_norm:
        return
    # Doc ids must agree except inside the score group straddling the
    # top-k cut: among bit-equal scores the reference's selection is
    # heap-array/set-iteration order (inverted_index.py:1718-1776 pushes
    # full tuples into a bounded heap, then stable-sorts by score only),
    # so any subset of the tied candidates is a rank-identical result.
    cut = my_norm[-1][0]
    assert {p for p in my_norm if p[0] != cut} == {
        p for p in ref_norm if p[0] != cut
    }
    # the reference's tied-tail picks must still be genuine candidates
    # with exactly the cut score under the oracle's full scoring
    _, my_all = mine.search_text(query, mode, num_return=len(corpus) + 1)
    full = {(round(s, 9), d) for s, d in my_all}
    assert all(p in full for p in ref_norm if p[0] == cut)
