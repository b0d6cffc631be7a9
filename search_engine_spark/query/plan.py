"""Driver-side query compilation.

Turns (tokens, mode) + global term statistics into a :class:`CompiledQuery`:
a small serializable plan the chunk kernel evaluates per doc-range chunk.
Everything *global* is resolved here — per-term document frequency, IDF
values, IDF-threshold pruning ("sentinel") decisions, static emptiness —
so the distributed kernel only does chunk-local set algebra + scoring.

Semantics replicated from the reference engine
(``/root/reference/search_engine/inverted_index.py``), as pinned by the
pure-Python oracle (:mod:`search_engine_spark.oracle.refsem`):

* IDF pruning: a term with ``idf < 1.5`` returns the ``(-1,)`` sentinel
  (:1094, :1117-1126).  Sentinel lists are dropped from AND/OR inputs
  (:242-258); an AND whose inputs were *all* sentinels yields the sentinel
  itself (:251-252), which at the top level means an empty result
  (oracle pinned deviation 3).  A single-term AND/OR over a sentinel is
  empty (:554, :584).
* df bookkeeping: the evaluator records ``len(doc_list)`` per leaf — a
  pruned term therefore contributes ``df=1`` (``len((-1,)) == 1``) and a
  missing term ``df=0`` (:912-925).  The per-query-token IDF list is zipped
  against the per-*kept*-column weight list, truncating at the shorter and
  pairing the i-th kept column with the i-th query token's IDF
  (:1240, :1726-1746) — compile keeps columns and IDFs as separate aligned
  lists to reproduce this.
* NOT contributes a single all-zero tf column but passes its child's df
  list through unchanged (:601-625, :874-880).
* Phrase leaves fetch without pruning (:1152-1184).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from search_engine_spark.config import EngineConfig
from search_engine_spark.plans.parser import QueryNode, SearchMode, parse_query

# --- runtime tree node tags (plain tuples: cheap to pickle into the kernel)
TERM = "term"      # ("term", token)
PHRASE = "phrase"  # ("phrase", (tok, ...))
AND = "and"        # ("and", (child, ...))
OR = "or"          # ("or", (child, ...))
NOT = "not"        # ("not", (child, ...)) — complement of union of children
ALL = "all"        # ("all",) — every doc in the collection
EMPTY = "empty"    # ("empty",)
_SENT = "__sentinel__"  # compile-time only; never reaches the kernel


@dataclass
class CompiledQuery:
    qid: int
    tree: tuple                       # runtime tree (EMPTY if statically empty)
    columns: tuple                    # (("term", tok) | ("zero",)) per tf column
    idfs: tuple                       # float per df-list entry (query-token order)
    fetch_terms: tuple                # terms the postings scan must return
    needs_positions: bool             # phrase node present
    scan_all_chunks: bool             # NOT/ALL present → every chunk participates
    wand_eligible: bool               # flat OR-of-terms → block-max path allowed
    num_candidates: int = 100
    num_return: int = 10


@dataclass
class _Sub:
    """Result of compiling one subtree."""
    tree: tuple
    dfs: list = field(default_factory=list)      # per-query-token df entries
    columns: list = field(default_factory=list)  # tf column spec


def _term_leaf(token: str, dfs: dict[str, int], num_docs: int,
               cfg: EngineConfig, prune: bool) -> _Sub:
    df = dfs.get(token, 0)
    if df == 0:
        # unknown term: empty doc list (NOT a sentinel — the reference's
        # trie miss returns empty tuples), zero-valued column, df entry 0
        return _Sub((EMPTY,), [0], [("term", token)])
    if prune and _idf(num_docs, df) < cfg.idf_threshold:
        # sentinel: no column, df entry = len((-1,)) == 1
        return _Sub((_SENT,), [1], [])
    return _Sub((TERM, token), [df], [("term", token)])


def _idf(num_docs: int, df: int) -> float:
    return math.log((num_docs - df + 0.5) / (df + 0.5))


def _combine(op: str, children: list[_Sub]) -> tuple:
    """AND/OR set-algebra over child trees with reference sentinel rules."""
    if not children:
        # zero-token query: the reference's k-way merge over zero lists
        # emits nothing (inverted_index.py:227-344 with an empty heap)
        return (EMPTY,)
    trees = [c.tree for c in children]
    kept = [t for t in trees if t[0] != _SENT]
    n_dropped = len(trees) - len(kept)
    if op == AND:
        if n_dropped and not kept:
            return (_SENT,)                       # all-pruned AND → sentinel
        if any(t[0] == EMPTY for t in kept):
            return (EMPTY,)
        kept = [t for t in kept if t[0] != ALL]
        if not kept:
            return (ALL,)
        if len(kept) == 1:
            return kept[0]
        return (AND, tuple(kept))
    # OR
    kept = [t for t in kept if t[0] != EMPTY]
    if any(t[0] == ALL for t in kept):
        return (ALL,)
    if not kept:
        return (EMPTY,)
    if len(kept) == 1:
        return kept[0]
    return (OR, tuple(kept))


def _not_of(children: list[_Sub]) -> tuple:
    """Complement of the union of children's doc sets.

    Reference ``not_statement`` builds the excluded set from the raw doc
    lists (:601-625): a sentinel child contributes only the literal ``-1``
    (never a valid doc id), i.e. excludes nothing.
    """
    real = [c.tree for c in children if c.tree[0] not in (_SENT, EMPTY)]
    if any(t[0] == ALL for t in real):
        return (EMPTY,)
    if not real:
        return (ALL,)
    return (NOT, tuple(real))


def _phrase_leaf(tokens: list[str], dfs: dict[str, int]) -> _Sub:
    cols = [("term", t) for t in tokens]
    df_list = [dfs.get(t, 0) for t in tokens]
    if len(tokens) == 1:
        # single-token phrase: plain un-pruned term fetch
        # (inverted_index.py:693-699)
        t = tokens[0]
        tree = (TERM, t) if dfs.get(t, 0) else (EMPTY,)
        return _Sub(tree, df_list, cols)
    if any(dfs.get(t, 0) == 0 for t in tokens):
        return _Sub((EMPTY,), df_list, cols)
    return _Sub((PHRASE, tuple(tokens)), df_list, cols)


def _compile_node(node: QueryNode, dfs: dict[str, int], num_docs: int,
                  cfg: EngineConfig) -> _Sub:
    """Mirror of the oracle's ``evaluate_subtree`` shape bookkeeping."""
    v = node.value
    if isinstance(v, SearchMode):
        if v in (SearchMode.AND, SearchMode.OR):
            left = _compile_node(node.left, dfs, num_docs, cfg)
            right = _compile_node(node.right, dfs, num_docs, cfg)
            op = AND if v == SearchMode.AND else OR
            tree = _combine(op, [left, right])
            return _Sub(tree, left.dfs + right.dfs, left.columns + right.columns)
        if v == SearchMode.NOT:
            left = _compile_node(node.left, dfs, num_docs, cfg)
            # NOT: child's df list passes through; single zero tf column
            return _Sub(_not_of([left]), left.dfs, [("zero",)])
        raise ValueError(f"unexpected mode node {v}")  # pragma: no cover
    if isinstance(v, list):  # phrase leaf
        return _phrase_leaf(v, dfs)
    return _term_leaf(v, dfs, num_docs, cfg, prune=True)


def _collect_fetch_terms(tree: tuple, out: set) -> None:
    tag = tree[0]
    if tag == TERM:
        out.add(tree[1])
    elif tag == PHRASE:
        out.update(tree[1])
    elif tag in (AND, OR, NOT):
        for c in tree[1]:
            _collect_fetch_terms(c, out)


def _has_tag(tree: tuple, tags: tuple) -> bool:
    if tree[0] in tags:
        return True
    if tree[0] in (AND, OR, NOT):
        return any(_has_tag(c, tags) for c in tree[1])
    return False


def compile_query(
    tokens: list[str],
    mode: SearchMode,
    dfs: dict[str, int],
    num_docs: int,
    config: EngineConfig | None = None,
    qid: int = 0,
    num_candidates: int | None = None,
    num_return: int | None = None,
) -> CompiledQuery:
    """``dfs``: global document frequency per candidate term (missing → 0)."""
    cfg = config or EngineConfig()
    if mode in (SearchMode.AND, SearchMode.OR):
        subs = [_term_leaf(t, dfs, num_docs, cfg, prune=True) for t in tokens]
        tree = _combine(AND if mode == SearchMode.AND else OR, subs)
        df_list = [d for s in subs for d in s.dfs]
        columns = [c for s in subs for c in s.columns]
    elif mode == SearchMode.NOT:
        subs = [_term_leaf(t, dfs, num_docs, cfg, prune=True) for t in tokens]
        tree = _not_of(subs)
        df_list = [d for s in subs for d in s.dfs]
        columns = [("zero",)]
    elif mode == SearchMode.PHRASE:
        sub = _phrase_leaf(tokens, dfs)
        tree, df_list, columns = sub.tree, sub.dfs, sub.columns
    elif mode == SearchMode.QUERY_EVALUATOR:
        sub = _compile_node(parse_query(tokens), dfs, num_docs, cfg)
        tree, df_list, columns = sub.tree, sub.dfs, sub.columns
    else:  # pragma: no cover
        raise ValueError(f"unsupported mode {mode}")

    if tree[0] == _SENT:
        tree = (EMPTY,)  # top-level all-pruned → empty (pinned deviation 3)

    idfs = tuple(_idf(num_docs, df) for df in df_list)
    fetch: set[str] = set()
    _collect_fetch_terms(tree, fetch)
    # tf columns need membership lookups even for terms outside the tree
    # (e.g. kept-but-empty OR terms): fetch those too when they exist
    for col in columns:
        if col[0] == "term" and dfs.get(col[1], 0) > 0:
            fetch.add(col[1])
    wand_ok = (
        tree[0] == TERM
        or (tree[0] == OR and all(c[0] == TERM for c in tree[1]))
    ) and all(c[0] != "zero" for c in columns)
    return CompiledQuery(
        qid=qid,
        tree=tree,
        columns=tuple(columns),
        idfs=idfs,
        fetch_terms=tuple(sorted(fetch)),
        needs_positions=_has_tag(tree, (PHRASE,)),
        scan_all_chunks=_has_tag(tree, (NOT, ALL)),
        wand_eligible=wand_ok,
        # a candidate pool smaller than num_return would silently truncate
        # the global top-k (each chunk kernel and the WAND pool cap at
        # num_candidates) — clamp so num_candidates >= num_return always
        num_candidates=max(
            num_candidates or cfg.num_candidates, num_return or cfg.num_return
        ),
        num_return=num_return or cfg.num_return,
    )
