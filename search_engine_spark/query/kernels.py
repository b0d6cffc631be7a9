"""Chunk-local query-evaluation kernels (numpy, Arrow-batch vectorized).

One kernel invocation handles one doc-range chunk: it receives the chunk's
posting rows for every term any active query needs (left side of a
``cogroup``) plus the chunk's doc-length row (right side), decodes the
delta+varbyte columns, evaluates each compiled query's set-algebra tree,
builds the per-column tf matrices, scores with fielded BM25 and emits the
chunk-local top-``num_candidates`` rows.  Chunks are doc-range-disjoint, so
AND/OR/NOT/phrase and top-k all decompose per chunk exactly; the global
top-k is a cheap second-stage reduce in Spark.

The heap-based k-way merge of the reference
(``/root/reference/search_engine/inverted_index.py:227-533``) becomes
sorted-array intersection/union (numpy ``intersect1d``/``union1d``); the
per-doc position cursor sweep of ``has_phrase`` (:200-225) becomes a
composite-key (doc, position) intersection chain; the bounded top-k heap
(:1748-1776) becomes an ``O(n log n)`` lexsort-slice per chunk (bounded by
chunk size) feeding Spark's ``TakeOrderedAndProject``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from search_engine_spark.functions.bm25 import fielded_bm25
from search_engine_spark.functions.codec import (
    decode_positions,
    delta_decode_docs,
    vb_decode,
)
from search_engine_spark.query.plan import (
    ALL,
    AND,
    EMPTY,
    NOT,
    OR,
    PHRASE,
    TERM,
    CompiledQuery,
)

_POS_KEY_SHIFT = np.int64(1) << np.int64(32)

RESULT_SCHEMA = "qid int, doc_id long, score double"


@dataclass
class TermChunk:
    docs: np.ndarray          # int64, ascending
    tfb: np.ndarray           # int64
    tft: np.ndarray           # int64
    pos_body: np.ndarray | None = None   # flat int64; offsets via cumsum(tfb)
    pos_title: np.ndarray | None = None
    blk_last: np.ndarray | None = None   # per-block last doc id
    blk_max_tfb: np.ndarray | None = None
    blk_max_tft: np.ndarray | None = None
    blk_min_dl: np.ndarray | None = None
    blk_min_tl: np.ndarray | None = None


def decode_term_row(row, need_positions: bool, need_blocks: bool) -> TermChunk:
    docs = delta_decode_docs(row.doc_ids)
    tfb = vb_decode(row.tfs_body).astype(np.int64)
    tft = vb_decode(row.tfs_title).astype(np.int64)
    tc = TermChunk(docs=docs, tfb=tfb, tft=tft)
    if need_positions:
        tc.pos_body = decode_positions(row.pos_body, tfb)
        tc.pos_title = decode_positions(row.pos_title, tft)
    if need_blocks:
        tc.blk_last = delta_decode_docs(row.blk_last_doc)
        tc.blk_max_tfb = vb_decode(row.blk_max_tfb).astype(np.int64)
        tc.blk_max_tft = vb_decode(row.blk_max_tft).astype(np.int64)
        tc.blk_min_dl = vb_decode(row.blk_min_dl).astype(np.int64)
        tc.blk_min_tl = vb_decode(row.blk_min_tl).astype(np.int64)
    return tc


@dataclass
class ChunkDocs:
    doc_ids: np.ndarray    # int64, ascending — every doc in the chunk
    doc_lens: np.ndarray   # int64
    title_lens: np.ndarray


def decode_doclens_row(row) -> ChunkDocs:
    return ChunkDocs(
        doc_ids=delta_decode_docs(row.doc_ids),
        doc_lens=vb_decode(row.doc_lens).astype(np.int64),
        title_lens=vb_decode(row.title_lens).astype(np.int64),
    )


_EMPTY_I64 = np.empty(0, dtype=np.int64)


def _membership(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    """indices of ``values`` in ``sorted_arr``; -1 where absent."""
    idx = np.searchsorted(sorted_arr, values)
    idx_c = np.minimum(idx, sorted_arr.size - 1) if sorted_arr.size else idx
    ok = (idx < sorted_arr.size) & (
        sorted_arr[idx_c] == values if sorted_arr.size else False
    )
    return np.where(ok, idx, -1)


def _deleted_of(right: pd.DataFrame) -> np.ndarray | None:
    """Sorted tombstoned ids for this chunk from the left-joined
    ``deleted_ids`` column; None when absent or null (no deletions)."""
    if "deleted_ids" not in right.columns:
        return None
    cell = right.iloc[0]["deleted_ids"]
    if cell is None or (isinstance(cell, float) and np.isnan(cell)):
        return None
    arr = np.asarray(cell, dtype=np.int64)
    return arr if arr.size else None


def _drop_deleted(chunk: ChunkDocs, deleted: np.ndarray) -> ChunkDocs:
    keep = _membership(deleted, chunk.doc_ids) < 0
    return ChunkDocs(
        doc_ids=chunk.doc_ids[keep],
        doc_lens=chunk.doc_lens[keep],
        title_lens=chunk.title_lens[keep],
    )


def _phrase_field_match(
    tokens: tuple,
    terms: dict[str, TermChunk],
    cand: np.ndarray,
    field: str,
) -> np.ndarray:
    """Docs in ``cand`` with all-nonempty position lists in ``field`` AND an
    adjacent-position chain across ``tokens`` (reference ``has_phrase``,
    inverted_index.py:200-225)."""
    # restrict to docs where every token has tf>0 in this field
    keep = np.ones(cand.size, dtype=bool)
    for t in tokens:
        tc = terms[t]
        idx = _membership(tc.docs, cand)
        tf = np.where(
            idx >= 0,
            (tc.tfb if field == "body" else tc.tft)[np.maximum(idx, 0)],
            0,
        )
        keep &= tf > 0
    cand = cand[keep]
    if cand.size == 0:
        return _EMPTY_I64
    # rank of each candidate doc for composite keys
    chain = None
    for t in tokens:
        tc = terms[t]
        tf = tc.tfb if field == "body" else tc.tft
        pos = tc.pos_body if field == "body" else tc.pos_title
        offs = np.zeros(tf.size + 1, dtype=np.int64)
        np.cumsum(tf, out=offs[1:])
        idx = _membership(tc.docs, cand)  # all >= 0 by construction
        # gather each candidate's position slice, tagged with its rank
        counts = tf[idx]
        starts = offs[idx]
        total = int(counts.sum())
        out_starts = np.zeros(cand.size, dtype=np.int64)
        np.cumsum(counts[:-1], out=out_starts[1:])
        flat_idx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(out_starts, counts)
            + np.repeat(starts, counts)
        )
        # rank per gathered element
        ranks = np.repeat(np.arange(cand.size, dtype=np.int64), counts)
        keys = ranks * _POS_KEY_SHIFT + pos[flat_idx]
        chain = keys if chain is None else np.intersect1d(chain + 1, keys)
        if chain.size == 0:
            return _EMPTY_I64
    return cand[np.unique(chain // _POS_KEY_SHIFT)]


def eval_tree(
    tree: tuple,
    terms: dict[str, TermChunk],
    chunk: ChunkDocs,
) -> np.ndarray:
    tag = tree[0]
    if tag == TERM:
        tc = terms.get(tree[1])
        return tc.docs if tc is not None else _EMPTY_I64
    if tag == EMPTY:
        return _EMPTY_I64
    if tag == ALL:
        return chunk.doc_ids
    if tag == AND:
        arrs = [eval_tree(c, terms, chunk) for c in tree[1]]
        out = arrs[0]
        for a in arrs[1:]:
            if out.size == 0:
                return _EMPTY_I64
            out = np.intersect1d(out, a, assume_unique=True)
        return out
    if tag == OR:
        arrs = [eval_tree(c, terms, chunk) for c in tree[1]]
        return np.unique(np.concatenate(arrs)) if arrs else _EMPTY_I64
    if tag == NOT:
        arrs = [eval_tree(c, terms, chunk) for c in tree[1]]
        excl = np.unique(np.concatenate(arrs)) if arrs else _EMPTY_I64
        return np.setdiff1d(chunk.doc_ids, excl, assume_unique=True)
    if tag == PHRASE:
        tokens = tree[1]
        if any(t not in terms for t in tokens):
            return _EMPTY_I64
        cand = terms[tokens[0]].docs
        for t in tokens[1:]:
            if cand.size == 0:
                return _EMPTY_I64
            cand = np.intersect1d(cand, terms[t].docs, assume_unique=True)
        body_ok = _phrase_field_match(tokens, terms, cand, "body")
        title_ok = _phrase_field_match(tokens, terms, cand, "title")
        return np.union1d(body_ok, title_ok)
    raise ValueError(f"bad tree node {tag}")  # pragma: no cover


def tf_matrices(
    columns: tuple,
    matched: np.ndarray,
    terms: dict[str, TermChunk],
) -> tuple[np.ndarray, np.ndarray]:
    """(n_docs x n_cols) body/title tf matrices per the compiled column spec."""
    n = matched.size
    ncols = len(columns)
    tfb = np.zeros((n, ncols), dtype=np.int64)
    tft = np.zeros((n, ncols), dtype=np.int64)
    for j, col in enumerate(columns):
        if col[0] != "term":
            continue
        tc = terms.get(col[1])
        if tc is None:
            continue
        idx = _membership(tc.docs, matched)
        present = idx >= 0
        tfb[present, j] = tc.tfb[idx[present]]
        tft[present, j] = tc.tft[idx[present]]
    return tfb, tft


def score_and_topk(
    plan: CompiledQuery,
    matched: np.ndarray,
    terms: dict[str, TermChunk],
    chunk: ChunkDocs,
    stats: dict,
    k1: float,
    b: float,
    title_weight: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Exhaustive scoring of the matched set; chunk-local top-k.

    Returns (doc_ids, scores) sorted by (-score, doc_id), truncated to
    ``plan.num_candidates``.
    """
    if matched.size == 0:
        return _EMPTY_I64, np.empty(0, dtype=np.float64)
    # zip truncation (inverted_index.py:1240): pair i-th kept column with
    # i-th query-token IDF, dropping the longer tail
    ncols = min(len(plan.columns), len(plan.idfs))
    cols = plan.columns[:ncols]
    idfs = np.asarray(plan.idfs[:ncols], dtype=np.float64)
    tfb, tft = tf_matrices(cols, matched, terms)
    pos = np.searchsorted(chunk.doc_ids, matched)
    dl = chunk.doc_lens[pos].astype(np.float64)
    tl = chunk.title_lens[pos].astype(np.float64)
    score, _, _ = fielded_bm25(
        idfs, tfb, tft, dl, tl,
        stats["avg_doc_len"], stats["avg_title_len"],
        k1=k1, b=b, title_weight=title_weight,
    )
    order = np.lexsort((matched, -score))[: plan.num_candidates]
    return matched[order], score[order]


def run_plans_on_chunk(
    plans: list[CompiledQuery],
    left: pd.DataFrame,
    right: pd.DataFrame,
    stats: dict,
    k1: float,
    b: float,
    title_weight: float,
    use_wand: bool = True,
    wand_counters: dict | None = None,
) -> pd.DataFrame:
    """Evaluate every compiled query against one chunk's postings."""
    from search_engine_spark.query.wand import wand_topk

    need_pos_terms: set[str] = set()
    for p in plans:
        if p.needs_positions:
            need_pos_terms.update(
                t for t in p.fetch_terms
            )
    any_scan_all = any(p.scan_all_chunks for p in plans)
    if len(left) == 0 and not any_scan_all:
        return _empty_result()
    if len(right) == 0:  # pragma: no cover — every chunk has a doclens row
        return _empty_result()

    chunk = decode_doclens_row(next(right.itertuples(index=False)))
    # optional metadata filter: a sorted array of doc ids allowed in this
    # chunk (joined onto the doclens side by the engine); matches are
    # intersected with it BEFORE the chunk-local top-k truncation, so the
    # bound applies to surviving docs only
    allowed: np.ndarray | None = None
    if "allowed_ids" in right.columns:
        allowed = np.asarray(right.iloc[0]["allowed_ids"], dtype=np.int64)
    # tombstoned docs (left-joined per chunk; null where the chunk has no
    # deletions): removed from the chunk's doc space so ALL/NOT complement
    # never resurrects them, and subtracted from every match set before
    # the chunk-local top-k
    deleted = _deleted_of(right)
    if deleted is not None:
        chunk = _drop_deleted(chunk, deleted)
    has_pos = "pos_body" in left.columns
    has_blk = "blk_last_doc" in left.columns
    terms: dict[str, TermChunk] = {}
    for row in left.itertuples(index=False):
        terms[row.term] = decode_term_row(
            row,
            need_positions=has_pos and row.term in need_pos_terms,
            need_blocks=has_blk,
        )

    out_qid: list[np.ndarray] = []
    out_doc: list[np.ndarray] = []
    out_score: list[np.ndarray] = []
    for plan in plans:
        if plan.tree[0] == EMPTY:
            continue
        if not plan.scan_all_chunks and not any(
            t in terms for t in plan.fetch_terms
        ):
            continue
        if use_wand and plan.wand_eligible and has_blk:
            # under a metadata filter or pending deletions wand_topk
            # drops non-surviving candidates per segment before scoring;
            # unfiltered block maxima stay valid (looser) upper bounds,
            # so pruning remains rank-identical (see wand.py docstring)
            docs, scores = wand_topk(
                plan, terms, chunk, stats, k1, b, title_weight,
                deleted=deleted, allowed=allowed,
                counters=wand_counters,
            )
        else:
            matched = eval_tree(plan.tree, terms, chunk)
            if allowed is not None and matched.size:
                matched = np.intersect1d(
                    matched, allowed, assume_unique=True
                )
            if deleted is not None and matched.size:
                matched = matched[_membership(deleted, matched) < 0]
            docs, scores = score_and_topk(
                plan, matched, terms, chunk, stats, k1, b, title_weight
            )
        if docs.size:
            out_qid.append(np.full(docs.size, plan.qid, dtype=np.int32))
            out_doc.append(docs)
            out_score.append(scores)
    if not out_doc:
        return _empty_result()
    return pd.DataFrame(
        {
            "qid": np.concatenate(out_qid),
            "doc_id": np.concatenate(out_doc),
            "score": np.concatenate(out_score),
        }
    )


def _empty_result() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "qid": pd.Series([], dtype="int32"),
            "doc_id": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64"),
        }
    )


def make_query_kernel(
    plans: list[CompiledQuery],
    stats: dict,
    k1: float,
    b: float,
    title_weight: float,
    use_wand: bool = True,
    wand_accumulators: tuple | None = None,
):
    """cogroup(postings-by-chunk, doclens-by-chunk).applyInPandas function.

    ``wand_accumulators``: optional ``(segments_total, segments_scored)``
    pair of Spark accumulators; each kernel invocation flushes its
    chunk-local WAND sweep counters into them.  Diagnostic only (task
    retries may double-count) — used to evidence the block-max skip rate
    on skewed workloads, never for correctness."""

    def kernel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        counters: dict | None = (
            {"segments_total": 0, "segments_scored": 0}
            if wand_accumulators is not None
            else None
        )
        out = run_plans_on_chunk(
            plans, left, right, stats, k1, b, title_weight,
            use_wand=use_wand, wand_counters=counters,
        )
        if counters is not None:
            wand_accumulators[0].add(counters["segments_total"])
            wand_accumulators[1].add(counters["segments_scored"])
        return out

    return kernel


FACET_SCHEMA = "qid int, value string, n long"


def facet_counts_on_chunk(
    plans: list[CompiledQuery],
    left: pd.DataFrame,
    right: pd.DataFrame,
) -> pd.DataFrame:
    """Per-chunk partial facet counts: evaluate each plan's match set
    (full set algebra, NO scoring and NO top-k truncation — facets count
    every match) and tally the matched docs' facet values.  The facet
    value array rides the doclens side in doc_id order (``facet_ids`` /
    ``facet_vals``), so the tally is a searchsorted gather — no doc_id
    join ever happens; Spark sums the per-chunk partials."""
    if len(right) == 0:  # pragma: no cover — every chunk has a doclens row
        return _empty_facets()
    any_scan_all = any(p.scan_all_chunks for p in plans)
    if len(left) == 0 and not any_scan_all:
        return _empty_facets()

    row0 = right.iloc[0]
    chunk = decode_doclens_row(next(right.itertuples(index=False)))
    facet_ids = np.asarray(row0["facet_ids"], dtype=np.int64)
    facet_vals = np.asarray(row0["facet_vals"], dtype=object)
    allowed: np.ndarray | None = None
    if "allowed_ids" in right.columns:
        allowed = np.asarray(row0["allowed_ids"], dtype=np.int64)
    deleted = _deleted_of(right)
    if deleted is not None:
        chunk = _drop_deleted(chunk, deleted)

    need_pos_terms: set[str] = set()
    for p in plans:
        if p.needs_positions:
            need_pos_terms.update(p.fetch_terms)
    has_pos = "pos_body" in left.columns
    terms: dict[str, TermChunk] = {}
    for row in left.itertuples(index=False):
        terms[row.term] = decode_term_row(
            row,
            need_positions=has_pos and row.term in need_pos_terms,
            need_blocks=False,
        )

    out_qid: list[np.ndarray] = []
    out_val: list[np.ndarray] = []
    out_n: list[np.ndarray] = []
    for plan in plans:
        if plan.tree[0] == EMPTY:
            continue
        if not plan.scan_all_chunks and not any(
            t in terms for t in plan.fetch_terms
        ):
            continue
        matched = eval_tree(plan.tree, terms, chunk)
        if allowed is not None and matched.size:
            matched = np.intersect1d(matched, allowed, assume_unique=True)
        if deleted is not None and matched.size:
            matched = matched[_membership(deleted, matched) < 0]
        if matched.size == 0:
            continue
        vals = facet_vals[np.searchsorted(facet_ids, matched)]
        uniq, counts = np.unique(vals, return_counts=True)
        out_qid.append(np.full(uniq.size, plan.qid, dtype=np.int32))
        out_val.append(uniq)
        out_n.append(counts.astype(np.int64))
    if not out_val:
        return _empty_facets()
    return pd.DataFrame(
        {
            "qid": np.concatenate(out_qid),
            "value": np.concatenate(out_val),
            "n": np.concatenate(out_n),
        }
    )


def _empty_facets() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "qid": pd.Series([], dtype="int32"),
            "value": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64"),
        }
    )


def make_facet_kernel(plans: list[CompiledQuery]):
    def kernel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return facet_counts_on_chunk(plans, left, right)

    return kernel
