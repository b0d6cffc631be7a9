"""Arrow-vectorized build kernels.

``extract_partials``: one pass over an Arrow batch of documents →
per-``(term, chunk)`` partial posting rows (numpy lexsort/segment
reduction — no per-row Python beyond the regex tokenizer call itself,
which is inherently per-document).

``merge_partials``: executed per ``(term, chunk_id)`` group after the
repartition-by-term-hash shuffle — concatenates doc-range-disjoint
partials, encodes delta+varbyte, computes per-block max-score metadata.

This pair is the Spark-native replacement for the reference's SPIMI block
flush + two-stage k-way merge (``ingestion.py:63-171, 335-586, 941-981``):
the shuffle *is* the merge tree, and the ``(term, chunk_id)`` grouping key
is the explicit doc-range salt that bounds task size for skewed high-DF
terms.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from search_engine_spark.functions.codec import (
    delta_encode_docs,
    encode_positions,
    vb_encode,
)
from search_engine_spark.functions.tokenizer import get_tokenizer


def _flatten_token_lists(token_lists: list[list[str]]):
    """-> (flat_terms(object ndarray), lens(int64), flat_pos(int64))."""
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=len(token_lists))
    total = int(lens.sum())
    flat_terms = np.empty(total, dtype=object)
    i = 0
    for toks in token_lists:
        n = len(toks)
        flat_terms[i : i + n] = toks
        i += n
    # position within each doc: global arange minus repeated doc offsets
    offsets = np.zeros(len(token_lists), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    flat_pos = np.arange(total, dtype=np.int64) - np.repeat(offsets, lens)
    return flat_terms, lens, flat_pos


def extract_partials_batch(
    doc_ids: np.ndarray,
    title_lists: list[list[str]],
    body_lists: list[list[str]],
    chunk_docs: int,
) -> pd.DataFrame:
    """Build per-(term, chunk) partial rows for one batch of docs."""
    t_terms, t_lens, t_pos = _flatten_token_lists(title_lists)
    b_terms, b_lens, b_pos = _flatten_token_lists(body_lists)

    terms = np.concatenate([t_terms, b_terms])
    docs = np.concatenate(
        [np.repeat(doc_ids, t_lens), np.repeat(doc_ids, b_lens)]
    )
    pos = np.concatenate([t_pos, b_pos])
    is_body = np.concatenate(
        [np.zeros(t_terms.size, dtype=np.int8), np.ones(b_terms.size, dtype=np.int8)]
    )

    if terms.size == 0:
        return _empty_partials()

    codes, uniques = pd.factorize(terms, sort=True)
    order = np.lexsort((pos, is_body, docs, codes))
    codes, docs, pos, is_body = codes[order], docs[order], pos[order], is_body[order]

    # (term, doc) segment boundaries
    td_change = np.empty(codes.size, dtype=bool)
    td_change[0] = True
    td_change[1:] = (codes[1:] != codes[:-1]) | (docs[1:] != docs[:-1])
    td_starts = np.flatnonzero(td_change)
    td_counts = np.diff(np.append(td_starts, codes.size))
    td_codes = codes[td_starts]
    td_docs = docs[td_starts]
    # tf_title per (term,doc) = count of is_body==0 in segment
    title_flags = (is_body == 0).astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(title_flags)])
    seg_ends = td_starts + td_counts
    td_tft = csum[seg_ends] - csum[td_starts]
    td_tfb = td_counts - td_tft

    # doc lens lookup for the batch
    len_by_doc = dict(
        zip(doc_ids.tolist(), zip((len(b) for b in body_lists), (len(t) for t in title_lists)))
    )

    td_chunks = td_docs // chunk_docs
    # (term, chunk) group boundaries over the (term,doc) rows
    tc_change = np.empty(td_codes.size, dtype=bool)
    tc_change[0] = True
    tc_change[1:] = (td_codes[1:] != td_codes[:-1]) | (td_chunks[1:] != td_chunks[:-1])
    tc_starts = np.flatnonzero(tc_change)
    tc_ends = np.append(tc_starts[1:], td_codes.size)

    out = {k: [] for k in (
        "term", "chunk_id", "doc_ids", "tfs_body", "tfs_title",
        "pos_body", "pos_title", "doc_lens", "title_lens",
    )}
    uniques = np.asarray(uniques, dtype=object)
    pos32 = pos.astype(np.int32)
    for s, e in zip(tc_starts.tolist(), tc_ends.tolist()):
        lo, hi = td_starts[s], seg_ends[e - 1]
        seg_body = is_body[lo:hi] == 1
        g_docs = td_docs[s:e]
        out["term"].append(uniques[td_codes[s]])
        out["chunk_id"].append(int(td_chunks[s]))
        out["doc_ids"].append(g_docs.tolist())
        out["tfs_body"].append(td_tfb[s:e].astype(np.int32).tolist())
        out["tfs_title"].append(td_tft[s:e].astype(np.int32).tolist())
        out["pos_body"].append(pos32[lo:hi][seg_body].tolist())
        out["pos_title"].append(pos32[lo:hi][~seg_body].tolist())
        lens = [len_by_doc[d] for d in g_docs.tolist()]
        out["doc_lens"].append([l[0] for l in lens])
        out["title_lens"].append([l[1] for l in lens])
    return pd.DataFrame(out)


def _empty_partials() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "term": pd.Series([], dtype=object),
            "chunk_id": pd.Series([], dtype="int64"),
            "doc_ids": pd.Series([], dtype=object),
            "tfs_body": pd.Series([], dtype=object),
            "tfs_title": pd.Series([], dtype=object),
            "pos_body": pd.Series([], dtype=object),
            "pos_title": pd.Series([], dtype=object),
            "doc_lens": pd.Series([], dtype=object),
            "title_lens": pd.Series([], dtype=object),
        }
    )


def make_partials_mapper(tokenizer_name: str, chunk_docs: int):
    """mapInPandas function: documents(doc_id, title, body) -> PARTIALS_SCHEMA."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = get_tokenizer(tokenizer_name)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            title_lists = [tok(t) if t else [] for t in pdf["title"]]
            body_lists = [tok(t) if t else [] for t in pdf["body"]]
            yield extract_partials_batch(doc_ids, title_lists, body_lists, chunk_docs)

    return mapper


def make_doclens_mapper(tokenizer_name: str):
    """mapInPandas: documents(doc_id, title, body) -> (doc_id, doc_len, title_len)."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = get_tokenizer(tokenizer_name)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "doc_len": np.fromiter(
                        (len(tok(t)) if t else 0 for t in pdf["body"]),
                        dtype=np.int32,
                        count=len(pdf),
                    ),
                    "title_len": np.fromiter(
                        (len(tok(t)) if t else 0 for t in pdf["title"]),
                        dtype=np.int32,
                        count=len(pdf),
                    ),
                }
            )

    return mapper


def _block_meta(
    arr: np.ndarray, block_docs: int, reduce: str
) -> np.ndarray:
    """Per-block max/min over a posting-aligned array."""
    n = arr.size
    n_blocks = (n + block_docs - 1) // block_docs
    pad = n_blocks * block_docs - n
    if reduce == "max":
        padded = np.pad(arr, (0, pad), constant_values=0)
        return padded.reshape(n_blocks, block_docs).max(axis=1)
    padded = np.pad(arr, (0, pad), constant_values=np.iinfo(np.int64).max)
    return padded.reshape(n_blocks, block_docs).min(axis=1)


def encode_posting_group(
    docs: np.ndarray,
    tfb: np.ndarray,
    tft: np.ndarray,
    pos_b: np.ndarray,
    pos_t: np.ndarray,
    dls: np.ndarray,
    tls: np.ndarray,
    block_docs: int,
) -> dict:
    """Encode one merged (term, chunk) posting group (docs already sorted)."""
    n = docs.size
    n_blocks = (n + block_docs - 1) // block_docs
    blk_last = docs[np.minimum(np.arange(1, n_blocks + 1) * block_docs - 1, n - 1)]
    return {
        "df": int(n),
        "doc_ids": delta_encode_docs(docs),
        "tfs_body": vb_encode(tfb.astype(np.uint64)),
        "tfs_title": vb_encode(tft.astype(np.uint64)),
        "pos_body": encode_positions(pos_b, tfb),
        "pos_title": encode_positions(pos_t, tft),
        "blk_last_doc": delta_encode_docs(blk_last),
        "blk_max_tfb": vb_encode(_block_meta(tfb, block_docs, "max").astype(np.uint64)),
        "blk_max_tft": vb_encode(_block_meta(tft, block_docs, "max").astype(np.uint64)),
        "blk_min_dl": vb_encode(_block_meta(dls, block_docs, "min").astype(np.uint64)),
        "blk_min_tl": vb_encode(_block_meta(tls, block_docs, "min").astype(np.uint64)),
    }


def make_merge_fn(block_docs: int, n_buckets: int):
    """applyInPandas function for groupBy(term, chunk_id)."""
    from search_engine_spark.sources.index_store import term_bucket

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        chunk_id = int(pdf["chunk_id"].iloc[0])
        docs = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["doc_ids"]])
        tfb = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["tfs_body"]])
        tft = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["tfs_title"]])
        dls = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["doc_lens"]])
        tls = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["title_lens"]])
        # positions arrive as flat per-partial arrays; per-doc counts are the
        # tfs, so reorder doc-wise after the doc sort
        pos_b_parts = [np.asarray(x, dtype=np.int64) for x in pdf["pos_body"]]
        pos_t_parts = [np.asarray(x, dtype=np.int64) for x in pdf["pos_title"]]

        order = np.argsort(docs, kind="stable")
        if not np.array_equal(order, np.arange(docs.size)):
            # split flat positions into per-doc slices before reordering
            pos_b_all = _reorder_positions(pos_b_parts, pdf["tfs_body"], order)
            pos_t_all = _reorder_positions(pos_t_parts, pdf["tfs_title"], order)
            docs, tfb, tft = docs[order], tfb[order], tft[order]
            dls, tls = dls[order], tls[order]
        else:
            pos_b_all = np.concatenate(pos_b_parts) if pos_b_parts else np.empty(0, np.int64)
            pos_t_all = np.concatenate(pos_t_parts) if pos_t_parts else np.empty(0, np.int64)

        enc = encode_posting_group(
            docs, tfb, tft, pos_b_all, pos_t_all, dls, tls, block_docs
        )
        row = {"term": term, "chunk_id": chunk_id, **enc,
               "bucket": term_bucket(term, n_buckets)}
        return pd.DataFrame([row])

    return merge


def _reorder_positions(parts: list[np.ndarray], tf_lists, order: np.ndarray) -> np.ndarray:
    """Reorder concatenated per-doc position slices by the doc sort order."""
    slices: list[np.ndarray] = []
    for part, tfs in zip(parts, tf_lists):
        offs = np.zeros(len(tfs) + 1, dtype=np.int64)
        np.cumsum(np.asarray(tfs, dtype=np.int64), out=offs[1:])
        slices.extend(part[offs[i] : offs[i + 1]] for i in range(len(tfs)))
    reordered = [slices[i] for i in order]
    return np.concatenate(reordered) if reordered else np.empty(0, np.int64)
