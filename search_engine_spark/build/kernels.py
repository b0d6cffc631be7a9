"""Arrow-vectorized build kernels.

``extract_partials``: one pass over an Arrow batch of documents →
per-``(term, chunk)`` partial posting rows (numpy lexsort/segment
reduction — no per-row Python beyond the regex tokenizer call itself,
which is inherently per-document).

``merge_groups_vectorized`` / ``make_merge_stream_fn``: after the
repartition-by-(term, chunk) shuffle, sorted Arrow batches are merged in
one vectorized pass per batch — a single group-major lexsort, a single
varbyte encode per column (byte-split per group), and
``np.{maximum,minimum}.reduceat`` block metadata.

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

    out = {k: [] for k in (
        "term", "chunk_id", "doc_ids", "tfs_body", "tfs_title",
        "pos_body", "pos_title", "doc_lens", "title_lens",
    )}
    blens = np.fromiter((len(b) for b in body_lists), np.int64, len(body_lists))
    tlens = np.fromiter((len(t) for t in title_lists), np.int64, len(title_lists))
    # doclens pseudo-groups: reserved term "" (no tokenizer emits an empty
    # token) carries (doc_id -> doc_len/title_len) through the same shuffle
    # and merge as a regular posting group — tokenize once, not twice.
    # Emitted from doc_ids directly so zero-token docs are still covered.
    d_order = np.argsort(doc_ids, kind="stable")
    d_sorted = doc_ids[d_order]
    d_blens = blens[d_order].astype(np.int32)
    d_tlens = tlens[d_order].astype(np.int32)
    d_chunks = d_sorted // chunk_docs
    dc_change = np.empty(d_sorted.size, dtype=bool)
    dc_change[0] = True
    dc_change[1:] = d_chunks[1:] != d_chunks[:-1]
    dc_starts = np.flatnonzero(dc_change)
    dc_ends = np.append(dc_starts[1:], d_sorted.size)
    empty32 = np.empty(0, dtype=np.int32)
    for s, e in zip(dc_starts.tolist(), dc_ends.tolist()):
        out["term"].append("")
        out["chunk_id"].append(int(d_chunks[s]))
        out["doc_ids"].append(d_sorted[s:e])
        out["tfs_body"].append(d_blens[s:e])
        out["tfs_title"].append(d_tlens[s:e])
        out["pos_body"].append(empty32)
        out["pos_title"].append(empty32)
        out["doc_lens"].append(d_blens[s:e])
        out["title_lens"].append(d_tlens[s:e])

    if terms.size == 0:
        return pd.DataFrame(out)

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

    # vectorized per-(term,doc) doc/title lengths
    doc_order = d_order
    lookup = doc_order[np.searchsorted(doc_ids[doc_order], td_docs)]
    td_dls = blens[lookup].astype(np.int32)
    td_tls = tlens[lookup].astype(np.int32)

    td_chunks = td_docs // chunk_docs
    # (term, chunk) group boundaries over the (term,doc) rows
    tc_change = np.empty(td_codes.size, dtype=bool)
    tc_change[0] = True
    tc_change[1:] = (td_codes[1:] != td_codes[:-1]) | (td_chunks[1:] != td_chunks[:-1])
    tc_starts = np.flatnonzero(tc_change)
    tc_ends = np.append(tc_starts[1:], td_codes.size)

    uniques = np.asarray(uniques, dtype=object)
    pos32 = pos.astype(np.int32)
    td_tfb32 = td_tfb.astype(np.int32)
    td_tft32 = td_tft.astype(np.int32)
    is_body_mask = is_body == 1
    # numpy array cells (Arrow serializes ndarray cells as lists directly —
    # no per-int Python conversion)
    for s, e in zip(tc_starts.tolist(), tc_ends.tolist()):
        lo, hi = td_starts[s], seg_ends[e - 1]
        seg_body = is_body_mask[lo:hi]
        out["term"].append(uniques[td_codes[s]])
        out["chunk_id"].append(int(td_chunks[s]))
        out["doc_ids"].append(td_docs[s:e])
        out["tfs_body"].append(td_tfb32[s:e])
        out["tfs_title"].append(td_tft32[s:e])
        out["pos_body"].append(pos32[lo:hi][seg_body])
        out["pos_title"].append(pos32[lo:hi][~seg_body])
        out["doc_lens"].append(td_dls[s:e])
        out["title_lens"].append(td_tls[s:e])
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


def _excl_cumsum(x: np.ndarray) -> np.ndarray:
    out = np.zeros(x.size, dtype=np.int64)
    if x.size > 1:
        np.cumsum(x[:-1], out=out[1:])
    return out


def _gather_slices(
    starts: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Flat gather indices for variable-length slices [starts_i,
    starts_i+counts_i)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out_starts = _excl_cumsum(counts)
    return (
        np.arange(total, dtype=np.int64)
        - np.repeat(out_starts, counts)
        + np.repeat(starts, counts)
    )


def merge_groups_vectorized(
    cols: dict[str, np.ndarray],
    g_row_starts: np.ndarray,
    g_row_ends: np.ndarray,
    block_docs: int,
    n_buckets: int,
    skip_positions: bool = False,
) -> pd.DataFrame:
    """Merge + encode MANY complete (term, chunk) groups in one vectorized
    pass: a single group-major lexsort orders every posting, a single
    varbyte encode per column covers all groups (``vb_encode_segments``),
    and block metadata comes from ``np.{maximum,minimum}.reduceat`` over
    global block boundaries.  Per-group Python is reduced to byte-slicing
    and the crc32 bucket of the term."""
    from search_engine_spark.functions.codec import (
        delta_with_resets,
        vb_encode_segments,
    )
    from search_engine_spark.sources.index_store import term_bucket

    n_groups = g_row_starts.size
    # restrict to the covered (contiguous) row span — the caller may hold
    # back trailing carry rows
    lo, hi = int(g_row_starts[0]), int(g_row_ends[-1])
    if lo != 0 or hi != len(cols["doc_ids"]):
        cols = {c: v[lo:hi] for c, v in cols.items()}
        g_row_starts = g_row_starts - lo
        g_row_ends = g_row_ends - lo
    row_lens = np.fromiter(
        (len(x) for x in cols["doc_ids"]), dtype=np.int64,
        count=len(cols["doc_ids"]),
    )
    # rows -> flat posting entries
    docs = np.concatenate([np.asarray(x, np.int64) for x in cols["doc_ids"]])
    tfb = np.concatenate([np.asarray(x, np.int64) for x in cols["tfs_body"]])
    tft = np.concatenate([np.asarray(x, np.int64) for x in cols["tfs_title"]])
    dls = np.concatenate([np.asarray(x, np.int64) for x in cols["doc_lens"]])
    tls = np.concatenate([np.asarray(x, np.int64) for x in cols["title_lens"]])
    pos_b = (
        np.concatenate([np.asarray(x, np.int64) for x in cols["pos_body"]])
        if len(cols["pos_body"]) else np.empty(0, np.int64)
    )
    pos_t = (
        np.concatenate([np.asarray(x, np.int64) for x in cols["pos_title"]])
        if len(cols["pos_title"]) else np.empty(0, np.int64)
    )

    # entries per group via prefix sums over row lengths
    row_cum = np.concatenate(([0], np.cumsum(row_lens)))
    g_sizes = row_cum[g_row_ends] - row_cum[g_row_starts]
    gid = np.repeat(np.arange(n_groups, dtype=np.int64), g_sizes)
    # doc-sort within each group (group-major overall); docs unique per group
    order = np.lexsort((docs, gid))
    docs_s, tfb_s, tft_s = docs[order], tfb[order], tft[order]
    dls_s, tls_s = dls[order], tls[order]

    # positions: pos arrays are doc-entry-major already, so slice starts are
    # the exclusive cumsum of tf; gather them into sorted order
    def sort_positions(pos_flat: np.ndarray, tf_flat: np.ndarray, tf_sorted):
        starts = _excl_cumsum(tf_flat)
        return pos_flat[_gather_slices(starts[order], tf_sorted)]

    if skip_positions:  # doclens pseudo-groups: "tf" is a length, no pos
        pos_b_s = np.empty(0, np.int64)
        pos_t_s = np.empty(0, np.int64)
    else:
        pos_b_s = sort_positions(pos_b, tfb, tfb_s)
        pos_t_s = sort_positions(pos_t, tft, tft_s)

    g_starts = _excl_cumsum(g_sizes)  # entry-space group starts

    # ---- encode postings (one pass each, byte-split per group)
    doc_bytes = vb_encode_segments(delta_with_resets(docs_s, g_starts), g_starts)
    tfb_bytes = vb_encode_segments(tfb_s.astype(np.uint64), g_starts)
    tft_bytes = vb_encode_segments(tft_s.astype(np.uint64), g_starts)

    def pos_bytes_of(pos_s: np.ndarray, tf_s: np.ndarray) -> list[bytes]:
        if pos_s.size == 0:
            return [b""] * n_groups
        doc_pos_starts = _excl_cumsum(tf_s)[tf_s > 0]
        d = np.diff(pos_s, prepend=-1)
        d[doc_pos_starts] = pos_s[doc_pos_starts] + 1
        g_pos_starts = np.concatenate(([0], np.cumsum(tf_s)))[g_starts]
        return vb_encode_segments(d.astype(np.uint64), g_pos_starts)

    pos_b_bytes = pos_bytes_of(pos_b_s, tfb_s)
    pos_t_bytes = pos_bytes_of(pos_t_s, tft_s)

    # ---- block metadata (global reduceat over per-group block grid)
    nb_g = (g_sizes + block_docs - 1) // block_docs
    total_b = int(nb_g.sum())
    b_gstart = _excl_cumsum(nb_g)  # block-space group starts
    local_b = np.arange(total_b, dtype=np.int64) - np.repeat(b_gstart, nb_g)
    bstarts = np.repeat(g_starts, nb_g) + local_b * block_docs
    g_ends_entries = g_starts + g_sizes
    blast_idx = np.minimum(
        bstarts + block_docs, np.repeat(g_ends_entries, nb_g)
    ) - 1
    blk_last = docs_s[blast_idx]
    blk_max_tfb = np.maximum.reduceat(tfb_s, bstarts) if total_b else np.empty(0, np.int64)
    blk_max_tft = np.maximum.reduceat(tft_s, bstarts) if total_b else np.empty(0, np.int64)
    blk_min_dl = np.minimum.reduceat(dls_s, bstarts) if total_b else np.empty(0, np.int64)
    blk_min_tl = np.minimum.reduceat(tls_s, bstarts) if total_b else np.empty(0, np.int64)

    blk_last_bytes = vb_encode_segments(
        delta_with_resets(blk_last, b_gstart), b_gstart
    )
    blk_max_tfb_b = vb_encode_segments(blk_max_tfb.astype(np.uint64), b_gstart)
    blk_max_tft_b = vb_encode_segments(blk_max_tft.astype(np.uint64), b_gstart)
    blk_min_dl_b = vb_encode_segments(blk_min_dl.astype(np.uint64), b_gstart)
    blk_min_tl_b = vb_encode_segments(blk_min_tl.astype(np.uint64), b_gstart)

    terms = [cols["term"][s] for s in g_row_starts.tolist()]
    return pd.DataFrame(
        {
            "term": terms,
            "chunk_id": [
                int(cols["chunk_id"][s]) for s in g_row_starts.tolist()
            ],
            "df": g_sizes.astype(np.int32),
            "doc_ids": doc_bytes,
            "tfs_body": tfb_bytes,
            "tfs_title": tft_bytes,
            "pos_body": pos_b_bytes,
            "pos_title": pos_t_bytes,
            "blk_last_doc": blk_last_bytes,
            "blk_max_tfb": blk_max_tfb_b,
            "blk_max_tft": blk_max_tft_b,
            "blk_min_dl": blk_min_dl_b,
            "blk_min_tl": blk_min_tl_b,
            "bucket": np.array(
                [term_bucket(t, n_buckets) for t in terms], dtype=np.int32
            ),
        }
    )


def make_purge_fn(block_docs: int, n_buckets: int):
    """cogroup(postings-by-chunk, tombstones-by-chunk).applyInPandas
    function physically removing deleted docs from one chunk's posting
    rows (compaction's delete-file apply — Lucene's segment-merge drop of
    tombstoned docs).

    Costs are deletion-proportional at three levels: the builder routes
    only *touched* chunks here (untouched chunks never shuffle through
    Python), a row whose docs are all survivors passes through
    **byte-identical** (no decode), and only rows actually containing a
    deleted doc are re-encoded (positions re-sliced, block maxima
    recomputed via :func:`merge_groups_vectorized`).  Rows whose docs are
    all deleted are dropped — including the reserved-term ``""`` doclens
    row when an entire chunk dies."""
    from search_engine_spark.functions.codec import (
        decode_positions,
        delta_decode_docs,
        vb_decode,
    )

    cols_order = [
        "term", "chunk_id", "df", "doc_ids", "tfs_body", "tfs_title",
        "pos_body", "pos_title", "blk_last_doc", "blk_max_tfb",
        "blk_max_tft", "blk_min_dl", "blk_min_tl", "bucket",
    ]

    def purge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame({c: [] for c in cols_order})
        if len(right) == 0:  # untouched chunk (shouldn't reach here)
            return left[cols_order]
        deleted = np.sort(
            np.asarray(right.iloc[0]["deleted_ids"], dtype=np.int64)
        )
        # per-doc lengths for block-min recompute come from the chunk's
        # reserved-term "" row (lengths ride the tf columns there)
        dl_mask = left["term"] == ""
        dl_rows = left[dl_mask]
        chunk_ids = dls = tls = None
        if len(dl_rows):
            r0 = next(dl_rows.itertuples(index=False))
            chunk_ids = delta_decode_docs(r0.doc_ids)
            dls = vb_decode(r0.tfs_body).astype(np.int64)
            tls = vb_decode(r0.tfs_title).astype(np.int64)

        passthrough_idx: list[int] = []
        rebuilt = {k: [] for k in (
            "term", "chunk_id", "doc_ids", "tfs_body", "tfs_title",
            "pos_body", "pos_title", "doc_lens", "title_lens",
        )}
        n_dl_rebuilt = 0
        for i, row in enumerate(left.itertuples(index=False)):
            docs = delta_decode_docs(row.doc_ids)
            keep = ~np.isin(docs, deleted)
            if keep.all():
                passthrough_idx.append(i)
                continue
            if not keep.any():
                continue  # every doc deleted -> drop the row
            is_dl = row.term == ""
            tfb = vb_decode(row.tfs_body).astype(np.int64)
            tft = vb_decode(row.tfs_title).astype(np.int64)
            if is_dl:
                pb = pt = np.empty(0, dtype=np.int64)
            else:
                pb_flat = decode_positions(row.pos_body, tfb)
                pt_flat = decode_positions(row.pos_title, tft)
                pb = pb_flat[_gather_slices(_excl_cumsum(tfb)[keep], tfb[keep])]
                pt = pt_flat[_gather_slices(_excl_cumsum(tft)[keep], tft[keep])]
            kept_docs = docs[keep]
            if is_dl:
                kdl, ktl = tfb[keep], tft[keep]  # lengths ride tf cols
            else:
                lk = np.searchsorted(chunk_ids, kept_docs)
                kdl, ktl = dls[lk], tls[lk]
            # doclens rows must sort first so the two merge calls below
            # can split on a contiguous prefix, mirroring the build merge
            target = 0 if is_dl else len(rebuilt["term"])
            n_dl_rebuilt += int(is_dl)
            for k, v in (
                ("term", row.term), ("chunk_id", int(row.chunk_id)),
                ("doc_ids", kept_docs), ("tfs_body", tfb[keep]),
                ("tfs_title", tft[keep]), ("pos_body", pb),
                ("pos_title", pt), ("doc_lens", kdl), ("title_lens", ktl),
            ):
                rebuilt[k].insert(target, v)

        frames = []
        if passthrough_idx:
            frames.append(left.iloc[passthrough_idx][cols_order])
        n_rb = len(rebuilt["term"])
        if n_rb:
            cols = {k: np.asarray(v, dtype=object) for k, v in rebuilt.items()}
            cols["chunk_id"] = np.asarray(rebuilt["chunk_id"], dtype=np.int64)
            starts = np.arange(n_rb, dtype=np.int64)
            ends = starts + 1
            if n_dl_rebuilt:
                frames.append(
                    merge_groups_vectorized(
                        cols, starts[:n_dl_rebuilt], ends[:n_dl_rebuilt],
                        block_docs, n_buckets, skip_positions=True,
                    )[cols_order]
                )
            if n_rb > n_dl_rebuilt:
                frames.append(
                    merge_groups_vectorized(
                        cols, starts[n_dl_rebuilt:], ends[n_dl_rebuilt:],
                        block_docs, n_buckets,
                    )[cols_order]
                )
        if not frames:
            return pd.DataFrame({c: [] for c in cols_order})
        return pd.concat(frames, ignore_index=True)

    return purge


def make_merge_stream_fn(block_docs: int, n_buckets: int):
    """mapInPandas merge over partitions pre-sorted by (term, chunk_id).

    A per-(term, chunk) ``applyInPandas`` pays ~1 ms of pandas scaffolding
    per group — ruinous at real vocabulary sizes (millions of groups).
    Here the shuffle is ``repartition(term, chunk_id)`` +
    ``sortWithinPartitions``; each sorted Arrow batch's complete groups are
    merged in one vectorized pass (``merge_groups_vectorized``) with a
    carry buffer for the group straddling the batch boundary.
    """

    def stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: dict | None = None  # columns of the unfinished trailing group

        def run(cols: dict, starts: np.ndarray, ends: np.ndarray):
            # reserved-term "" doclens groups sort first (contiguous
            # prefix) and carry lengths, not positions
            first_terms = np.array(
                [cols["term"][s] for s in starts.tolist()], dtype=object
            )
            is_dl = first_terms == ""
            frames = []
            if is_dl.any():
                frames.append(
                    merge_groups_vectorized(
                        cols, starts[is_dl], ends[is_dl], block_docs,
                        n_buckets, skip_positions=True,
                    )
                )
            if (~is_dl).any():
                frames.append(
                    merge_groups_vectorized(
                        cols, starts[~is_dl], ends[~is_dl], block_docs,
                        n_buckets,
                    )
                )
            return pd.concat(frames, ignore_index=True)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            cols = {c: pdf[c].to_numpy() for c in pdf.columns}
            if carry is not None:
                same = (
                    carry["term"][0] == cols["term"][0]
                    and carry["chunk_id"][0] == cols["chunk_id"][0]
                )
                if same:
                    cols = {
                        c: np.concatenate([carry[c], cols[c]]) for c in cols
                    }
                else:
                    yield run(
                        carry,
                        np.array([0], dtype=np.int64),
                        np.array([len(carry["term"])], dtype=np.int64),
                    )
                carry = None
            terms = cols["term"]
            chunks = cols["chunk_id"]
            n = terms.size
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = (terms[1:] != terms[:-1]) | (chunks[1:] != chunks[:-1])
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            # last group may continue into the next batch — buffer it
            if starts.size > 1:
                yield run(cols, starts[:-1], ends[:-1])
            carry = {c: cols[c][starts[-1]:] for c in cols}
        if carry is not None and len(carry["term"]):
            yield run(
                carry,
                np.array([0], dtype=np.int64),
                np.array([len(carry["term"])], dtype=np.int64),
            )

    return stream
