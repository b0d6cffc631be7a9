"""Delta + variable-byte posting compression (numpy-vectorized).

The reference stores postings as raw ``u32`` arrays
(``/root/reference/search_engine/ingestion.py:106-159``); compression is a
north-star addition.  Classic varbyte (Manning/Raghavan/Schütze IR ch. 5):
7 payload bits per byte, **high bit set marks the final byte** of a value,
most-significant group first.  Encode and decode are fully vectorized —
no per-value Python in the hot path.

Doc ids are delta-encoded before varbyte (ascending, gaps >= 1 via the
``+1``-shift in :func:`delta_encode_docs`).  Per-doc position lists are
delta-encoded with a reset at each doc boundary (:func:`encode_positions`).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
# thresholds[i] = 2**(7*(i+1)); a value v needs (searchsorted side='right') bytes
_THRESHOLDS = np.array([1 << (7 * i) for i in range(1, 10)], dtype=np.uint64)


def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a 1-D array of non-negative ints (< 2**63)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    nbytes = np.searchsorted(_THRESHOLDS, v, side="right") + 1  # bytes per value
    ends = np.cumsum(nbytes)  # 1 past last byte of each value
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    # byte slot j of the output belongs to value gid[j]; its shift is
    # 7 * (end_of_value - 1 - j)
    gid = np.zeros(total, dtype=np.int64)
    gid[ends[:-1]] = 1
    gid = np.cumsum(gid)
    shifts = ((ends[gid] - 1) - np.arange(total)) * 7
    out = ((v[gid] >> shifts.astype(np.uint64)) & _U64(0x7F)).astype(np.uint8)
    out[ends - 1] |= 0x80  # terminator flag on final byte of each value
    return out.tobytes()


def vb_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode a varbyte buffer to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    last = (b & 0x80) != 0
    starts = np.empty(b.size, dtype=bool)
    starts[0] = True
    starts[1:] = last[:-1]
    gid = np.cumsum(starts) - 1
    ends = np.flatnonzero(last)
    shifts = ((ends[gid] - np.arange(b.size)) * 7).astype(np.uint64)
    vals = (b & np.uint8(0x7F)).astype(np.uint64) << shifts
    start_idx = np.flatnonzero(starts)
    return np.add.reduceat(vals, start_idx)


def vb_nbytes(values: np.ndarray) -> np.ndarray:
    """Encoded byte count per value (the same table vb_encode uses)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    return np.searchsorted(_THRESHOLDS, v, side="right") + 1


def vb_encode_segments(
    values: np.ndarray, seg_starts: np.ndarray
) -> list[bytes]:
    """Encode one concatenated value array, split into per-segment byte
    strings.  One vectorized pass regardless of segment count — the
    per-group encoder loop becomes a byte-slice loop."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return [b""] * max(len(seg_starts), 0)
    buf = vb_encode(v)
    nb = vb_nbytes(v)
    ends = np.cumsum(nb)
    byte_starts = np.concatenate(([0], ends))[seg_starts]
    bounds = np.append(byte_starts, len(buf)).astype(np.int64)
    return [buf[bounds[i]: bounds[i + 1]] for i in range(len(seg_starts))]


def delta_with_resets(values: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Per-segment delta stream: within a segment gaps, at each segment
    start ``value + 1`` (the delta_encode_docs convention)."""
    x = np.ascontiguousarray(values, dtype=np.int64)
    if x.size == 0:
        return np.empty(0, dtype=np.uint64)
    d = np.diff(x, prepend=-1)
    d[seg_starts] = x[seg_starts] + 1
    return d.astype(np.uint64)


def delta_encode_docs(doc_ids: np.ndarray) -> bytes:
    """Encode a strictly-ascending int array as varbyte'd gaps.

    Gap sequence: ``d[0] = ids[0] + 1``, ``d[i] = ids[i] - ids[i-1]`` —
    all gaps >= 1, so a zero byte never appears as a full value.
    """
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if ids.size == 0:
        return b""
    gaps = np.diff(ids, prepend=-1)
    return vb_encode(gaps.astype(np.uint64))


def delta_decode_docs(buf: bytes) -> np.ndarray:
    gaps = vb_decode(buf).astype(np.int64)
    if gaps.size == 0:
        return gaps
    return np.cumsum(gaps) - 1


def encode_positions(positions: np.ndarray, counts: np.ndarray) -> bytes:
    """Encode concatenated per-doc ascending position lists.

    ``positions`` is the concatenation of each doc's position list;
    ``counts[i]`` is the length of doc i's list (its tf).  Deltas reset at
    each doc boundary (first position of a doc stored as ``pos + 1``).
    """
    p = np.ascontiguousarray(positions, dtype=np.int64)
    c = np.ascontiguousarray(counts, dtype=np.int64)
    if p.size == 0:
        return b""
    d = np.diff(p, prepend=-1)
    starts = np.zeros(c.size, dtype=np.int64)
    np.cumsum(c[:-1], out=starts[1:])
    starts = starts[c > 0]
    d[starts] = p[starts] + 1
    return vb_encode(d.astype(np.uint64))


def decode_positions(buf: bytes, counts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_positions`; returns the flat position array
    (caller splits by ``counts``)."""
    d = vb_decode(buf).astype(np.int64)
    if d.size == 0:
        return d
    c = np.ascontiguousarray(counts, dtype=np.int64)
    starts = np.zeros(c.size, dtype=np.int64)
    np.cumsum(c[:-1], out=starts[1:])
    starts = starts[c > 0]
    # segmented cumsum: subtract the running total up to each segment start
    cs = np.cumsum(d)
    seg_base = np.zeros(d.size, dtype=np.int64)
    seg_base[starts] = cs[starts] - d[starts]
    np.maximum.accumulate(seg_base, out=seg_base)
    return cs - seg_base - 1
