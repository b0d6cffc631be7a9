"""Fielded BM25 — vectorized twin of the reference's scoring formulas.

Reference formulas (``/root/reference/search_engine/inverted_index.py``):

* IDF: ``ln((N - df + 0.5) / (df + 0.5))`` (:1221-1222)
* term weight: ``tf / (1 - b + b * (len / avg_len))`` with b=0.75 (:1224-1231)
* fielded combine: ``tf' = w_body + 2.0 * w_title`` (:1410-1414)
* score: ``sum_i idf_i * tf'_i * (k+1) / (tf'_i + k)`` with k=1.6 (:1233-1242),
  summed **in query-token order** (rank-identity requires matching float
  summation order).

The zip-truncation quirk: the reference zips a per-query-token IDF list with
a per-*kept*-token weight list (pruned terms dropped), so the i-th kept
token is scored with the i-th query token's IDF
(``inverted_index.py:1240, 1726-1728``).  Callers pass ``idfs`` already
laid out that way (see ``plans/planner.py``).
"""

from __future__ import annotations

import math

import numpy as np


def calculate_idf(n_docs: int, doc_freq: int) -> float:
    return math.log((n_docs - doc_freq + 0.5) / (doc_freq + 0.5))


def term_weight(
    tf: np.ndarray, doc_len: np.ndarray, avg_len: float, b: float = 0.75
) -> np.ndarray:
    """``tf / (1 - b + b * (dl / avg))`` elementwise, float64 — identical op
    order to the reference so results are bit-equal."""
    return tf / (1.0 - b + b * (doc_len / avg_len))


def fielded_bm25(
    idfs: np.ndarray,
    tf_body: np.ndarray,
    tf_title: np.ndarray,
    doc_len: np.ndarray,
    title_len: np.ndarray,
    avg_doc_len: float,
    avg_title_len: float,
    k1: float = 1.6,
    b: float = 0.75,
    title_weight: float = 2.0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Score a (docs x tokens) tf matrix pair; returns (score, body, title)
    per doc.

    ``tf_body``/``tf_title``: shape (n_docs, n_cols); ``idfs``: shape
    (n_cols,) — already truncated/aligned per the zip quirk.  Summation runs
    left-to-right over columns to replicate the reference's accumulation
    order (``inverted_index.py:1239-1242``).
    """
    n_docs = tf_body.shape[0]
    if n_docs == 0:
        z = np.empty(0, dtype=np.float64)
        return z, z.copy(), z.copy()
    w_body = term_weight(tf_body.astype(np.float64), doc_len[:, None], avg_doc_len, b)
    if avg_title_len > 0.0:
        w_title = term_weight(
            tf_title.astype(np.float64), title_len[:, None], avg_title_len, b
        )
    else:
        # all-empty-title corpus: avg=0 would NaN every score via 0/0;
        # title tf is necessarily 0 everywhere, so the weight is exactly 0
        w_title = np.zeros_like(w_body)
    w_comb = w_body + title_weight * w_title

    def _sum_in_order(weights: np.ndarray) -> np.ndarray:
        contrib = idfs[None, :] * (weights * (k1 + 1.0)) / (weights + k1)
        score = np.zeros(n_docs, dtype=np.float64)
        for j in range(contrib.shape[1]):  # left-to-right float order
            score += contrib[:, j]
        return score

    return _sum_in_order(w_comb), _sum_in_order(w_body), _sum_in_order(w_title)
