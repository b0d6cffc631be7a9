"""IR metrics — numpy twins of the reference's torch implementations
(``/root/reference/search_engine/ranking_model/utils/metrics.py:4-32``).

Both assume slot 0 of each example is THE relevant document and all other
slots are non-relevant; rank of the positive = 1 + count of scores
strictly greater than it (ties rank the positive first, like the
reference's ``>`` comparison)."""

from __future__ import annotations

import numpy as np


def positive_ranks(y_pred: np.ndarray) -> np.ndarray:
    """(batch, samples) scores -> (batch,) rank of slot 0."""
    pos = y_pred[:, 0:1]
    return (y_pred > pos).sum(axis=1) + 1


def mrr(y_pred: np.ndarray, num_topk: int = 10) -> float:
    """Mean reciprocal rank@k (metrics.py:4-16)."""
    if y_pred.shape[0] == 0:
        return 0.0
    ranks = positive_ranks(y_pred).astype(np.float64)
    rr = 1.0 / ranks
    rr[ranks > num_topk] = 0.0
    return float(rr.mean())


def ndcg(y_pred: np.ndarray, num_topk: int = 10) -> float:
    """nDCG@k with a single relevant doc: DCG = 1/log2(rank+1), ideal = 1
    (metrics.py:19-32)."""
    if y_pred.shape[0] == 0:
        return 0.0
    ranks = positive_ranks(y_pred).astype(np.float64)
    dcg = 1.0 / np.log2(ranks + 1.0)
    dcg[ranks > num_topk] = 0.0
    return float(dcg.mean())
