"""Re-ranker training — numpy twin of the reference's torch loop
(``/root/reference/search_engine/ranking_model/train.py:40-213``) over the
dataset produced by :mod:`search_engine_spark.pipeline.dataset`.

Replicated exactly:

* example assembly from the wide split frames, including the reference's
  negative-slot selection quirk (``utils/dataset.py:31-51``): of the 12
  rank columns, drop ``{6, 95}`` when the positive matched none,
  ``{match, 95}`` when it matched a top rank, ``{6, match}`` when it
  matched a bottom rank — 1 positive + 10 negatives per example, target
  ``[1, 0, ..., 0]``;
* the listwise loss INCLUDING the reference's double-softmax
  (``utils/losses.py:5-7``: ``cross_entropy(softmax(pred), target)``) —
  its analytic gradient is ``p ⊙ (g − (g·p))`` with ``p = softmax(x)``,
  ``g = softmax(p) − t``, backpropagated through the 3-layer ReLU MLP;
* Adam (lr 5e-4, torch defaults) over shuffled minibatches of 64,
  MRR@10 / nDCG@10 on the held-out splits.

Scale path: :func:`distributed_grads` computes the full-batch gradient as
a ``mapInPandas`` partial-gradient sum over an examples DataFrame
(weights broadcast in the closure, one reduce per step) — data-parallel
synchronous GD, the idiomatic Spark shape for a model this small (130k
parameters; the *data*, not the model, is what outgrows one node).  The
minibatch driver loop and the distributed full-batch gradient are
verified equal in tests.
"""

from __future__ import annotations

import numpy as np

from search_engine_spark.pipeline.dataset import FEATURE_COLUMNS
from search_engine_spark.ranking.metrics import mrr, ndcg
from search_engine_spark.ranking.model import RankingModel

N_SAMPLES = 11  # 1 positive + 10 negatives


def neg_rank_names(match: int | None) -> list[int]:
    """The 10 negative rank columns used for one example
    (utils/dataset.py:31-51, num_negative_samples=12 after the +2)."""
    if match is None:
        drop = {6, 95}
    elif match <= 6:
        drop = {match, 95}
    else:
        drop = {6, match}
    increasing = [r for r in [1, 2, 3, 4, 5, 6] if r not in drop]
    decreasing = [r for r in [100, 99, 98, 97, 96, 95] if r not in drop]
    return increasing + decreasing


def build_examples(wide_pdf) -> tuple[np.ndarray, np.ndarray]:
    """Wide pandas frame (pos features + per-rank features + ``match``)
    -> (X: (n, 11, 10), T: (n, 11)).  Row order is preserved (sort the
    frame by ``index`` first for determinism)."""
    n = len(wide_pdf)
    X = np.empty((n, N_SAMPLES, len(FEATURE_COLUMNS)), dtype=np.float64)
    pos = wide_pdf[FEATURE_COLUMNS].to_numpy(dtype=np.float64)
    X[:, 0, :] = pos
    matches = wide_pdf["match"].tolist()
    for i, m in enumerate(matches):
        m_int = int(m) if m is not None and str(m) != "nan" else None
        for s, r in enumerate(neg_rank_names(m_int)):
            X[i, s + 1, :] = [
                wide_pdf[f"{c}_{r}"].iloc[i] for c in FEATURE_COLUMNS
            ]
    T = np.zeros((n, N_SAMPLES), dtype=np.float64)
    T[:, 0] = 1.0
    return X, T


# ------------------------------------------------------------ loss/grad

def _softmax(x: np.ndarray) -> np.ndarray:
    z = x - x.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def listwise_loss_grad(
    scores: np.ndarray, targets: np.ndarray
) -> tuple[float, np.ndarray]:
    """Reference loss: cross_entropy(softmax(scores), targets) with
    probability targets (losses.py:5-7).  Returns (mean loss, d loss /
    d scores) — see module docstring for the derivation."""
    p = _softmax(scores)            # the reference's explicit softmax
    q = _softmax(p)                 # cross_entropy's internal log_softmax
    logq = p - p.max(axis=1, keepdims=True)
    logq = logq - np.log(
        np.exp(logq).sum(axis=1, keepdims=True)
    )
    loss = float(-(targets * logq).sum(axis=1).mean())
    g = q - targets                               # dL/dp
    gp = (g * p).sum(axis=1, keepdims=True)
    dscores = p * (g - gp) / scores.shape[0]      # batch-mean
    return loss, dscores


def forward_backward(
    w: dict[str, np.ndarray], X: np.ndarray, T: np.ndarray
) -> tuple[float, dict[str, np.ndarray]]:
    """One full forward+backward over (n, S, 10) examples -> (loss,
    gradient dict matching the weight dict keys)."""
    n, S, d = X.shape
    x = X.reshape(n * S, d)
    z1 = x @ w["w1"] + w["b1"]
    h1 = np.maximum(z1, 0.0)
    z2 = h1 @ w["w2"] + w["b2"]
    h2 = np.maximum(z2, 0.0)
    s = (h2 @ w["w3"] + w["b3"]).reshape(n, S)
    loss, ds = listwise_loss_grad(s, T)
    ds = ds.reshape(n * S, 1)
    grads = {
        "w3": h2.T @ ds,
        "b3": ds.sum(axis=0),
    }
    dh2 = (ds @ w["w3"].T) * (z2 > 0.0)
    grads["w2"] = h1.T @ dh2
    grads["b2"] = dh2.sum(axis=0)
    dh1 = (dh2 @ w["w2"].T) * (z1 > 0.0)
    grads["w1"] = x.T @ dh1
    grads["b1"] = dh1.sum(axis=0)
    return loss, grads


class Adam:
    """torch.optim.Adam defaults (betas 0.9/0.999, eps 1e-8)."""

    def __init__(self, lr: float = 5e-4, betas=(0.9, 0.999), eps=1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, betas[0], betas[1], eps
        self.t = 0
        self.m: dict[str, np.ndarray] = {}
        self.v: dict[str, np.ndarray] = {}

    def step(self, w: dict, grads: dict) -> None:
        self.t += 1
        for k, g in grads.items():
            m = self.m.setdefault(k, np.zeros_like(g))
            v = self.v.setdefault(k, np.zeros_like(g))
            m += (1 - self.b1) * (g - m)
            v += (1 - self.b2) * (g * g - v)
            mh = m / (1 - self.b1 ** self.t)
            vh = v / (1 - self.b2 ** self.t)
            w[k] = w[k] - self.lr * mh / (np.sqrt(vh) + self.eps)


def fit(
    X: np.ndarray,
    T: np.ndarray,
    epochs: int = 25,
    batch_size: int = 64,
    lr: float = 5e-4,
    hidden: int = 256,
    seed: int = 17,
    X_val: np.ndarray | None = None,
    T_val: np.ndarray | None = None,
) -> tuple[RankingModel, list[dict]]:
    """Minibatch Adam loop (train.py:69-141) -> (trained model, per-epoch
    history of loss / val MRR@10 / val nDCG@10)."""
    model = RankingModel.seeded(hidden=hidden, seed=seed)
    w = {k: v.copy() for k, v in model.w.items()}
    opt = Adam(lr=lr)
    rng = np.random.default_rng(seed)
    history: list[dict] = []
    n = X.shape[0]
    for epoch in range(epochs):
        order = rng.permutation(n)
        epoch_loss, n_batches = 0.0, 0
        for lo in range(0, n, batch_size):
            idx = order[lo : lo + batch_size]
            loss, grads = forward_backward(w, X[idx], T[idx])
            opt.step(w, grads)
            epoch_loss += loss
            n_batches += 1
        rec = {"epoch": epoch, "loss": epoch_loss / max(n_batches, 1)}
        if X_val is not None and len(X_val):
            scores = score_examples(w, X_val)
            rec["val_mrr10"] = mrr(scores)
            rec["val_ndcg10"] = ndcg(scores)
        history.append(rec)
    return RankingModel(w), history


def score_examples(w: dict, X: np.ndarray) -> np.ndarray:
    n, S, d = X.shape
    return RankingModel(w).forward(X.reshape(n * S, d)).reshape(n, S)


def evaluate(model: RankingModel, X: np.ndarray, num_topk: int = 10) -> dict:
    scores = score_examples(model.w, X)
    return {
        f"mrr@{num_topk}": mrr(scores, num_topk),
        f"ndcg@{num_topk}": ndcg(scores, num_topk),
    }


# ------------------------------------------------------------ distributed

EXAMPLES_SCHEMA = "features array<array<double>>, target array<double>"


def examples_to_df(spark, X: np.ndarray, T: np.ndarray):
    rows = [
        ([list(map(float, s)) for s in x], [float(v) for v in t])
        for x, t in zip(X, T)
    ]
    return spark.createDataFrame(rows, EXAMPLES_SCHEMA)


def distributed_grads(
    examples_df, w: dict[str, np.ndarray]
) -> tuple[float, dict[str, np.ndarray], int]:
    """Full-batch loss/gradient over an examples DataFrame: per-partition
    partial sums via ``mapInPandas`` (weights ride the closure —
    broadcast-sized: ~1 MB), one driver-side reduce.  Returns
    (sum-of-batch-mean-losses scaled back, summed grads, n_examples) so
    the caller can rescale to the global mean."""
    import pandas as pd

    keys = sorted(w)

    def part(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(
                [[list(s) for s in row] for row in pdf["features"]],
                dtype=np.float64,
            )
            T = np.array([list(t) for t in pdf["target"]], dtype=np.float64)
            loss, grads = forward_backward(w, X, T)
            n = X.shape[0]
            # forward_backward divides by the local batch size — undo so
            # partials sum to the global-sum gradient
            out = {"n": [n], "loss": [loss * n]}
            for k in keys:
                out[k] = [(grads[k] * n).ravel().tolist()]
            yield pd.DataFrame(out)

    schema = "n long, loss double, " + ", ".join(
        f"{k} array<double>" for k in keys
    )
    rows = examples_df.mapInPandas(part, schema).collect()
    n_total = sum(r.n for r in rows)
    loss = sum(r.loss for r in rows) / max(n_total, 1)
    grads = {
        k: sum(
            (np.array(r[k]).reshape(w[k].shape) for r in rows),
            start=np.zeros_like(w[k]),
        )
        / max(n_total, 1)
        for k in keys
    }
    return loss, grads, n_total


def fit_distributed(
    examples_df,
    epochs: int = 50,
    lr: float = 5e-4,
    hidden: int = 256,
    seed: int = 17,
) -> tuple[RankingModel, list[dict]]:
    """Full-batch synchronous GD: one Spark job per step, Adam on the
    driver — the cluster holds the data, the driver holds the 130k
    parameters."""
    model = RankingModel.seeded(hidden=hidden, seed=seed)
    w = {k: v.copy() for k, v in model.w.items()}
    opt = Adam(lr=lr)
    history = []
    for epoch in range(epochs):
        loss, grads, _n = distributed_grads(examples_df, w)
        opt.step(w, grads)
        history.append({"epoch": epoch, "loss": loss})
    return RankingModel(w), history
