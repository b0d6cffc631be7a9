"""Numpy MLP re-ranker — architecture of the reference's RankingModel
(``/root/reference/ranking_model/model/model.py:6-25``): Linear(10->h) ->
ReLU -> Linear(h->h) -> ReLU -> Linear(h->1), hidden 256
(``train.py:40-43``).  A 10x256x256 matmul per <=100 candidates is
microscopic — plain numpy, weights broadcast into the feature kernel.

No trained weights ship with the reference repo; ``RankingModel.seeded``
gives a deterministic He-initialized network so the full re-rank path is
exercised end-to-end, and ``load``/``save`` (npz) accept real weights.
"""

from __future__ import annotations

import numpy as np

N_FEATURES = 10


class RankingModel:
    def __init__(self, weights: dict[str, np.ndarray]):
        self.w = weights

    @classmethod
    def seeded(cls, hidden: int = 256, seed: int = 17) -> "RankingModel":
        rng = np.random.default_rng(seed)

        def he(fan_in, shape):
            return rng.standard_normal(shape) * np.sqrt(2.0 / fan_in)

        return cls(
            {
                "w1": he(N_FEATURES, (N_FEATURES, hidden)),
                "b1": np.zeros(hidden),
                "w2": he(hidden, (hidden, hidden)),
                "b2": np.zeros(hidden),
                "w3": he(hidden, (hidden, 1)),
                "b3": np.zeros(1),
            }
        )

    @classmethod
    def load(cls, path: str) -> "RankingModel":
        return cls(dict(np.load(path)))

    def save(self, path: str) -> None:
        np.savez(path, **self.w)

    def forward(self, x: np.ndarray) -> np.ndarray:
        """(n, 10) features -> (n,) scores."""
        w = self.w
        h = np.maximum(x @ w["w1"] + w["b1"], 0.0)
        h = np.maximum(h @ w["w2"] + w["b2"], 0.0)
        return (h @ w["w3"] + w["b3"]).ravel()
