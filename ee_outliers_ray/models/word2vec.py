"""word2vec analyzer as a per-group train+eval Ray Data plan (reference
/root/reference/app/analyzers/word2vec.py + ml_models/word2vec.py:18-400;
BETA in the reference, documentation/CONFIG_OUTLIERS.md:32).

Reference shape preserved: the model is PER AGGREGATOR GROUP
(word2vec.py:311-317) — vocab built from the group's target sentences,
skip-gram training over (center, context) pairs (ml_models/word2vec.py:
173-197), every sentence scored by its words' context probabilities, and
a decision frontier over the scores flags outliers (trigger low = least
probable word sequences).

Implementation is numpy SGD with negative sampling (torch is not in this
environment), fully seeded — deterministic across runs and parallelism
levels because training happens inside one ``map_groups`` task per group
over sentences sorted deterministically (the reference forces
chronological input for seeded runs, word2vec.py:91-93; we sort by the
sentence text + doc order instead, which is stable under shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..tokenizer import tokenize
from .frontier import get_decision_frontier, is_outlier
from .terms import _drop_null_keys, add_key_column


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30.0, 30.0)))


class GroupWord2Vec:
    """Train + score one group's sentences (deterministic, seeded)."""

    def __init__(self, dim: int = 16, window: int = 2, negative: int = 3,
                 epochs: int = 10, lr: float = 0.2, seed: int = 42):
        self.dim = dim
        self.window = window
        self.negative = negative
        self.epochs = epochs
        self.lr = lr
        self.seed = seed

    def _pairs(self, sent_ids: list[np.ndarray]) -> np.ndarray:
        out = []
        for ids in sent_ids:
            n = len(ids)
            for i in range(n):
                for j in range(max(0, i - self.window),
                               min(n, i + self.window + 1)):
                    if i != j:
                        out.append((ids[i], ids[j]))
        return np.asarray(out, dtype=np.int64) if out else \
            np.zeros((0, 2), dtype=np.int64)

    def train_and_score(self, sentences: list[str]) -> np.ndarray:
        tokenized = [tokenize(s) for s in sentences]
        vocab: dict[str, int] = {}
        for toks in sorted(set(tuple(t) for t in tokenized)):
            for w in toks:
                if w not in vocab:
                    vocab[w] = len(vocab)
        V = max(1, len(vocab))
        rng = np.random.default_rng(self.seed)
        W_in = (rng.random((V, self.dim)) - 0.5) / self.dim
        W_out = np.zeros((V, self.dim))

        # train on the full sentence stream in deterministic order so
        # frequent patterns reinforce (frequency IS the outlier signal);
        # the reference dedups only its evaluation set (word2vec.py:240-242)
        ordered = sorted(tuple(t) for t in tokenized)
        sent_ids = [np.array([vocab[w] for w in toks], dtype=np.int64)
                    for toks in ordered if toks]
        pairs = self._pairs(sent_ids)
        for _ in range(self.epochs):
            order = rng.permutation(len(pairs))
            for idx in order:
                c, o = pairs[idx]
                # positive
                v, u = W_in[c], W_out[o]
                g = _sigmoid(v @ u) - 1.0
                W_in[c] = v - self.lr * g * u
                W_out[o] = u - self.lr * g * v
                # negatives
                for n in rng.integers(0, V, size=self.negative):
                    if n == o:
                        continue
                    u2 = W_out[n]
                    g2 = _sigmoid(W_in[c] @ u2)
                    W_in[c] -= self.lr * g2 * u2
                    W_out[n] -= self.lr * g2 * W_in[c]

        def score(toks: list[str]) -> float:
            ids = [vocab[w] for w in toks if w in vocab]
            if len(ids) < 2:
                return 0.0
            ps = []
            for i, c in enumerate(ids):
                for j in range(max(0, i - self.window),
                               min(len(ids), i + self.window + 1)):
                    if i != j:
                        ps.append(_sigmoid(W_in[c] @ W_out[ids[j]]))
            return float(np.mean(ps)) if ps else 0.0

        return np.array([score(t) for t in tokenized])


def word2vec_model(ds, aggregator, target, *, trigger_method: str = "stdev",
                   trigger_sensitivity: float = 1.0, trigger_on: str = "low",
                   seed: int = 42, **model_kw):
    """Returns outlier rows: original columns + (aggregator, target,
    w2v_score, decision_frontier)."""
    ds = add_key_column(ds, aggregator, "aggregator")
    ds = add_key_column(ds, target, "target")
    ds = _drop_null_keys(ds, ["aggregator", "target"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("target", kind="stable").reset_index(drop=True)
        model = GroupWord2Vec(seed=seed, **model_kw)
        scores = model.train_and_score(g["target"].tolist())
        frontier = get_decision_frontier(trigger_method, scores,
                                         trigger_sensitivity, trigger_on)
        flagged = np.asarray(is_outlier(scores, frontier, trigger_on))
        out = g[flagged].copy()
        out["w2v_score"] = scores[flagged]
        out["decision_frontier"] = float(frontier)
        if not flagged.any():
            out = g.iloc[0:0].copy()
            out["w2v_score"] = pd.Series(dtype=np.float64)
            out["decision_frontier"] = pd.Series(dtype=np.float64)
        return out

    return ds.groupby("aggregator").map_groups(fn, batch_format="pandas")
