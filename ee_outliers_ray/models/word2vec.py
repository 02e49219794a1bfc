"""word2vec analyzer as a per-group train+eval Ray Data plan — full
semantic parity with the reference analyzer
(/root/reference/app/analyzers/word2vec.py:27-135 config surface,
419-633 scoring; ml_models/word2vec.py:105-141 vocabulary, 211-259
probability model, 262-343 neural model).

Reference shape preserved: the model is PER AGGREGATOR GROUP
(word2vec.py:311-317).  Per group: tokenize targets by the configured
``separators`` regex, build the occurrence-ordered vocabulary (UNKNOWN
token for sub-threshold words), produce skip-gram (center, context)
pairs, score each pair either with

- the exact probability model (``use_prob_model``,
  ml_models/word2vec.py:211-259) — P(context|center) replicated
  INCLUDING the reference's +1 initialisation quirk, log-probs when
  ``output_prob`` is off; or
- a trained embedding+linear softmax model (ml_models/word2vec.py:
  262-343): numpy Adam + cross-entropy on shuffled minibatches of 16 —
  a deterministic seeded clone of the torch training loop (torch is not
  available here; init/shuffle RNG streams differ from torch's, so
  scores match the reference's *distribution*, not bit-for-bit — the
  documented deviation).

Scores then follow word2vec.py:419-633 exactly: per word-occurrence
center/context/total scores (geometric mean when ``output_prob``),
per-text center/context/total/mean scores, frontier per word_id
(trigger_focus=word, with the >1-distinct-window guard,
word2vec.py:818) or one frontier over text scores (trigger_focus=text),
and observation fields (score, decision_frontier, confidence,
expected_words, expected_window_words, size_window, score_type).
"""

from __future__ import annotations

import math
import re
from collections import Counter
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .frontier import get_decision_frontier, is_outlier
from .terms import _drop_null_keys, add_key_column

UNKNOWN = "UNKNOWN"


@dataclass
class W2VSettings:
    """Mirror of the reference's model_settings (word2vec.py:27-135)."""
    separators: str = " "
    size_window: int = 2
    # the reference's defaults (word2vec.py:71-84): the early-training
    # regime, where pair frequency dominates the softmax scores — rare
    # word sequences score lowest (training to convergence would instead
    # let them overfit to high self-probability)
    num_epochs: int = 1
    learning_rate: float = 0.001
    embedding_size: int = 40
    seed: int = 42
    use_prob_model: bool = False
    output_prob: bool = True
    min_uniq_word_occurrence: int = 1
    max_voc_size: int = 6000
    drop_duplicates: bool = False
    min_target_buckets: int | None = None
    trigger_focus: str = "text"     # "word" | "text"
    trigger_score: str = "mean"     # "center" | "context" | "total" | "mean"
    trigger_on: str = "low"
    trigger_method: str = "stdev"
    trigger_sensitivity: float = 1.0

    def __post_init__(self):
        if self.trigger_focus not in {"word", "text"}:
            raise ValueError(f"Unexpected trigger focus {self.trigger_focus}")
        if self.trigger_score not in {"center", "context", "total", "mean"}:
            raise ValueError(f"Unexpected trigger score {self.trigger_score}")
        if self.trigger_score == "mean" and self.trigger_focus == "word":
            raise ValueError(
                "trigger_focus=word is not compatible with trigger_score=mean")

    @property
    def use_geo_mean(self) -> bool:
        # word2vec.py:69 — geometric mean exactly when probabilities are
        # the output unit
        return self.output_prob


def _mean(vals: list[float], use_geo_mean: bool) -> float:
    a = np.asarray(vals, dtype=np.float64)
    if use_geo_mean:
        return float(a.prod() ** (1.0 / len(a)))
    return float(a.mean())


def split_text_by_separator(text: str, separators: str) -> list[str]:
    """Reference utils.py:522-534: regex split; '' -> char split."""
    if separators == "":
        return list(text)
    return re.split(separators, text)


class GroupWord2Vec:
    """Train + score one aggregator group's target sentences."""

    def __init__(self, settings: W2VSettings):
        self.s = settings
        self.voc_counter: Counter = Counter()
        self.word2id: dict[str, int] = {}
        self.id2word: dict[int, str] = {}
        self.voc_size = 0
        self.num_unknown_occurrence = 0

    # --- vocabulary (ml_models/word2vec.py:105-141) ---------------------
    def _tokenize(self, data: list[str]) -> list[list[str]]:
        return [split_text_by_separator(x, self.s.separators) for x in data]

    def prepare(self, data: list[str]) -> None:
        toks = self._tokenize(data)
        for t in toks:
            self.voc_counter.update(t)
        tmp = dict(self.voc_counter.most_common())
        self.num_unknown_occurrence = sum(
            v for v in tmp.values() if v < self.s.min_uniq_word_occurrence)
        if self.s.min_uniq_word_occurrence > 1:
            tmp = {k: v for k, v in tmp.items()
                   if v >= self.s.min_uniq_word_occurrence}
        voc_list = list(tmp)[:self.s.max_voc_size] + [UNKNOWN]
        self.voc_size = len(voc_list)
        self.word2id = {w: i for i, w in enumerate(voc_list)}
        self.id2word = {i: w for i, w in enumerate(voc_list)}

    def _word_id(self, w: str) -> int:
        return self.word2id.get(w, self.word2id[UNKNOWN])

    def _model_inputs(self, data: list[str]) -> list[tuple]:
        """(center_idx, center_id, context_idx, context_id, text_idx)
        (ml_models/word2vec.py:173-197)."""
        out = []
        win = self.s.size_window
        for text_idx, text in enumerate(self._tokenize(data)):
            ids = [self._word_id(w) for w in text]
            n = len(ids)
            for ci in range(n):
                for xi in range(max(0, ci - win), min(ci + win + 1, n)):
                    if ci != xi:
                        out.append((ci, ids[ci], xi, ids[xi], text_idx))
        return out

    # --- probability model (ml_models/word2vec.py:211-259) --------------
    def prob_model_outputs(self, data: list[str]) -> list[tuple]:
        inputs = self._model_inputs(data)
        pair_count: dict[int, dict[int, float]] = {}
        center_total: dict[int, float] = {}
        # the reference initialises counts at 1 and THEN increments —
        # replicated verbatim (off-by-one smoothing quirk)
        for _, center_id, _, context_id, _ in inputs:
            if center_id not in pair_count:
                pair_count[center_id] = {}
                center_total[center_id] = 1
            if context_id not in pair_count[center_id]:
                pair_count[center_id][context_id] = 1
            pair_count[center_id][context_id] += 1
            center_total[center_id] += 1
        out = []
        for ci, center_id, xi, context_id, ti in inputs:
            prob = pair_count[center_id][context_id] / center_total[center_id]
            if not self.s.output_prob:   # word2vec.py:324 passes output_prob
                prob = math.log(prob)
            out.append((ci, center_id, xi, context_id, ti, prob))
        return out

    # --- neural model (ml_models/word2vec.py:262-343, numpy clone) ------
    def train_eval_outputs(self, data: list[str]) -> list[tuple]:
        s = self.s
        inputs = self._model_inputs(data)
        V, E = self.voc_size, s.embedding_size
        rng = np.random.default_rng(s.seed if s.seed != 0 else None)
        # torch init distributions: Embedding ~ N(0,1); Linear weight/bias
        # ~ U(-1/sqrt(E), 1/sqrt(E)) — same distributions, our RNG stream
        emb = rng.standard_normal((V, E))
        bound = 1.0 / math.sqrt(E)
        lin_w = rng.uniform(-bound, bound, size=(V, E))
        lin_b = rng.uniform(-bound, bound, size=V)

        centers = np.array([p[1] for p in inputs], dtype=np.int64)
        contexts = np.array([p[3] for p in inputs], dtype=np.int64)

        # Adam state (dense, like torch Adam over the full tensors)
        params = [emb, lin_w, lin_b]
        m = [np.zeros_like(p) for p in params]
        v = [np.zeros_like(p) for p in params]
        b1, b2, eps = 0.9, 0.999, 1e-8
        t = 0
        B = 16  # reference train_batch_size
        for _ in range(s.num_epochs):
            order = rng.permutation(len(inputs))
            for i0 in range(0, len(order), B):
                idx = order[i0:i0 + B]
                c, o = centers[idx], contexts[idx]
                x = emb[c]                              # (b, E)
                logits = x @ lin_w.T + lin_b            # (b, V)
                logits -= logits.max(axis=1, keepdims=True)
                ex = np.exp(logits)
                p = ex / ex.sum(axis=1, keepdims=True)
                d = p.copy()
                d[np.arange(len(idx)), o] -= 1.0
                d /= len(idx)                           # CE mean reduction
                g_lin_w = d.T @ x
                g_lin_b = d.sum(axis=0)
                g_x = d @ lin_w
                g_emb = np.zeros_like(emb)
                np.add.at(g_emb, c, g_x)
                t += 1
                for p_, m_, v_, g_ in zip(params, m, v,
                                          [g_emb, g_lin_w, g_lin_b]):
                    m_ += (1 - b1) * (g_ - m_)
                    v_ += (1 - b2) * (g_ * g_ - v_)
                    mh = m_ / (1 - b1 ** t)
                    vh = v_ / (1 - b2 ** t)
                    p_ -= s.learning_rate * mh / (np.sqrt(vh) + eps)

        # eval (ml_models/word2vec.py:346-400): softmax probs, or raw
        # logits when output_raw (= not output_prob)
        out = []
        logits_all = emb[centers] @ lin_w.T + lin_b
        if s.output_prob:
            z = logits_all - logits_all.max(axis=1, keepdims=True)
            ez = np.exp(z)
            vals = ez[np.arange(len(inputs)), contexts] / ez.sum(axis=1)
        else:
            vals = logits_all[np.arange(len(inputs)), contexts]
        for p_in, val in zip(inputs, vals):
            out.append((*p_in, float(val)))
        return out

    # --- scoring (word2vec.py:419-633) ----------------------------------
    def find_outliers(self, data: list[str]) -> list[dict]:
        """Returns one dict per text: {text_idx, is_outlier, score,
        decision_frontier, observations}."""
        s = self.s
        if s.use_prob_model:
            outputs = self.prob_model_outputs(data)
        else:
            outputs = self.train_eval_outputs(data)
        if not outputs:  # no text produced any (center, context) pair
            return []

        # group by text, preserving pair order
        by_text: dict[int, list[tuple]] = {}
        for row in outputs:
            by_text.setdefault(row[4], []).append(row)

        geo = s.use_geo_mean
        # per-text word scores; global per-word-id score lists; compo maps
        text_word_scores: dict[int, dict] = {}   # text -> word_key -> {type: score}
        word_id_scores: dict[int, dict] = {"center": {}, "context": {},
                                           "total": {}}
        text_scores: dict[str, dict] = {"center": {}, "context": {},
                                        "total": {}, "mean": {}}
        word_id_to_compo: dict[str, dict] = {"center": {}, "context": {},
                                             "total": {}}
        compo_to_word_id: dict[str, dict] = {"center": {}, "context": {},
                                             "total": {}}

        for text_idx, rows in by_text.items():
            center_vals: dict[tuple, list] = {}
            context_vals: dict[tuple, list] = {}
            compo: dict[tuple, str] = {}
            all_vals = []
            for ci, cid, xi, xid, _, val in rows:
                ck, xk = (ci, cid), (xi, xid)
                center_vals.setdefault(ck, [])
                compo.setdefault(ck, "")
                center_vals[ck].append(val)
                compo[ck] += str(xid) + "|"
                context_vals.setdefault(xk, []).append(val)
                all_vals.append(val)
            per_word = {}
            c_list, x_list, t_list = [], [], []
            for wk in center_vals:
                c_sc = _mean(center_vals[wk], geo)
                x_sc = _mean(context_vals[wk], geo)
                t_sc = _mean([c_sc, x_sc], geo)
                _, wid = wk
                ck = compo[wk]
                per_word[wk] = {"center": c_sc, "context": x_sc,
                                "total": t_sc, "compo": ck}
                for st, sc in (("center", c_sc), ("context", x_sc),
                               ("total", t_sc)):
                    compo_to_word_id[st].setdefault(ck, {})[wid] = sc
                    word_id_to_compo[st].setdefault(wid, {})[ck] = sc
                    word_id_scores[st].setdefault(wid, []).append(sc)
                c_list.append(c_sc)
                x_list.append(x_sc)
                t_list.append(t_sc)
            text_word_scores[text_idx] = per_word
            text_scores["center"][text_idx] = _mean(c_list, geo)
            text_scores["context"][text_idx] = _mean(x_list, geo)
            text_scores["total"][text_idx] = _mean(t_list, geo)
            text_scores["mean"][text_idx] = _mean(all_vals, geo)

        # frontiers (word2vec.py:606-633)
        word_frontier = None
        text_frontier = None
        if s.trigger_focus == "text":
            text_frontier = get_decision_frontier(
                s.trigger_method,
                list(text_scores[s.trigger_score].values()),
                s.trigger_sensitivity, s.trigger_on)
        else:
            word_frontier = {
                wid: get_decision_frontier(s.trigger_method, scores,
                                           s.trigger_sensitivity,
                                           s.trigger_on)
                for wid, scores in word_id_scores[s.trigger_score].items()
            }

        results = []
        for text_idx in sorted(text_scores[s.trigger_score]):
            found = False
            score = text_scores[s.trigger_score][text_idx]
            frontier = text_frontier
            obs: dict = {"size_window": s.size_window,
                         "score_type": s.trigger_score}
            if s.trigger_focus == "text":
                if is_outlier(score, text_frontier, s.trigger_on):
                    found = True
                    obs["score"] = score
                    obs["decision_frontier"] = text_frontier
                    obs["confidence"] = float(abs(text_frontier - score))
            else:
                out_words, out_scores, out_frontiers = [], [], []
                expected_words, expected_window = {}, {}
                for wk, sc_map in text_word_scores[text_idx].items():
                    _, wid = wk
                    w_sc = sc_map[s.trigger_score]
                    w_fr = word_frontier[wid]
                    compo_map = word_id_to_compo[s.trigger_score][wid]
                    # the >1-distinct-window guard (word2vec.py:818)
                    if is_outlier(w_sc, w_fr, s.trigger_on) \
                            and len(compo_map) > 1:
                        found = True
                        word = self.id2word[wid]
                        out_words.append(word)
                        out_scores.append(w_sc)
                        out_frontiers.append(w_fr)
                        best_compo = max(compo_map.items(),
                                         key=lambda kv: kv[1])[0]
                        expected_window[word] = [
                            self.id2word[int(x)]
                            for x in best_compo.split("|")[:-1]]
                        # most probable word within this occurrence's OWN
                        # window composition (word2vec.py:847-876)
                        cand = compo_to_word_id[s.trigger_score] \
                            .get(sc_map["compo"], {})
                        if cand:
                            best_wid = max(cand.items(),
                                           key=lambda kv: kv[1])[0]
                            if best_wid != wid:
                                expected_words[word] = self.id2word[best_wid]
                if found:
                    # report the worst word per trigger direction
                    pick = int(np.argmin(out_scores)) if s.trigger_on == "low" \
                        else int(np.argmax(out_scores))
                    score = out_scores[pick]
                    frontier = out_frontiers[pick]
                    obs["score"] = {w: s_ for w, s_ in
                                    zip(out_words, out_scores)}
                    obs["decision_frontier"] = {
                        w: f_ for w, f_ in zip(out_words, out_frontiers)}
                    obs["confidence"] = {
                        w: float(abs(f_ - s_)) for w, s_, f_ in
                        zip(out_words, out_scores, out_frontiers)}
                    obs["expected_words"] = expected_words
                    obs["expected_window_words"] = {
                        k: str(v) for k, v in expected_window.items()}
            results.append({"text_idx": text_idx, "is_outlier": found,
                            "score": float(score) if score is not None else 0.0,
                            "decision_frontier": float(frontier)
                            if frontier is not None else float("nan"),
                            "observations": obs})
        return results


def confusion_matrix(results: list[dict], labels: list[int]) -> dict:
    """TP/TN/FP/FN + precision/recall/F-score against a per-text 0/1
    ``label`` column (reference word2vec.py:640-699: evaluation mode for
    labeled corpora; label==1 means true outlier)."""
    cm = {"TP": 0, "TN": 0, "FP": 0, "FN": 0}
    by_idx = {r["text_idx"]: r["is_outlier"] for r in results}
    for i, lab in enumerate(labels):
        found = bool(by_idx.get(i, False))
        if found:
            cm["TP" if lab == 1 else "FP"] += 1
        else:
            cm["FN" if lab == 1 else "TN"] += 1
    pos = cm["TP"] + cm["FN"]
    pred = cm["TP"] + cm["FP"]
    recall = cm["TP"] / pos if pos else None
    precision = cm["TP"] / pred if pred and cm["TP"] else None
    f_measure = (2 * precision * recall / (precision + recall)) \
        if precision is not None and recall else None
    return {**cm, "precision": precision, "recall": recall,
            "f_measure": f_measure}


def word2vec_model(ds, aggregator, target, *, trigger_method: str = "stdev",
                   trigger_sensitivity: float = 1.0, trigger_on: str = "low",
                   seed: int = 42, order_col: str | None = None,
                   target_sep: str = " - ", **model_kw):
    """Returns outlier rows: original columns + (aggregator, target,
    w2v_score, decision_frontier, w2v_observations).

    Ray plan: one ``groupby(aggregator)`` shuffle; training happens
    inside one ``map_groups`` task per group, over sentences in a
    deterministic order (``order_col`` when given — the reference forces
    chronological input for seeded runs, word2vec.py:91-93 — else sorted
    by target text)."""
    settings = W2VSettings(seed=seed, trigger_method=trigger_method,
                           trigger_sensitivity=trigger_sensitivity,
                           trigger_on=trigger_on, **model_kw)
    ds = add_key_column(ds, aggregator, "aggregator")
    ds = add_key_column(ds, target, "target", sep=target_sep)
    ds = _drop_null_keys(ds, ["aggregator", "target"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if order_col is not None:
            g = g.sort_values(order_col, kind="stable").reset_index(drop=True)
        else:
            g = g.sort_values("target", kind="stable").reset_index(drop=True)
        if settings.drop_duplicates:
            g = g.drop_duplicates("target", keep="first") \
                .reset_index(drop=True)

        def _empty():
            out = g.iloc[0:0].copy()
            out["w2v_score"] = pd.Series(dtype=np.float64)
            out["decision_frontier"] = pd.Series(dtype=np.float64)
            out["w2v_observations"] = pd.Series(dtype=object)
            return out

        if settings.min_target_buckets is not None and \
                len(g) < settings.min_target_buckets:
            return _empty()  # reference carries under-filled buckets

        targets = g["target"].tolist()
        model = GroupWord2Vec(settings)
        model.prepare(targets)
        results = model.find_outliers(targets)
        flagged = [r for r in results if r["is_outlier"]]
        if not flagged:
            return _empty()
        idx = [r["text_idx"] for r in flagged]
        out = g.iloc[idx].copy()
        out["w2v_score"] = [r["score"] for r in flagged]
        out["decision_frontier"] = [r["decision_frontier"] for r in flagged]
        out["w2v_observations"] = [repr(r["observations"]) for r in flagged]
        return out

    return ds.groupby("aggregator").map_groups(fn, batch_format="pandas")
