"""Text analysis operators: language-id, quality scoring, token counting,
document fingerprinting — vectorized map_batches stages over a text
column (the training-data-pipeline layer on top of the tokenizer)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .functions import duck_round
from .tokenizer import tokenize, tokenize_column

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "nl": {"de", "het", "een", "en", "van", "ik", "dat", "die", "niet", "zijn"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"},
}

_STOP_EN = _LANG_STOPWORDS["en"]

# BPE-ish token split: word pieces, numbers, punctuation runs, whitespace
# collapsed — a deterministic proxy for subword token counting.
import re

_BPE_RE = re.compile(r"[a-zA-Z]+|\d{1,3}|[^\sa-zA-Z\d]")

_FP_BASE = np.uint64(1099511628211)
_FP_SEED = np.uint64(14695981039346656037)


class LangId:
    """Actor stage: stopword-profile language id (state: profiles)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.profiles = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}
        self.text_col = text_col
        self.id_col = id_col

    def predict(self, text: str) -> str:
        toks = tokenize(text)
        if not toks:
            return "und"
        best, best_score = "und", 0
        for lang, stops in self.profiles.items():
            score = sum(1 for t in toks if t in stops)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, b: pa.Table) -> pa.Table:
        preds = [self.predict(t) for t in b[self.text_col].to_pylist()]
        return pa.table({self.id_col: b[self.id_col],
                         "lang_pred": pa.array(preds)})


def langid(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(LangId,
                          fn_constructor_kwargs=dict(text_col=text_col,
                                                     id_col=id_col),
                          batch_format="pyarrow", concurrency=2)


def quality_scores(ds, text_col: str = "text", id_col: str = "doc_id",
                   round_to: int = 6):
    """Per-doc quality features: token count, mean token length, stopword
    ratio, alpha ratio.  Vectorized over the batch token list array."""

    def f(b: pa.Table) -> pa.Table:
        toks = tokenize_column(b[text_col])
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        counts = (offsets[1:] - offsets[:-1]).astype(np.int64)
        flat = toks.flatten().to_pylist()
        flat_len = np.fromiter((len(t) for t in flat), dtype=np.int64,
                               count=len(flat))
        flat_stop = np.fromiter((t in _STOP_EN for t in flat), dtype=np.int64,
                                count=len(flat))
        sums_len = np.zeros(len(counts))
        sums_stop = np.zeros(len(counts))
        nz = counts > 0
        if len(flat):
            sums_len = np.add.reduceat(
                np.concatenate([flat_len, [0]]), offsets[:-1])[:len(counts)]
            sums_stop = np.add.reduceat(
                np.concatenate([flat_stop, [0]]), offsets[:-1])[:len(counts)]
            empty = offsets[:-1] == offsets[1:]
            sums_len[empty] = 0
            sums_stop[empty] = 0
        mean_tok = np.where(nz, sums_len / np.maximum(counts, 1), 0.0)
        stop_ratio = np.where(nz, sums_stop / np.maximum(counts, 1), 0.0)
        texts = b[text_col].to_pylist()
        n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64,
                              count=len(texts))
        n_alpha = np.fromiter(
            (sum(c.isalpha() for c in t) for t in texts), dtype=np.int64,
            count=len(texts))
        alpha_ratio = np.where(n_chars > 0, n_alpha / np.maximum(n_chars, 1), 0.0)
        return pa.table({
            id_col: b[id_col],
            "n_tokens": pa.array(counts),
            "mean_token_len": pa.array(duck_round(mean_tok, round_to)),
            "stopword_ratio": pa.array(duck_round(stop_ratio, round_to)),
            "alpha_ratio": pa.array(duck_round(alpha_ratio, round_to)),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def bpe_token_counts(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Whitespace + BPE-ish regex token counts (subword-count proxy)."""

    def f(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        ws = np.fromiter((len(t.split()) for t in texts), dtype=np.int64,
                         count=len(texts))
        bpe = np.fromiter((len(_BPE_RE.findall(t)) for t in texts),
                          dtype=np.int64, count=len(texts))
        return pa.table({id_col: b[id_col],
                         "ws_tokens": pa.array(ws),
                         "bpe_tokens": pa.array(bpe)})

    return ds.map_batches(f, batch_format="pyarrow")


def fingerprint(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Deterministic FNV-1a rolling fingerprint over the token stream
    (document-level content fingerprint, order-sensitive)."""

    def fp(text: str) -> int:
        h = _FP_SEED
        for t in tokenize(text):
            for c in t.encode():
                h = np.uint64((int(h) ^ c) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
            h = np.uint64((int(h) ^ 0x20) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
        return int(h)

    def f(b: pa.Table) -> pa.Table:
        fps = [fp(t) for t in b[text_col].to_pylist()]
        return pa.table({id_col: b[id_col],
                         "fingerprint": pa.array(np.array(fps, dtype=np.uint64))})

    return ds.map_batches(f, batch_format="pyarrow")
