"""Vectorized Levenshtein matching for Lucene fuzzy terms (``spark~1``).

ES query_string forwards ``term~N`` to Lucene's FuzzyQuery (the reference
passes user strings verbatim, /root/reference/app/helpers/es.py:238-250),
which expands the term against the index dictionary within edit distance
N.  The kernel here is a Wagner-Fischer DP vectorized ACROSS candidates:
one (n_candidates,) vector op per DP cell, with the row-internal
insertion dependency resolved by a running min of ``dp[k] - k`` (the
classic linear-chain trick: an insertion path from k to j costs j - k, so
``min_k (dp[k] - k) + j`` propagates transitively via one
``np.minimum.accumulate``).  m * L vector passes total — no per-candidate
Python in the distance computation.

Semantics match DuckDB ``levenshtein()`` (unit-cost edits, no
transpositions), which is exactly what the driver oracle checks.
"""

from __future__ import annotations

import numpy as np


def _pad_matrix(cands: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """ASCII candidates -> (n, L) uint8 matrix (NUL-padded) + lengths."""
    lens = np.fromiter((len(s) for s in cands), dtype=np.int64,
                       count=len(cands))
    L = int(lens.max()) if len(cands) else 0
    data = "".join(s.ljust(L, "\x00") for s in cands).encode()
    return np.frombuffer(data, dtype=np.uint8).reshape(len(cands), L), lens


def levenshtein_within(query: str, cands: list[str],
                       max_dist: int) -> np.ndarray:
    """Boolean mask: which candidates are within ``max_dist`` edits of
    ``query``.  Candidates longer/shorter than the query by more than
    ``max_dist`` are rejected up front (a length-band prune — the edit
    distance is at least the length difference).

    ASCII-ONLY contract: the DP operates on single bytes, so character
    count must equal byte count.  Index terms satisfy this by the
    tokenizer's ``[a-z0-9]+`` guarantee, but the QUERY string comes
    from users — a non-ASCII query returns an all-False mask (it cannot
    equal any ``[a-z0-9]+`` term within byte-level edits anyway), and
    non-ASCII candidates are masked out rather than corrupting the
    padded matrix reshape."""
    n = len(cands)
    out = np.zeros(n, dtype=bool)
    if n == 0 or not query.isascii():
        return out
    m = len(query)
    lens_all = np.fromiter((len(s) for s in cands), dtype=np.int64, count=n)
    band = np.abs(lens_all - m) <= max_dist
    band &= np.fromiter((s.isascii() for s in cands), dtype=bool, count=n)
    idx = np.flatnonzero(band)
    if not len(idx):
        return out
    mat, lens = _pad_matrix([cands[i] for i in idx])
    nb, L = mat.shape
    q = np.frombuffer(query.encode(), dtype=np.uint8)
    cols = np.arange(L + 1, dtype=np.int32)
    dp = np.broadcast_to(cols, (nb, L + 1)).astype(np.int32)
    for i in range(1, m + 1):
        cost = (mat != q[i - 1]).astype(np.int32)
        new = np.empty_like(dp)
        new[:, 0] = i
        # substitution (diag) and deletion-from-candidate (vertical)
        np.minimum(dp[:, :-1] + cost, dp[:, 1:] + 1, out=new[:, 1:])
        # insertion (horizontal) chain: min_k<j (new[k] - k) + j
        a = new - cols
        np.minimum.accumulate(a, axis=1, out=a)
        np.minimum(new, a + cols, out=new)
        dp = new
    out[idx] = dp[np.arange(nb), lens] <= max_dist
    return out
