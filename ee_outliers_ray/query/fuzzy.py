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

Semantics match DuckDB ``levenshtein()`` exactly (unit-cost edits, no
transpositions) — which is BYTE-level over the UTF-8 encoding, not
character-level (validated: duckdb ``levenshtein('café','cafe') = 2``,
``levenshtein('héllo','hello') = 2``).  The DP therefore runs on the
UTF-8 bytes of both query and candidates, so non-ASCII queries get the
same answers the driver oracle computes instead of an all-False mask
(index terms are ``[a-z0-9]+`` so their bytes == chars; the byte path
only changes what a non-ASCII USER query matches).
"""

from __future__ import annotations

import numpy as np


def _pad_matrix(cands: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 candidate bytes -> (n, L) uint8 matrix (NUL-padded) +
    byte lengths."""
    lens = np.fromiter((len(s) for s in cands), dtype=np.int64,
                       count=len(cands))
    L = int(lens.max()) if len(cands) else 0
    data = b"".join(s.ljust(L, b"\x00") for s in cands)
    return np.frombuffer(data, dtype=np.uint8).reshape(len(cands), L), lens


def levenshtein_within(query: str, cands: list[str],
                       max_dist: int) -> np.ndarray:
    """Boolean mask: which candidates are within ``max_dist`` edits of
    ``query`` under DuckDB/byte-level Levenshtein.  Candidates whose
    UTF-8 byte length differs from the query's by more than ``max_dist``
    are rejected up front (a length-band prune — the edit distance is at
    least the length difference)."""
    n = len(cands)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    q = np.frombuffer(query.encode(), dtype=np.uint8)
    m = len(q)
    enc = [s.encode() for s in cands]
    lens_all = np.fromiter((len(s) for s in enc), dtype=np.int64, count=n)
    band = np.abs(lens_all - m) <= max_dist
    idx = np.flatnonzero(band)
    if not len(idx):
        return out
    mat, lens = _pad_matrix([enc[i] for i in idx])
    nb, L = mat.shape
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
