"""Posting-run cursor with lazy block decode — the DAAT iterator used by
block-max WAND.  Decodes one block at a time (128 postings), never the
whole run; skip targets use the block_last_doc array (ascending across the
run by construction of the tiered merge)."""

from __future__ import annotations

import math

import numpy as np

from ..index.codec import EncodedRun, decode_block
from .bm25 import block_upper_bound, term_weight


class TermCursor:
    __slots__ = ("run", "idf", "ub", "exhausted", "bi", "pos",
                 "_docs", "_tfs", "_block_ubs")

    def __init__(self, run: EncodedRun, idf_val: float, ub: float):
        self.run = run
        self.idf = idf_val
        self.ub = ub
        self.exhausted = False
        self._block_ubs: dict[int, float] = {}
        self._load_block(0)

    def _load_block(self, bi: int) -> None:
        if bi >= len(self.run.block_len):
            self.exhausted = True
            return
        self.bi = bi
        self._docs, self._tfs = decode_block(
            self.run.payload, int(self.run.block_offset[bi]),
            int(self.run.block_len[bi]), int(self.run.block_first_doc[bi]))
        self.pos = 0

    def doc(self) -> int:
        return int(self._docs[self.pos])

    def tf(self) -> int:
        return int(self._tfs[self.pos])

    def score(self, dl: int, avgdl: float) -> float:
        # same float64 ops as the vectorized TAAT path (bit-identical)
        return float(term_weight(self._tfs[self.pos: self.pos + 1],
                                 np.asarray([dl]), self.idf, avgdl)[0])

    def next_geq(self, target: int) -> None:
        if self.exhausted or target <= self.doc():
            return
        last = self.run.block_last_doc
        if target > int(last[-1]):
            self.exhausted = True
            return
        bi = int(np.searchsorted(last, target, side="left"))
        if bi != self.bi:
            self._load_block(bi)
        self.pos = int(np.searchsorted(self._docs, target, side="left"))

    def _block_for(self, target: int) -> int:
        """Index of the block that could contain target, or -1."""
        last = self.run.block_last_doc
        bi = int(np.searchsorted(last, target, side="left"))
        return bi if bi < len(last) else -1

    def block_ub(self, target: int, avgdl: float) -> float:
        bi = self._block_for(target)
        if bi < 0:
            return 0.0
        ub = self._block_ubs.get(bi)
        if ub is None:
            ub = float(block_upper_bound(
                self.idf,
                self.run.block_max_tf[bi: bi + 1],
                self.run.block_min_dl[bi: bi + 1], avgdl)[0])
            self._block_ubs[bi] = ub
        return ub

    def block_end(self, target: int) -> float:
        bi = self._block_for(target)
        return math.inf if bi < 0 else int(self.run.block_last_doc[bi])
