"""BM25 top-k query engines over the segment index.

Two paths, both following the determinism contract in ``bm25.py`` (float64
accumulation in ascending term order; ties score-desc/doc_id-asc), so they
return **identical** (doc_id, score) lists:

- ``taat_topk``: exact term-at-a-time vectorized scoring (numpy dense
  accumulator) — the obviously-correct baseline and the fast path at
  sandbox scale.
- ``BlockMaxWand``: document-at-a-time block-max WAND — skips blocks whose
  score upper bounds cannot enter the top-k heap; the 10^12-doc scale path
  (accumulator-free, postings decoded block-wise on demand).
- ``BlockMaxPruning``: vectorized range-at-a-time pruning (BMP) — the
  skip path without a per-document Python loop; projects block maxima
  onto fixed doc ranges and scores only ranges whose bound can still
  enter the heap.

Replaces the reference's delegation of ``query_string`` scoring to
Elasticsearch/Lucene (/root/reference/app/helpers/es.py:238-250).
"""

from __future__ import annotations

import heapq

import numpy as np

from ..tokenizer import tokenize
from .bm25 import block_upper_bound, idf, term_weight, topk_from_scores
from .codec_cursor import TermCursor
from .reader import IndexReader


def _query_terms(query: str) -> list[str]:
    """Unique query terms in ascending order (the fixed summation order)."""
    return sorted(set(tokenize(query)))


class TaatSearcher:
    """Vectorized term-at-a-time BM25 scorer with reusable accumulators.

    The in-sandbox serving path: decoding + scoring are numpy kernels, the
    accumulator array is allocated once per searcher and only the touched
    entries are reset between queries.  Scale note: a dense accumulator is
    bounded by the doc-partition size — at 10^12 docs the corpus is doc-
    sharded and each shard's searcher accumulates over its own range, with
    a top-k heap merge across shards; BlockMaxWand is the accumulator-free
    skip path.
    """

    def __init__(self, reader: IndexReader, *, n_docs: int | None = None,
                 avgdl: float | None = None,
                 df_lookup: dict[str, int] | None = None):
        """``n_docs``/``avgdl``/``df_lookup`` override the reader's own
        corpus stats — used by the sharded service, where postings are
        shard-local but scoring MUST use the GLOBAL N / avgdl / df so
        per-shard scores are directly mergeable and identical to a
        single-index run."""
        self.reader = reader
        self.n_docs = n_docs if n_docs is not None else reader.n_docs
        self.avgdl = avgdl if avgdl is not None else reader.avgdl
        self.df_lookup = df_lookup or {}
        self._acc = np.zeros(len(reader.doclens), dtype=np.float64)
        self._touched = np.zeros(len(reader.doclens), dtype=bool)
        # per-term BM25 weight vectors are query-independent (idf, dl,
        # avgdl are fixed per index) -> cache them; repeat queries reduce
        # to one scatter-add per term
        self._weights: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._weights_n = 0
        # bounded result cache for identical (terms, k) requests — the
        # analogue of Elasticsearch's shard request cache (the reference
        # relies on it implicitly when re-running use cases); safe here
        # because the index is immutable per reader
        self.result_cache_size = 65536
        self._results: dict[tuple, list] = {}

    def set_global_stats(self, n_docs: int, avgdl: float,
                         df_lookup: dict[str, int]) -> None:
        self.n_docs = n_docs
        self.avgdl = avgdl
        self.df_lookup = dict(df_lookup)
        self._weights.clear()
        self._weights_n = 0
        self._results.clear()

    def add_dfs(self, dfs: dict[str, int]) -> None:
        for t, v in dfs.items():
            if self.df_lookup.get(t) != v:
                self.df_lookup[t] = v
                self._weights.pop(t, None)
                self._results.clear()

    def local_df(self, term: str) -> int:
        return self.reader.df(term)

    def _term_vec(self, t: str):
        hit = self._weights.get(t)
        if hit is not None:
            return hit
        dec = self.reader.postings_decoded(t)
        if dec is None:
            return None
        doc_ids, tfs = dec
        df = self.df_lookup.get(t, len(doc_ids))
        w = term_weight(tfs, self.reader.doclens[doc_ids],
                        idf(self.n_docs, df), self.avgdl)
        if self._weights_n + len(doc_ids) > 30_000_000:
            self._weights.clear()
            self._weights_n = 0
        self._weights[t] = (doc_ids, w)
        self._weights_n += len(doc_ids)
        return doc_ids, w

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        terms = _query_terms(query)
        if self.result_cache_size <= 0:
            return self._topk_uncached(terms, k)
        ckey = (tuple(terms), k)
        hit = self._results.get(ckey)
        if hit is not None:
            return list(hit)
        out = self._topk_uncached(terms, k)
        if len(self._results) >= self.result_cache_size:
            self._results.clear()
        self._results[ckey] = out
        return list(out)

    def min_match_topk(self, terms, min_match: int, k: int = 10
                       ) -> list[tuple[int, int, float]]:
        """minimum_should_match BM25 through the searcher's per-term
        weight cache (the serving path: repeat clauses never re-decode
        postings).  Identical results to ``engine.min_match_topk`` by
        the shared union kernel, pinned by pytest; in sharded use the
        injected global stats flow through ``_term_vec`` exactly as for
        plain TAAT.  Returns (doc_id, n_matched, score) tuples."""
        min_match = max(int(min_match), 1)
        tkey = tuple(sorted(set(terms)))
        ckey = ("mm", tkey, min_match, k)
        if self.result_cache_size > 0:
            hit = self._results.get(ckey)
            if hit is not None:
                return list(hit)
        vecs = []
        for t in tkey:                    # ascending-term sum order
            vec = self._term_vec(t)
            if vec is not None and len(vec[0]):
                vecs.append(vec)
        if not hasattr(self, "_mm_cnt"):
            # lazy: only min_match serving pays for the count array;
            # _acc is shared with plain topk (both reset after use)
            self._mm_cnt = np.zeros(len(self._acc), dtype=np.int16)
        d, nm, s = _min_match_from_vecs(
            vecs, min_match, k, n_docs=len(self._acc),
            workspace=(self._acc, self._mm_cnt))
        out = list(zip(d.tolist(), nm.tolist(), s.tolist()))
        if self.result_cache_size > 0:
            if len(self._results) >= self.result_cache_size:
                self._results.clear()
            self._results[ckey] = out
        return list(out)

    def _topk_uncached(self, terms: list[str], k: int
                       ) -> list[tuple[int, float]]:
        acc = self._acc
        vecs = []
        total_postings = 0
        for t in terms:
            vec = self._term_vec(t)
            if vec is not None:
                vecs.append(vec)
                total_postings += len(vec[0])
        if not vecs:
            return []
        # sparse path for rare-term queries: candidates come from the
        # union of the terms' (sorted) posting ids — avoids the
        # O(n_docs) touched-array scan, which otherwise floors every
        # query at corpus-size cost regardless of posting length
        if total_postings * 16 < len(acc):
            for doc_ids, w in vecs:  # ascending-term order preserved
                acc[doc_ids] += w
            cand = np.unique(np.concatenate([v[0] for v in vecs])) \
                if len(vecs) > 1 else vecs[0][0]
            d, s = topk_from_scores(cand, acc[cand], k)
            acc[cand] = 0.0
            return list(zip(d.tolist(), s.tolist()))
        touched = self._touched
        for doc_ids, w in vecs:
            acc[doc_ids] += w
            touched[doc_ids] = True
        cand = np.flatnonzero(touched)
        d, s = topk_from_scores(cand, acc[cand], k)
        acc[cand] = 0.0  # reset only touched entries
        touched[cand] = False
        return list(zip(d.tolist(), s.tolist()))


def taat_topk(reader: IndexReader, query: str, k: int = 10
              ) -> list[tuple[int, float]]:
    return TaatSearcher(reader).topk(query, k)


class BlockMaxPruning:
    """Vectorized range-at-a-time block-max pruning (BMP) top-k.

    The scale-path counterpart to ``BlockMaxWand`` with NO per-document
    Python loop: per-term, per-block BM25 upper bounds are projected onto
    fixed-width doc-id ranges with two ``searchsorted`` passes and one
    ``maximum.reduceat`` (no posting decode); ranges are visited in
    descending aggregate-bound order and each visited range is scored with
    the same float64 ascending-term-order numpy kernel as ``TaatSearcher``,
    so (doc_id, score) results are bit-identical to TAAT and WAND
    (pytest-gated).  Visiting stops at the first range whose bound is
    STRICTLY below the current kth score: ``<=`` would be unsafe under the
    (score desc, doc_id asc) tie rule, because an unvisited doc tying the
    kth score with a smaller doc_id would still deserve the slot.

    Dense terms (>= one posting per DENSE_DIVISOR docs) skip the
    per-block loop entirely: one cached full decode + precomputed
    weight vector + a single vectorized searchsorted yields each
    range's posting slice, so a stopword term costs three numpy ops per
    visited range instead of ~8 small numpy calls per block (measured
    19.6 s -> 0.68 s first-query on the 16M-doc "the data" pair,
    bit-identical).  Selective terms keep the block path, which never
    decodes postings outside visited ranges.

    After the range-pruning idea of Mallia, Suel & Tonellotto, "Faster
    Learned Sparse Retrieval with Block-Max Pruning" (SIGIR 2024, public),
    adapted to this codec's unaligned 128-posting blocks: a block
    straddling a range boundary contributes through the explicit
    ``ub[hi-1]`` term, so the projected bound stays valid without
    re-blocking the index.  At 10^12-doc scale the corpus is doc-sharded;
    each shard prunes over its own ranges and only (range bound, shard)
    pairs above the global theta are scored — the bound projection is
    O(n_ranges + n_blocks) per term, independent of posting count.
    """

    # decoded-block cache cap in POSTINGS, mirroring IndexReader's
    # postings_decoded limit: a long-lived searcher in a query actor
    # must not grow without bound across queries
    DECODED_CACHE_LIMIT = 50_000_000

    # a term with at least one posting per DENSE_DIVISOR docs takes the
    # dense path: one cached full decode + precomputed weights + a single
    # vectorized searchsorted for all range cuts, instead of the
    # per-block Python loop (which on a stopword term visits ~every
    # block and pays ~8 small numpy calls per block)
    DENSE_DIVISOR = 16

    def __init__(self, reader: IndexReader, range_width: int = 4096):
        self.reader = reader
        self.range_width = int(range_width)
        self._blocks: dict[tuple[str, int], tuple[np.ndarray, np.ndarray]] = {}
        self._blocks_postings = 0
        # dense-term cache: term -> (doc_ids, weights, range cuts)
        self._dense: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    def _block(self, term: str, run, bi: int):
        from ..index.codec import decode_block

        key = (term, bi)
        hit = self._blocks.get(key)
        if hit is None:
            hit = decode_block(run.payload, int(run.block_offset[bi]),
                               int(run.block_len[bi]),
                               int(run.block_first_doc[bi]))
            if self._blocks_postings + len(hit[0]) > self.DECODED_CACHE_LIMIT:
                # _blocks_postings counts BOTH caches — clear both, or
                # dense entries stay alive but uncounted and the cap is
                # silently exceeded
                self._blocks.clear()
                self._dense.clear()
                self._blocks_postings = 0
            self._blocks[key] = hit
            self._blocks_postings += len(hit[0])
        return hit

    def _dense_term(self, term: str, idf_val: float, n_ranges: int):
        """Dense-path arrays for one term: full decoded doc_ids, their
        precomputed BM25 weights, and the posting-index cut at every
        range boundary.  Scores are bit-identical to the block path:
        term_weight is elementwise and each doc carries exactly one
        posting per term, so per-doc accumulation order is unchanged."""
        hit = self._dense.get(term)
        if hit is not None:
            return hit
        docs, tfs = self.reader.postings_decoded(term)
        w = term_weight(tfs, self.reader.doclens[docs], idf_val,
                        self.reader.avgdl)
        cuts = np.searchsorted(
            docs, np.arange(n_ranges + 1, dtype=np.int64) * self.range_width)
        if self._blocks_postings + len(docs) > self.DECODED_CACHE_LIMIT:
            self._dense.clear()
            self._blocks.clear()
            self._blocks_postings = 0
        self._dense[term] = (docs, w, cuts)
        self._blocks_postings += len(docs)
        return docs, w, cuts

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        r = self.reader
        W = self.range_width
        n_docs_total = len(r.doclens)
        n_ranges = max(1, -(-n_docs_total // W))
        entries = []
        for t in _query_terms(query):
            run = r.postings(t)
            if run is None:
                continue
            entries.append((t, run, idf(r.n_docs, run.n_postings)))
        if not entries:
            return []

        starts = np.arange(n_ranges, dtype=np.int64) * W
        bound = np.zeros(n_ranges, dtype=np.float64)
        spans = []  # per-term (lo, hi) block-index windows per range
        for t, run, idf_val in entries:
            ub = block_upper_bound(idf_val, run.block_max_tf,
                                   run.block_min_dl, r.avgdl)
            nb = len(ub)
            # blocks intersecting range r: [lo_r, hi_r)
            lo = np.searchsorted(run.block_last_doc, starts, side="left")
            hi = np.searchsorted(run.block_first_doc, starts + W,
                                 side="left")
            has = hi > lo
            # segment max over [lo_r, lo_{r+1}) via reduceat on a padded
            # array (pad makes index nb valid; empty segments are masked)
            ub_pad = np.append(ub, -np.inf)
            segmax = np.maximum.reduceat(ub_pad, np.minimum(lo, nb))
            seg_nonempty = np.diff(np.append(lo, nb)) > 0
            contrib = np.zeros(n_ranges, dtype=np.float64)
            contrib[has] = ub[np.maximum(hi - 1, 0)[has]]
            m = seg_nonempty & has
            contrib[m] = np.maximum(contrib[m], segmax[m])
            bound += contrib
            spans.append((lo, hi))

        dense_terms = [
            self._dense_term(t, idf_val, n_ranges)
            if run.n_postings * self.DENSE_DIVISOR >= n_docs_total else None
            for t, run, idf_val in entries]

        order = np.argsort(-bound, kind="stable")
        heap: list[tuple[float, int]] = []
        theta = -np.inf
        acc = np.zeros(W, dtype=np.float64)
        touched = np.zeros(W, dtype=bool)
        avgdl = r.avgdl
        doclens = r.doclens
        for o in order.tolist():
            b = bound[o]
            if b <= 0.0:
                break
            if len(heap) >= k and b < theta:
                break
            base = o * W
            end = base + W
            for (t, run, idf_val), (lo, hi), dense in zip(entries, spans,
                                                          dense_terms):
                if dense is not None:
                    ddocs, dw, cuts = dense
                    s, e = int(cuts[o]), int(cuts[o + 1])
                    if s == e:
                        continue
                    loc = ddocs[s:e] - base
                    acc[loc] += dw[s:e]
                    touched[loc] = True
                    continue
                for bi in range(int(lo[o]), int(hi[o])):
                    docs, tfs = self._block(t, run, bi)
                    s = int(np.searchsorted(docs, base, side="left"))
                    e = int(np.searchsorted(docs, end, side="left"))
                    if s == e:
                        continue
                    d = docs[s:e]
                    w = term_weight(tfs[s:e], doclens[d], idf_val, avgdl)
                    loc = d - base
                    acc[loc] += w
                    touched[loc] = True
            local = np.flatnonzero(touched)
            if local.size:
                scores_r = acc[local]
                if len(heap) >= k:
                    keep = np.flatnonzero(scores_r >= theta)
                    cand_s, cand_d = scores_r[keep], local[keep] + base
                else:
                    cand_s, cand_d = scores_r, local + base
                for sc, dc in zip(cand_s.tolist(), cand_d.tolist()):
                    item = (sc, -dc)
                    if len(heap) < k:
                        heapq.heappush(heap, item)
                        if len(heap) == k:
                            theta = heap[0][0]
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
                        theta = heap[0][0]
                acc[local] = 0.0
                touched[local] = False
        out = sorted(heap, key=lambda x: (-x[0], -x[1]))
        return [(-d, s) for s, d in out]


def bmp_topk(reader: IndexReader, query: str, k: int = 10,
             range_width: int = 4096) -> list[tuple[int, float]]:
    return BlockMaxPruning(reader, range_width).topk(query, k)


class BlockMaxWand:
    """Block-max WAND evaluator bound to one IndexReader."""

    def __init__(self, reader: IndexReader):
        self.reader = reader

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        r = self.reader
        terms = _query_terms(query)
        cursors: list[TermCursor] = []
        for t in terms:
            run = r.postings(t)
            if run is None:
                continue
            idf_val = idf(r.n_docs, run.n_postings)
            ub = float(block_upper_bound(idf_val, run.block_max_tf,
                                         run.block_min_dl, r.avgdl).max())
            cursors.append(TermCursor(run, idf_val, ub))
        if not cursors:
            return []
        # heap of (score, -doc_id): min element = weakest (lowest score,
        # then largest doc_id) — matches the (score desc, doc_id asc) order
        heap: list[tuple[float, int]] = []
        theta = -np.inf

        while True:
            live = [c for c in cursors if not c.exhausted]
            if not live:
                break
            live.sort(key=lambda c: c.doc())
            # pivot: smallest prefix whose summed upper bounds can beat theta
            ub_sum = 0.0
            pivot_idx = -1
            for i, c in enumerate(live):
                ub_sum += c.ub
                if len(heap) < k or ub_sum > theta:
                    pivot_idx = i
                    break
            if pivot_idx < 0:
                break  # no prefix can beat theta -> done
            pivot_doc = live[pivot_idx].doc()
            # extend the pivot over cursors tied at pivot_doc so their
            # bounds count and the skip target stays safe (BMW candidate
            # selection, Ding & Suel)
            while pivot_idx + 1 < len(live) and live[pivot_idx + 1].doc() == pivot_doc:
                pivot_idx += 1
            if live[0].doc() == pivot_doc:
                # block-max check: refine with per-block bounds at pivot_doc
                bub = 0.0
                for c in live[: pivot_idx + 1]:
                    bub += c.block_ub(pivot_doc, r.avgdl)
                if len(heap) >= k and bub <= theta:
                    # safe skip target: smallest current-block end among the
                    # pivot prefix, clamped below the next cursor's doc —
                    # documents in (pivot_doc, target) can only contain
                    # prefix terms, whose block bounds cannot beat theta
                    boundary = min(c.block_end(pivot_doc) for c in live[: pivot_idx + 1])
                    target = boundary + 1
                    if pivot_idx + 1 < len(live):
                        target = min(target, live[pivot_idx + 1].doc())
                    for c in live[: pivot_idx + 1]:
                        c.next_geq(target)
                    continue
                # full evaluation, ascending-term order (= cursors order)
                score = 0.0
                for c in cursors:
                    if not c.exhausted and c.doc() == pivot_doc:
                        score += c.score(r.doclens[pivot_doc], r.avgdl)
                for c in live:
                    if c.doc() == pivot_doc:
                        c.next_geq(pivot_doc + 1)
                if len(heap) < k:
                    heapq.heappush(heap, (score, -pivot_doc))
                    if len(heap) == k:
                        theta = heap[0][0]
                elif (score, -pivot_doc) > heap[0]:
                    heapq.heapreplace(heap, (score, -pivot_doc))
                    theta = heap[0][0]
            else:
                # advance all pre-pivot cursors to the pivot document
                for c in live[:pivot_idx]:
                    c.next_geq(pivot_doc)
        out = sorted(heap, key=lambda x: (-x[0], -x[1]))
        return [(-d, s) for s, d in out]


def _run_members(run, cand: np.ndarray) -> np.ndarray:
    """Boolean membership of ascending candidate doc_ids in a posting
    run, decoding ONLY the blocks a candidate could land in (block-skip
    via the run's block_last_doc directory, vectorized searchsorted
    within each decoded block).  Memory is O(one block); runtime is
    O(|cand| log + blocks-touched * block_size)."""
    from ..index.codec import decode_block

    keep = np.zeros(len(cand), dtype=bool)
    last = run.block_last_doc
    bis = np.searchsorted(last, cand, side="left")
    ok = bis < len(last)
    for bi in np.unique(bis[ok]):
        sel = np.flatnonzero(bis == bi)
        docs, _ = decode_block(run.payload, int(run.block_offset[bi]),
                               int(run.block_len[bi]),
                               int(run.block_first_doc[bi]))
        pos = np.searchsorted(docs, cand[sel])
        in_rng = pos < len(docs)
        hit = np.zeros(len(sel), dtype=bool)
        hit[in_rng] = docs[pos[in_rng]] == cand[sel][in_rng]
        keep[sel] = hit
    return keep


def intersect_terms(reader: IndexReader, terms) -> np.ndarray:
    """Boolean-AND posting intersection WITHOUT materializing any full
    posting list: stream the rarest term's run block by block (128
    postings at a time) and filter each candidate block through the
    other runs' block directories (``_run_members``).  Replaces the old
    decode-everything + np.intersect1d driver path — a hot term's
    multi-GB run now costs one block-directory binary search per
    candidate block instead of a full decode.

    Reads through ``reader.postings`` so tombstone filtering applies
    (same filtered runs TAAT/WAND see).  Returns ascending doc_ids."""
    from ..index.codec import decode_block

    runs = []
    for t in sorted(set(terms)):
        run = reader.postings(t)
        if run is None:
            return np.array([], dtype=np.int64)
        runs.append(run)
    if not runs:
        return np.array([], dtype=np.int64)
    runs.sort(key=lambda r: r.n_postings)
    lead, rest = runs[0], runs[1:]
    out: list[np.ndarray] = []
    for bi in range(len(lead.block_len)):
        cand, _ = decode_block(lead.payload, int(lead.block_offset[bi]),
                               int(lead.block_len[bi]),
                               int(lead.block_first_doc[bi]))
        for r in rest:
            if not len(cand):
                break
            cand = cand[_run_members(r, cand)]
        if len(cand):
            out.append(cand)
    if not out:
        return np.array([], dtype=np.int64)
    return np.concatenate(out)


def min_match_topk(reader: IndexReader, terms, min_match: int, k: int = 10
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """BM25 top-k with a ``minimum_should_match`` floor — the Lucene/ES
    OR-query knob the reference reaches through its es_query /
    query_string use-case configs (/root/reference/app/helpers/es.py:
    238-250): candidates are docs matching at least ``min_match``
    DISTINCT query terms; each candidate scores the BM25 sum over its
    matched terms with the same per-term weights and the same
    ascending-term float64 accumulation order as TAAT/WAND; ties
    (score desc, doc_id asc).  ``min_match=1`` is a pure OR query;
    ``min_match=len(terms)`` selects exactly the AND set
    (``intersect_terms``), BM25-ranked.

    Candidate generation is the union of the query terms' postings
    (query-sized × df — never a corpus scan); the match counter is an
    int accumulator beside the score accumulator, both sparse over the
    union.  Reads through ``reader.postings_decoded`` so tombstone
    filtering applies.  Scale: per doc-shard exactly like TaatSearcher
    (shard-local unions with injected global stats, heap merge across
    shards); a WAND-style skip variant (mm-WAND) exists but the exact
    sparse union is the obviously-correct form and is what the SQL
    oracle checks.

    Returns (doc_ids, n_matched, scores), scores unrounded.
    """
    min_match = max(int(min_match), 1)
    vecs = []
    for t in sorted(set(terms)):          # ascending-term sum order
        dec = reader.postings_decoded(t)
        if dec is None or not len(dec[0]):
            continue
        doc_ids, tfs = dec
        w = term_weight(tfs, reader.doclens[doc_ids],
                        idf(reader.n_docs, len(doc_ids)), reader.avgdl)
        vecs.append((doc_ids, w))
    return _min_match_from_vecs(vecs, min_match, k,
                                n_docs=len(reader.doclens))


def _min_match_from_vecs(vecs, min_match: int, k: int, *,
                         n_docs: int | None = None, workspace=None
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shared union kernel for both min_match paths (standalone reader
    and TaatSearcher cached-weight serving): ``vecs`` is the ascending-
    term list of (sorted doc_ids, BM25 weights).

    Dense/sparse split mirrors ``TaatSearcher._topk_uncached``: rare-
    term queries take the sorted-union path; hot-term queries (postings
    a meaningful fraction of the corpus) scatter into dense score +
    int16 match-count accumulators — the np.unique over a multi-
    million-id union was the measured hot loop (5.1 -> ~9 QPS on the 2M
    4-hot-term bench).  Per-doc float64 accumulation stays term-
    ascending in BOTH paths, so results are bit-identical (pytest pins
    the paths against each other).  ``workspace`` is an optional
    (acc, cnt) pair of corpus-length arrays to reuse (zeroed on entry
    and re-zeroed before return); when absent and the dense gate fires,
    temporaries are allocated."""
    empty = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64),
             np.zeros(0, dtype=np.float64))
    if len(vecs) < min_match:             # absent terms cannot match
        return empty
    total = sum(len(v[0]) for v in vecs)
    dense = n_docs is not None and total * 16 >= n_docs
    if dense:
        if workspace is not None:
            acc, cnt = workspace
        else:
            acc = np.zeros(n_docs, dtype=np.float64)
            cnt = np.zeros(n_docs, dtype=np.int16)
        for ids, w in vecs:               # ascending-term order
            acc[ids] += w
            cnt[ids] += 1
        cand = np.flatnonzero(cnt)
        keep = cand[cnt[cand] >= min_match]
        if not len(keep):
            acc[cand] = 0.0
            cnt[cand] = 0
            return empty
        d, s = topk_from_scores(keep, acc[keep], k)
        nm = cnt[d].astype(np.int64)
        acc[cand] = 0.0
        cnt[cand] = 0
        return d.astype(np.int64), nm, s
    uniq, inv = np.unique(np.concatenate([v[0] for v in vecs]),
                          return_inverse=True)
    counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    scores = np.zeros(len(uniq), dtype=np.float64)
    off = 0
    for ids, w in vecs:
        # one doc appears at most once per term -> no duplicate index
        # within a slice; slice-by-slice += preserves ascending-term
        # per-doc accumulation order exactly
        scores[inv[off:off + len(ids)]] += w
        off += len(ids)
    keep = counts >= min_match
    if not keep.any():
        return empty
    d, s = topk_from_scores(uniq[keep], scores[keep], k)
    kept_ids = uniq[keep]
    nm = counts[keep][np.searchsorted(kept_ids, d)]
    return d.astype(np.int64), nm, s
