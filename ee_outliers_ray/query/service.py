"""Query service: a pool of Ray actors each holding an IndexReader
(segments + doclens + stats loaded once per actor), answering BM25 top-k
with block-max WAND.  This is the serving-path analogue of the
reference's delegation of query evaluation to the ES cluster
(/root/reference/app/helpers/es.py:110-141) — scatter queries over the
pool, each actor evaluates independently against shared index storage."""

from __future__ import annotations

import ray


@ray.remote
class QueryActor:
    """mode="taat": vectorized scorer with request/weight caches;
    mode="bmp": vectorized block-max range pruning (the 10^12-doc skip
    path — never decodes postings outside visited ranges, dense terms
    take the cached full-decode path); mode="wand": per-doc block-max
    WAND, the accumulator-free reference.  All three are rank- AND
    score-identical (pytest-verified)."""

    def __init__(self, index_dir: str, mode: str = "taat",
                 result_cache: bool = True):
        from .engine import BlockMaxPruning, BlockMaxWand, TaatSearcher
        from .reader import IndexReader

        self.reader = IndexReader(index_dir)
        self.engine = {"taat": TaatSearcher,
                       "bmp": BlockMaxPruning,
                       "wand": BlockMaxWand}[mode](self.reader)
        if mode == "taat" and not result_cache:
            self.engine.result_cache_size = 0

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        return self.engine.topk(query, k)

    def topk_batch(self, queries: list[str], k: int = 10) -> list:
        return [self.engine.topk(q, k) for q in queries]

    def min_match_batch(self, requests: list, k: int = 10) -> list:
        """Serve minimum_should_match OR queries: ``requests`` is a list
        of (terms, min_match).  TAAT mode goes through the searcher's
        per-term weight cache; bmp/wand actors fall back to the
        standalone reader path (identical results by the shared union
        kernel)."""
        from .engine import min_match_topk as _mm

        out = []
        for terms, m in requests:
            if hasattr(self.engine, "min_match_topk"):
                out.append(self.engine.min_match_topk(terms, m, k))
            else:
                d, nm, s = _mm(self.reader, terms, m, k)
                out.append(list(zip(d.tolist(), nm.tolist(), s.tolist())))
        return out


def query_pool(index_dir: str, n_actors: int, mode: str = "taat",
               result_cache: bool = True) -> list:
    return [QueryActor.remote(index_dir, mode, result_cache)
            for _ in range(n_actors)]


def run_queries(pool: list, queries: list[str], k: int = 10,
                chunk: int = 8) -> list:
    """Scatter query chunks round-robin over the pool; gather in order.

    Round-robin keeps hot queries load-balanced; each actor's request
    cache still absorbs the repeats that land on it.  (Query-hash
    affinity routing was measured WORSE: it concentrates every copy of
    a hot query on one actor, which serializes the pool whenever the
    cache is cold or disabled.)"""
    refs = []
    for i in range(0, len(queries), chunk):
        actor = pool[(i // chunk) % len(pool)]
        refs.append(actor.topk_batch.remote(queries[i:i + chunk], k))
    out = []
    for r in ray.get(refs):
        out.extend(r)
    return out
