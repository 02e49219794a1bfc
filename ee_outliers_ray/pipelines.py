"""Named pipelines over the driver's testdata tables — the concrete
``queries()`` implementations of ``__ray_entry__.py``.

Each function takes ``sf_dir`` (a directory of parquet tables) and returns
a Ray Dataset / pandas DataFrame / pyarrow Table.  All are Ray-Data-native
plans; the DuckDB equivalents live in ``__ray_entry__.oracle_sql`` and are
kept column-name-aligned.

Float policy: aggregate / score columns that cross the DuckDB hash-compare
are rounded (ROUND_* constants) on BOTH sides, so sub-ulp associativity
differences between engines cannot flip the value hash.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .functions import duck_round
from .index.build import build_index
from .tokenizer import token_counts_column, tokenize_column

ROUND_SCORE = 6
ROUND_MONEY = 2


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read(sf_dir: str, name: str, columns=None):
    import ray.data

    return ray.data.read_parquet(_t(sf_dir, name), columns=columns)


# --------------------------------------------------------------------------
# text / index pipelines over `documents`
# --------------------------------------------------------------------------

def token_counts(sf_dir: str):
    """Per-doc token count (doc length) — SURVEY A11 / M13."""
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        n = token_counts_column(b["text"])
        return pa.table({"doc_id": b["doc_id"], "n_tokens": pa.array(n)})

    return ds.map_batches(f, batch_format="pyarrow")


def _term_doc_pairs(b: pa.Table) -> pa.Table:
    """(term, doc_id, tf) rows for a batch — vectorized SPIMI emit."""
    toks = tokenize_column(b["text"])
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    doc_ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    if len(flat) == 0:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "doc_id": pa.array([], type=pa.int64()),
                         "tf": pa.array([], type=pa.int64())})
    enc = flat.dictionary_encode()
    term_ids = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_terms = len(enc.dictionary)
    doc_idx = np.repeat(np.arange(len(doc_ids), dtype=np.int64),
                        offsets[1:] - offsets[:-1])
    keys = doc_idx * n_terms + term_ids
    uniq, tf = np.unique(keys, return_counts=True)
    return pa.table({
        "term": enc.dictionary.take(pa.array(uniq % n_terms)),
        "doc_id": pa.array(doc_ids[uniq // n_terms]),
        "tf": pa.array(tf.astype(np.int64)),
    })


def term_df(sf_dir: str):
    """term -> document frequency (partial pre-aggregation per batch, then
    one small groupby — the wordcount pattern)."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ds.map_batches(_term_doc_pairs, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        t = b.group_by("term").aggregate([("doc_id", "count")])
        return t.rename_columns(["term", "pdf"])

    partials = pairs.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("term").aggregate(Sum("pdf", alias_name="df"))


def term_cf(sf_dir: str):
    """term -> collection frequency (total tf)."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ds.map_batches(_term_doc_pairs, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        t = b.group_by("term").aggregate([("tf", "sum")])
        return t.rename_columns(["term", "ptf"])

    partials = pairs.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("term").aggregate(Sum("ptf", alias_name="cf"))


def top_terms(sf_dir: str, k: int = 20):
    """Top-k terms by collection frequency.  EXACT per-block partial
    top-k after the cf groupby (each term appears exactly once there),
    then a (blocks x k)-row driver merge — no all-to-all sort of the
    whole vocabulary (deterministic tie-break on term)."""
    ds = term_cf(sf_dir)

    def block_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        cf = b["cf"].to_numpy(zero_copy_only=False)
        term = b["term"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((term, -cf))[:k]
        return b.take(pa.array(idx))

    cand = ds.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    return cand.sort_values(["cf", "term"], ascending=[False, True],
                            kind="stable").head(k).reset_index(drop=True)


def corpus_stats(sf_dir: str):
    """N, total token count, avg doc length — BM25 sidecar stats (A11)."""
    from ray.data.aggregate import Count, Sum

    tc = token_counts(sf_dir)
    agg = tc.aggregate(Count(alias_name="n_docs"),
                       Sum("n_tokens", alias_name="total_tokens"))
    n, tot = int(agg["n_docs"]), int(agg["total_tokens"])
    return pd.DataFrame([{
        "n_docs": n,
        "total_tokens": tot,
        "avgdl": float(duck_round(tot / n, ROUND_SCORE)),
    }])


_INDEX_CACHE: dict[str, str] = {}


def documents_index(sf_dir: str) -> str:
    """Build (once) and cache the inverted index for a testdata documents
    table; returns the index dir."""
    if sf_dir in _INDEX_CACHE:
        return _INDEX_CACHE[sf_dir]
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    index_dir = f"/tmp/eor_index_cache/{key}"
    build_index(_t(sf_dir, "documents"), index_dir, from_html=False,
                num_buckets=16, doc_range_size=1 << 16, batch_size=4096)
    _INDEX_CACHE[sf_dir] = index_dir
    return index_dir


def bm25_topk(sf_dir: str, query: str = "spark merge batch", k: int = 10):
    """BM25 top-k via the real index + WAND engine; scores rounded for the
    cross-engine hash compare."""
    from .query.engine import BlockMaxWand, taat_topk
    from .query.reader import IndexReader

    reader = IndexReader(documents_index(sf_dir))
    res = BlockMaxWand(reader).topk(query, k=k)
    assert res == taat_topk(reader, query, k=k)  # engine self-check
    return pd.DataFrame({
        "doc_id": [d for d, _ in res],
        "score": duck_round([s for _, s in res], ROUND_SCORE),
    })


def bm25_topk_parts(sf_dir: str, query: str = "spark merge batch",
                    k: int = 10):
    """BM25 top-k over an index built with the bounded-task HIERARCHICAL
    merge (merge_parts=3, small batches/doc-ranges so runs really spread
    across parts): the part-split merge plus the reader's
    interleaved-parts merge fallback are driver-checked against the same
    SQL BM25 truth as bm25_topk."""
    from .query.engine import BlockMaxWand, taat_topk
    from .query.reader import IndexReader

    key = hashlib.sha1((sf_dir + "#parts").encode()).hexdigest()[:12]
    index_dir = f"/tmp/eor_parts_cache/{key}"
    build_index(_t(sf_dir, "documents"), index_dir, from_html=False,
                num_buckets=8, doc_range_size=64, batch_size=128,
                merge_parts=3)
    reader = IndexReader(index_dir)
    res = BlockMaxWand(reader).topk(query, k=k)
    assert res == taat_topk(reader, query, k=k)  # engine self-check
    return pd.DataFrame({
        "doc_id": [d for d, _ in res],
        "score": duck_round([s for _, s in res], ROUND_SCORE),
    })


def bm25_topk_deletes(sf_dir: str, query: str = "spark merge batch",
                      k: int = 10):
    """BM25 top-k AFTER LSM TOMBSTONE DELETES (docs with doc_id % 7 == 3
    removed): the read-time tombstone filter must be rank-identical to
    SQL BM25 over the filtered corpus, and physical compaction must not
    change a single score — both driver-checked against the same oracle
    (WHERE doc_id % 7 <> 3 baked into the SQL)."""
    import pyarrow.parquet as pq

    from .index.mutate import compact_index, delete_from_index
    from .query.engine import BlockMaxWand, taat_topk
    from .query.reader import IndexReader

    key = hashlib.sha1((sf_dir + "#deletes").encode()).hexdigest()[:12]
    index_dir = f"/tmp/eor_deletes_cache/{key}"
    done = os.path.join(index_dir, "compacted.done")
    if not os.path.exists(done):
        build_index(_t(sf_dir, "documents"), index_dir, from_html=False,
                    num_buckets=8, batch_size=4096, overwrite=True)
        ids = pq.read_table(_t(sf_dir, "documents"),
                            columns=["doc_id"])["doc_id"] \
            .to_numpy(zero_copy_only=False)
        delete_from_index(index_dir, ids[ids % 7 == 3])
    reader = IndexReader(index_dir)
    res = BlockMaxWand(reader).topk(query, k=k)
    assert res == taat_topk(reader, query, k=k)  # engine self-check
    if not os.path.exists(done):
        # compaction self-check: physical removal preserves every score
        compact_index(index_dir)
        r2 = IndexReader(index_dir)
        assert r2.deleted is None
        assert BlockMaxWand(r2).topk(query, k=k) == res
        open(done, "w").close()
    return pd.DataFrame({
        "doc_id": [d for d, _ in res],
        "score": duck_round([s for _, s in res], ROUND_SCORE),
    })


def index_append_term_df(sf_dir: str):
    """term -> document frequency read FROM A TWO-STEP INDEX: build over
    the first half of documents, ``append_to_index`` the second half,
    then aggregate per-term df straight from the merged segment files.
    Shares term_df's SQL oracle — the incremental (log-structured
    append) path is therefore driver-checked against a full-corpus
    truth."""
    import glob as globlib

    import pyarrow.parquet as pq

    from .index.build import append_to_index

    key = hashlib.sha1((sf_dir + "#append").encode()).hexdigest()[:12]
    base = f"/tmp/eor_append_cache/{key}"
    idx = os.path.join(base, "idx")
    if not os.path.exists(os.path.join(base, "done")):
        os.makedirs(base, exist_ok=True)
        t = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        half = t.num_rows // 2
        first = os.path.join(base, "first.parquet")
        second = os.path.join(base, "second.parquet")
        pq.write_table(t.slice(0, half), first)
        pq.write_table(t.slice(half), second)
        build_index(first, idx, from_html=False, num_buckets=8,
                    batch_size=4096, overwrite=True)
        append_to_index([second], idx, from_html=False, batch_size=4096)
        open(os.path.join(base, "done"), "w").close()
    seg_files = sorted(globlib.glob(
        os.path.join(idx, "segments", "*", "segment.parquet")))
    import ray.data

    # the vocabulary aggregation stays IN RAY (column-pruned read of the
    # segment files + distributed sort); buckets partition the term
    # space -> terms are globally unique, so no groupby is needed and
    # the driver only holds the streamed (term, df) result
    return ray.data.read_parquet(seg_files, columns=["term", "df"]) \
        .sort("term").to_pandas()


_SHARD_CACHE: dict[str, list] = {}


def bm25_topk_sharded(sf_dir: str, query: str = "spark merge batch",
                      k: int = 10, n_shards: int = 3):
    """BM25 top-k through the DOC-SHARDED query service (the multi-node
    scale path: per-shard postings, GLOBAL N/avgdl/df) — must be
    bit-identical to the single-index engine, so it shares bm25_topk's
    SQL oracle."""
    from .query.sharded import ShardedQueryService, build_sharded_index

    if sf_dir not in _SHARD_CACHE:
        import pyarrow.parquet as pq

        key = hashlib.sha1((sf_dir + "#shards").encode()).hexdigest()[:12]
        base = f"/tmp/eor_shard_cache/{key}"
        split_dir = os.path.join(base, "split")
        if not os.path.exists(os.path.join(base, "done")):
            os.makedirs(split_dir, exist_ok=True)
            t = pq.read_table(_t(sf_dir, "documents"),
                              columns=["doc_id", "text"])
            n = t.num_rows
            for i in range(n_shards):
                lo, hi = i * n // n_shards, (i + 1) * n // n_shards
                pq.write_table(t.slice(lo, hi - lo),
                               os.path.join(split_dir, f"part{i:02d}.parquet"))
            build_sharded_index(split_dir, base, n_shards=n_shards,
                                from_html=False, num_buckets=8,
                                batch_size=4096)
            open(os.path.join(base, "done"), "w").close()
        _SHARD_CACHE[sf_dir] = [os.path.join(base, f"shard={i}")
                                for i in range(n_shards)]
    svc = ShardedQueryService(_SHARD_CACHE[sf_dir])
    res = svc.topk(query, k=k)
    return pd.DataFrame({
        "doc_id": [d for d, _ in res],
        "score": duck_round([s for _, s in res], ROUND_SCORE),
    })


# above this rarest-term df, search_and abandons the driver cursor
# intersection for the fully distributed tokenized scan — at 10^12 docs a
# hot term's run never reaches the driver, and the (equally huge) result
# streams as a Dataset instead of collecting into a DataFrame
_SEARCH_AND_SCAN_MIN_DF = 5_000_000


def search_and(sf_dir: str, terms: tuple[str, ...] = ("spark", "merge")):
    """Boolean AND full-text filter (Q1 as a pure filter): doc_ids
    containing every term.

    Two paths, identical results (pytest-pinned):
    - rarest-term df (segment METADATA only — no payload read) under the
      gate: block-streaming cursor intersection on the driver
      (query/engine.intersect_terms) — decodes the rarest run one block
      at a time and block-skips the others; no full posting list is
      ever materialized, fixing the r3 driver-materialization weak spot.
    - over the gate (all terms hot): distributed tokenized scan
      (query_string semantics without an index), which streams both the
      corpus and the result.
    Contract across the gate: both branches produce (doc_id) in
    ascending doc_id order — the driver path as a pandas DataFrame, the
    scan path as a sorted Ray Dataset (kept streaming: at scale the
    result is itself corpus-sized and must not collect on the driver).
    Empty ``terms`` matches nothing (schema-stable empty frame).

    Mirrors the reference's pure-filter use of query_string
    (/root/reference/app/helpers/es.py:238-250)."""
    from .query.engine import intersect_terms
    from .query.reader import IndexReader

    if not terms:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64)})
    reader = IndexReader(documents_index(sf_dir))
    min_meta_df = min(reader.meta_df(t) for t in sorted(set(terms)))
    if min_meta_df > _SEARCH_AND_SCAN_MIN_DF:
        from .query.parse import filter_by_query_string

        ds = read(sf_dir, "documents", columns=["doc_id", "text"])
        q = " AND ".join(sorted(set(terms)))
        return filter_by_query_string(ds, q).select_columns(["doc_id"]) \
            .sort("doc_id")
    ids = intersect_terms(reader, terms)
    return pd.DataFrame({"doc_id": ids})


def search_or(sf_dir: str,
              terms: tuple[str, ...] = ("batch", "merge", "spark", "window"),
              min_match: int = 3, k: int = 10):
    """BM25-ranked OR query with a ``minimum_should_match`` floor
    (query/engine.min_match_topk): top-k docs matching >= ``min_match``
    distinct terms, scored over the matched terms only — the Lucene/ES
    OR-query knob between pure OR (m=1) and AND (m=len(terms)), which
    the reference's es_query use cases pass straight to Elasticsearch
    (/root/reference/app/helpers/es.py:238-250).  Scores rounded for the
    cross-engine hash compare; schema-stable when empty."""
    from .query.engine import min_match_topk
    from .query.reader import IndexReader

    reader = IndexReader(documents_index(sf_dir))
    d, nm, s = min_match_topk(reader, terms, min_match, k=k)
    return pd.DataFrame({
        "doc_id": d,
        "n_matched": nm,
        "score": duck_round(s, ROUND_SCORE),
    })


# --------------------------------------------------------------------------
# relational pipelines (the reference's delegated ES query work, SURVEY §2.2)
# --------------------------------------------------------------------------

def partial_groupby_agg(ds, keys: list[str], *, sums: dict | None = None,
                        means: dict | None = None, mins: dict | None = None,
                        count_alias: str | None = None) -> pd.DataFrame:
    """LOW-CARDINALITY grouped aggregate without any Ray groupby: the
    map side combines each block to (groups-in-block) partial rows,
    and the reduce is one pandas groupby on the driver over the
    (groups x blocks)-row partial table — avoiding the distributed
    groupby's fixed sort-shuffle cost (~1-2 s per invocation at small
    scale), which dominates these pipelines.

    USE ONLY when the key cardinality is small (group count ~ constant:
    flags, segments, event types).  High-cardinality keys (users,
    terms, docs) must use the direct distributed groupby — their
    partial table is corpus-scale.  Sums/counts/mins compose; means
    decompose into sum+count.  Returns pandas."""
    sums = dict(sums or {})
    means = dict(means or {})
    mins = dict(mins or {})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        parts = {}
        for alias, col in sums.items():
            parts[alias] = g[col].sum()
        for alias, col in means.items():
            parts["_ms_" + alias] = g[col].sum()
        for alias, col in mins.items():
            parts[alias] = g[col].min()
        parts["_cnt"] = g.size()
        return pd.DataFrame(parts).reset_index()

    # whole blocks: one pandas groupby per block, not per 1024-row batch
    part = ds.map_batches(combine, batch_format="pandas",
                          batch_size=None).to_pandas()
    if part.empty:
        # schema-stable empty result (empty datasets drop schema)
        cols = list(keys) + list(sums) + list(means) + list(mins)
        if count_alias:
            cols.append(count_alias)
        return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
    g = part.groupby(keys, sort=True, dropna=False)
    red = {}
    for alias in sums:
        red[alias] = g[alias].sum()
    for alias in means:
        red[alias] = g["_ms_" + alias].sum()
    for alias in mins:
        red[alias] = g[alias].min()
    red["_cnt"] = g["_cnt"].sum()
    red = pd.DataFrame(red).reset_index()
    for alias in means:
        red[alias] = red[alias] / red["_cnt"]
    if count_alias:
        red = red.rename(columns={"_cnt": count_alias})
    else:
        red = red.drop(columns=["_cnt"])
    return red


def pricing_summary(sf_dir: str):
    """Grouped aggregate over lineitem (filter + groupby + sum/avg/count)
    — partial-combined map-side, 6-group reduce."""
    ds = read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_linestatus", "l_quantity",
                       "l_extendedprice", "l_discount"])
    out = partial_groupby_agg(
        ds, ["l_returnflag", "l_linestatus"],
        sums={"sum_qty": "l_quantity", "sum_price": "l_extendedprice"},
        means={"avg_disc": "l_discount"}, count_alias="n")
    out = out[["l_returnflag", "l_linestatus", "sum_qty", "sum_price",
               "avg_disc", "n"]]
    out["sum_qty"] = duck_round(out["sum_qty"], ROUND_MONEY)
    out["sum_price"] = duck_round(out["sum_price"], ROUND_MONEY)
    out["avg_disc"] = duck_round(out["avg_disc"], ROUND_SCORE)
    return out


def segment_revenue(sf_dir: str):
    """Broadcast hash join orders -> customer (small side in the object
    store once), grouped revenue per market segment."""
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    from .broadcast import cached_get

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .to_pandas()
    seg_by_key = ray.put(pd.Series(cust["c_mktsegment"].to_numpy(),
                                   index=cust["c_custkey"].to_numpy()))

    def join_seg(b: pa.Table) -> pa.Table:
        # broadcast small side: ray.put once, fetched+deserialized once
        # per worker process (cached_get), elastic task pool — no fixed
        # actor-pool cap or spawn latency
        lookup: pd.Series = cached_get(seg_by_key)
        keys = b["o_custkey"].to_numpy(zero_copy_only=False)
        # vectorized dictionary gather (no per-row dict lookups)
        seg = lookup.reindex(keys).to_numpy()
        return b.append_column("c_mktsegment", pa.array(seg))

    orders = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = orders.map_batches(join_seg, batch_format="pyarrow")
    out = partial_groupby_agg(joined, ["c_mktsegment"],
                              sums={"revenue": "o_totalprice"},
                              count_alias="n_orders")
    out = out[["c_mktsegment", "revenue", "n_orders"]]
    out["revenue"] = duck_round(out["revenue"], ROUND_MONEY)
    return out


def time_window_counts(sf_dir: str,
                       lo: str = "2024-01-05 00:00:00",
                       hi: str = "2024-01-12 00:00:00"):
    """Absolute time-range filter + count per type (Q4 get_time_filter)."""
    from ray.data.aggregate import Count

    ds = read(sf_dir, "events", columns=["ts", "event_type"])
    lo64 = np.datetime64(lo)
    hi64 = np.datetime64(hi)

    def f(b: pa.Table) -> pa.Table:
        ts = b["ts"]
        mask = pc.and_(pc.greater_equal(ts, pa.scalar(lo64)),
                       pc.less_equal(ts, pa.scalar(hi64)))
        return b.filter(mask)

    return partial_groupby_agg(ds.map_batches(f, batch_format="pyarrow"),
                               ["event_type"], count_alias="n")


def exists_counts(sf_dir: str):
    """_exists_ conjunction filter (Q5): rows where value and props are
    both non-null, counted per type."""
    from ray.data.aggregate import Count

    ds = read(sf_dir, "events", columns=["event_type", "value", "props"])

    def f(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["value"]), pc.is_valid(b["props"]))
        return b.filter(m).select(["event_type"])

    return partial_groupby_agg(ds.map_batches(f, batch_format="pyarrow"),
                               ["event_type"], count_alias="n")


def multi_key_counts(sf_dir: str):
    """Multi-field concat group key (Q6 painless concat) + count."""
    from ray.data.aggregate import Count

    from .models.terms import add_key_column

    from ray.data.aggregate import Count

    ds = read(sf_dir, "events", columns=["user_id", "event_type"])
    ds = add_key_column(ds, ["user_id", "event_type"], "agg_key")
    # high-cardinality key -> direct distributed groupby (the partial
    # table would be corpus-scale; see partial_groupby_agg docstring)
    return ds.groupby("agg_key").aggregate(Count(alias_name="n"))


def first_occurrence(sf_dir: str):
    """Per (user_id, event_type): earliest ts + doc count (S4/A8)."""
    from ray.data.aggregate import Count, Min

    from ray.data.aggregate import Count, Min

    ds = read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    # high-cardinality key -> direct distributed groupby
    return ds.groupby(["user_id", "event_type"]).aggregate(
        Min("ts", alias_name="first_ts"),
        Count(alias_name="n"),
    )


def terms_across_counts(sf_dir: str):
    """Distinct-target count per aggregator (A3 core): distinct users per
    event_type."""
    from ray.data.aggregate import Count

    ds = read(sf_dir, "events", columns=["user_id", "event_type"])
    pairs = ds.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="pn"))
    return pairs.groupby("event_type").aggregate(Count(alias_name="n_distinct"))


_TERMS_COLS = {"event_id": np.int64, "aggregator": object, "target": object,
               "term_count": np.float64}


def _terms_out(out) -> pd.DataFrame:
    df = out.to_pandas()
    if df.empty:  # schema-stable empty result
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _TERMS_COLS.items()})
    return df[list(_TERMS_COLS)]


def terms_within_rare(sf_dir: str, max_count: int = 3):
    """terms within_aggregator, float frontier, trigger low — "rarely seen
    target within aggregator" (A4): event_ids whose (event_type, user_id)
    pair occurs < max_count times (may legitimately be empty at small sf)."""
    from .models.terms import terms_model

    ds = read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    out = terms_model(ds, "event_type", "user_id",
                      target_count_method="within_aggregator",
                      trigger_method="float", trigger_sensitivity=max_count,
                      trigger_on="low")
    return _terms_out(out)


def terms_across_outliers(sf_dir: str):
    """Full terms across_aggregators model (A3): aggregators whose
    distinct-user count exceeds 50% of the max get every event flagged."""
    from .models.terms import terms_model

    ds = read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    out = terms_model(ds, "event_type", "user_id",
                      target_count_method="across_aggregators",
                      trigger_method="pct_of_max_value",
                      trigger_sensitivity=50, trigger_on="high")
    df = out.to_pandas()
    if df.empty:
        return pd.DataFrame({"event_id": pd.Series(dtype=np.int64),
                             "aggregator": pd.Series(dtype=object),
                             "term_count": pd.Series(dtype=np.float64)})
    return df[["event_id", "aggregator", "term_count"]]


def metrics_entropy_outliers(sf_dir: str):
    """metrics model with the shannon-entropy kernel (M7) over props;
    oracle = DuckDB's ``entropy()`` aggregate over the char distribution.
    The metric column is rounded (6) on both sides — entropy is a
    computed float whose last ulp differs across engines."""
    from .models.metrics import metrics_model

    ds = read(sf_dir, "events", columns=["event_id", "event_type", "props"])
    out = metrics_model(ds, "event_type", "props", metric="entropy",
                        trigger_method="stdev", trigger_sensitivity=2,
                        trigger_on="high")
    df = _metrics_out(out)
    df["metric"] = duck_round(df["metric"], ROUND_SCORE)
    return df


def terms_within_median(sf_dir: str):
    """terms within_aggregator, pct_of_median_value 50 low — scale-
    invariant "rarely seen" (non-empty at every sf)."""
    from .models.terms import terms_model

    ds = read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    out = terms_model(ds, "event_type", "user_id",
                      target_count_method="within_aggregator",
                      trigger_method="pct_of_median_value",
                      trigger_sensitivity=50, trigger_on="low")
    return _terms_out(out)


_METRICS_COLS = ["event_id", "aggregator", "metric"]


def _metrics_out(out) -> pd.DataFrame:
    df = out.to_pandas()
    if df.empty:  # schema-stable empty result
        return pd.DataFrame({"event_id": pd.Series(dtype=np.int64),
                             "aggregator": pd.Series(dtype=object),
                             "metric": pd.Series(dtype=np.float64)})
    return df[_METRICS_COLS]


def metrics_length_outliers(sf_dir: str):
    """metrics model, length(props) per event_type, stdev*1 high (A6)."""
    from .models.metrics import metrics_model

    ds = read(sf_dir, "events", columns=["event_id", "event_type", "props"])
    out = metrics_model(ds, "event_type", "props", metric="length",
                        trigger_method="stdev", trigger_sensitivity=1,
                        trigger_on="high")
    return _metrics_out(out)


def metrics_value_mad_outliers(sf_dir: str):
    """metrics model, numerical_value(value) per event_type, mad*1 high."""
    from .models.metrics import metrics_model

    ds = read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    out = metrics_model(ds, "event_type", "value", metric="numerical_value",
                        trigger_method="mad", trigger_sensitivity=1,
                        trigger_on="high")
    return _metrics_out(out)


def sudden_appearance_events(sf_dir: str):
    """sudden_appearance over events: 7d window sliding by 1d across
    [2024-01-01, 2024-01-29] (§2.8)."""
    import datetime as dt

    from .models.sudden_appearance import sudden_appearance_model

    ds = read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])
    out = sudden_appearance_model(
        ds, "event_type", "user_id", ts_col="ts",
        history_start=dt.datetime(2024, 1, 1),
        history_end=dt.datetime(2024, 1, 29),
        slide=dt.timedelta(days=7), step=dt.timedelta(days=1),
        tiebreak_col="event_id")
    df = out.select_columns(
        ["aggregator", "target", "win_start", "win_end", "first_ts",
         "event_id"]).to_pandas()
    # normalize to microsecond timestamps (matches DuckDB fetchdf and the
    # parquet source unit; map_groups-produced columns come back as ns)
    for c in ("win_start", "win_end", "first_ts"):
        df[c] = df[c].astype("datetime64[us]")
    return df


# --------------------------------------------------------------------------
# training-data pipeline operators (dedup / similarity / text analysis /
# multimodal) over `documents` and `embeddings`
# --------------------------------------------------------------------------

def dedup_exact(sf_dir: str):
    from .dedup import exact_dedup

    return exact_dedup(read(sf_dir, "documents", columns=["doc_id", "text"]))


def dedup_minhash(sf_dir: str, threshold: float = 0.5):
    from .dedup import minhash_near_dups

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_near_dups(ds, threshold=threshold)


def dedup_ngram(sf_dir: str, threshold: float = 0.5):
    """EXACT n-gram Jaccard dedup (prefix-filter candidates + exact
    verify) — same oracle as dedup_minhash, but exact by construction,
    not by LSH recall."""
    from .dedup import ngram_jaccard_dups

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_jaccard_dups(ds, threshold=threshold)


def dedup_simhash(sf_dir: str):
    from .dedup import simhash_candidates

    return simhash_candidates(read(sf_dir, "documents", columns=["doc_id", "text"]))


def _query_embedding(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", vec_id)])
    return np.asarray(t["embedding"].to_pylist()[0], dtype=np.float64)


def ann_cosine(sf_dir: str, k: int = 10):
    from .similarity import cosine_topk

    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_topk(ds, _query_embedding(sf_dir), k=k)


def _query_matrix(sf_dir: str, n_queries: int):
    """(query matrix, query ids) for the first ``n_queries`` vectors —
    shared by the multi-query similarity gates."""
    import pyarrow.parquet as pq

    t = pq.read_table(_t(sf_dir, "embeddings"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", n_queries)])
    order = np.argsort(t["vec_id"].to_numpy())
    qm = np.array(t["embedding"].to_pylist(), dtype=np.float64)[order]
    qids = t["vec_id"].to_numpy()[order]
    return qm, qids


def ann_ivf(sf_dir: str, k: int = 10, n_queries: int = 5):
    """IVF ANN through an EXACTNESS GATE the driver can oracle: probing
    ALL lists (nprobe = n_lists) makes the probe exhaustive by
    construction, so the whole IVF machinery — deterministic
    hash-thinned sorted sample, seeded k-means fit, distributed assign
    pass, masked (batch x queries) probe matmul, tie-aware candidate
    cut, per-query top-k — is driver-checked against SQL brute-force
    cosine top-k (same oracle shape as ann_cosine_multi).  The
    production approximate setting (nprobe=12) is the recall table
    ``ann_ivf_recall``, pytest-gated at >= 0.8
    (tests/test_dedup_sim.py)."""
    from .similarity import IvfIndex

    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qm, qids = _query_matrix(sf_dir, n_queries)
    idx = IvfIndex(n_lists=16).fit_dataset(ds, max_sample=4096)
    return idx.probe_topk_multi(idx.assign_column(ds), qm, qids, k=k,
                                nprobe=idx.n_lists)


def ann_ivf_recall(sf_dir: str, k: int = 10, n_queries: int = 5,
                   nprobe: int = 12):
    """IVF-probed ANN recall TABLE at the production (approximate)
    nprobe: for each of the first ``n_queries`` query vectors, overlap
    of the IVF top-k vs the brute-force top-k.  Every piece is
    deterministic (hash-thinned sorted sample, seeded k-means, fixed
    probe order), so the table is stable across runs/parallelism.
    Recall floor (>= 0.8) asserted in pytest (tests/test_dedup_sim.py);
    the driver-oracled exact gate is ``ann_ivf``."""
    import pandas as pd

    from .similarity import IvfIndex, cosine_topk_multi

    qm, qids = _query_matrix(sf_dir, n_queries)
    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # synthetic embeddings are near-isotropic, so coarse cells separate
    # weakly: 16 lists / probe 12 measures recall 0.8-1.0 per query vs
    # brute force across sf0.001-0.1 (pytest-gated >= 0.8)
    idx = IvfIndex(n_lists=16).fit_dataset(ds, max_sample=4096)
    # ONE probed pass for all queries (probe_topk_multi) + one brute
    # pass — not a per-query re-execution of the assign stage
    ivf_all = idx.probe_topk_multi(idx.assign_column(ds), qm, qids,
                                   k=k, nprobe=nprobe)
    brute = cosine_topk_multi(ds, qm, qids, k=k)
    if not isinstance(brute, pd.DataFrame):
        brute = brute.to_pandas()
    rows = []
    for qid in qids:
        ivf_ids = set(ivf_all[ivf_all["query_id"] == qid]["vec_id"])
        brute_ids = set(brute[brute["query_id"] == qid]["vec_id"])
        n = len(ivf_ids & brute_ids)
        rows.append({"query_id": int(qid), "k": k, "n_overlap": n,
                     "recall_at_k": round(n / k, 6)})
    return pd.DataFrame(rows)


def embedding_dups(sf_dir: str, threshold: float = 0.9):
    from .similarity import embedding_near_dups

    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dups(ds, threshold=threshold)


def dedup_clusters(sf_dir: str, threshold: float = 0.5):
    """Near-dup pairs -> connected components -> (doc_id, cluster_id):
    the canonical keep-one-per-cluster resolution step (cluster_id = the
    component's min doc id)."""
    from .dedup import connected_components

    return connected_components(dedup_minhash(sf_dir, threshold))


def dedup_keep_list(sf_dir: str, threshold: float = 0.5):
    """Apply the dedup: doc_ids surviving near-dup cluster resolution
    (drop every cluster member except the min-id representative).  The
    drop set is dup-bounded, so it broadcasts into a vectorized
    anti-join over the streaming corpus."""
    from .joins import anti_join

    clusters = dedup_clusters(sf_dir, threshold)

    def non_reps(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b["doc_id"], b["cluster_id"]))

    drop = clusters.map_batches(non_reps, batch_format="pyarrow") \
        .select_columns(["doc_id"]).to_pandas()
    docs = read(sf_dir, "documents", columns=["doc_id"])
    if drop.empty:
        return docs
    return anti_join(docs, set(drop["doc_id"].astype(np.int64)), "doc_id")


def substring_dups(sf_dir: str, L: int = 40):
    """Exact cross-document substring-duplicate spans (Lee et al. 2022
    style, fixed byte-window variant): per doc, the count of length-L
    byte windows whose contents appear verbatim in ANOTHER doc and the
    distinct byte positions those windows cover.  Exact via
    hash-candidate + verbatim-byte verification (dedup.substring_dup
    _spans); winnowed fingerprints are the documented scale path."""
    from .dedup import substring_dup_spans

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    return substring_dup_spans(ds, L=L)


def embedding_dups_exact(sf_dir: str, threshold: float = 0.45):
    """EXACT all-pairs cosine join over the embeddings table (block-pair
    matmul tasks) — the truth baseline the LSH embedding_dups path is
    audited against, same exact/approx pairing as dedup_ngram vs
    dedup_minhash."""
    from .similarity import exact_cosine_pairs

    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return exact_cosine_pairs(ds, threshold=threshold)


def ann_cosine_multi(sf_dir: str, k: int = 10, n_queries: int = 5):
    """Brute-force cosine top-k for a QUERY MATRIX (first n_queries
    vectors) in one corpus pass — the batched-serving form of
    ann_cosine."""
    from .similarity import cosine_topk_multi

    qm, qids = _query_matrix(sf_dir, n_queries)
    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_topk_multi(ds, qm, qids, k=k)


def hash_split(sf_dir: str, val_pct: int = 10, test_pct: int = 10):
    """Deterministic train/val/test assignment: mix64(doc_id) partitions
    the 64-bit key space — stable across runs, machines and Ray
    parallelism (no RNG state), the standard reproducible-split pattern
    for training corpora."""
    from .hashing import mix64

    ds = read(sf_dir, "documents", columns=["doc_id"])
    hi = np.uint64(2**64 - 1)
    val_cut = np.uint64(int(hi) * val_pct // 100)
    test_cut = np.uint64(int(hi) * (val_pct + test_pct) // 100)

    def f(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = mix64(ids.view(np.uint64))
        split = np.where(h < val_cut, "val",
                         np.where(h < test_cut, "test", "train"))
        return pa.table({"doc_id": b["doc_id"],
                         "split": pa.array(split, type=pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def hash_sample(sf_dir: str, pct: int = 20):
    """Deterministic corpus sample: keep FULL ROWS whose mix64(doc_id)
    falls in the lowest pct of the key space (batching/parallelism-
    independent — the distributed alternative to seeded random_sample)."""
    from .hashing import mix64

    ds = read(sf_dir, "documents")
    cut = np.uint64(int(np.uint64(2**64 - 1)) * pct // 100)

    def f(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = mix64(ids.view(np.uint64)) < cut
        return b.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def packed_sequences(sf_dir: str, max_tokens: int = 256,
                     range_size: int = 100):
    """Sequence packing over documents (first-fit-sequential per
    deterministic doc_id-range group)."""
    from .textstats import pack_sequences

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    return pack_sequences(ds, max_tokens=max_tokens, range_size=range_size)


def quality(sf_dir: str):
    from .textstats import quality_scores

    return quality_scores(read(sf_dir, "documents", columns=["doc_id", "text"]))


def repetition(sf_dir: str):
    """Gopher-style repetition scores (dup-token / top-token / top-bigram
    fractions) over documents — the repetition-filter half of the quality
    pipeline (Rae et al. 2021 App. A)."""
    from .textstats import repetition_scores

    return repetition_scores(read(sf_dir, "documents",
                                  columns=["doc_id", "text"]))


def gopher_quality_filter(sf_dir: str):
    """Fused Gopher-style quality filter over documents: one tokenize
    pass emits the gate signals + keep decision (textstats.gopher_filter
    — the filtering composition the repetition/quality signals exist
    for)."""
    from .textstats import gopher_filter

    return gopher_filter(read(sf_dir, "documents",
                              columns=["doc_id", "text"]))


def pii_scrub_docs(sf_dir: str):
    """PII detection + redaction over documents (textstats.pii_scrub).
    The testdata corpus carries no natural PII, so this entry plants
    synthetic emails / IPv4s / phone numbers deterministically from
    doc_id — the SQL oracle builds the IDENTICAL augmented text — and
    the generic operator counts + redacts them.  The augmentation is
    test-input synthesis local to this entry; the operator itself is the
    corpus-scale stage."""
    from .textstats import pii_scrub

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def aug(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = np.asarray(b["text"].to_pandas(), dtype=np.str_)
        ids_s = ids.astype(np.str_)
        em = np.char.add(np.char.add(" contact user", ids_s),
                         "@example.com now")
        ip = np.char.add(np.char.add(np.char.add(np.char.add(
            " src 10.", (ids % 256).astype(np.str_)), ".0."),
            ((ids * 7) % 256).astype(np.str_)), " end")
        ph = np.char.add(np.char.add(np.char.add(
            " call 555-", (100 + ids % 900).astype(np.str_)), "-"),
            np.char.add((1000 + (ids * 3) % 9000).astype(np.str_), " now"))
        out = np.char.add(
            np.char.add(np.char.add(txt, np.where(ids % 7 == 0, em, "")),
                        np.where(ids % 11 == 0, ip, "")),
            np.where(ids % 13 == 0, ph, ""))
        return pa.table({"doc_id": b["doc_id"],
                         "text": pa.array(out.tolist(), type=pa.string())})

    return pii_scrub(ds.map_batches(aug, batch_format="pyarrow"))


# decontamination bench-set parameters, shared with the SQL oracle
DECON_N = 6
DECON_MOD = 89


def decontaminate_docs(sf_dir: str):
    """Benchmark decontamination over documents.  The benchmark set is
    derived deterministically from the corpus itself (the first DECON_N
    tokens of every ``doc_id % DECON_MOD == 0`` document with at least
    DECON_N tokens) so the gate is self-contained and SQL-oracle-able;
    in production the set is an external fixed-size artifact (all
    n-grams of the eval benchmarks), tiny relative to the corpus —
    hence the broadcast design in textstats.decontaminate.  The bench
    derivation collects ~corpus/DECON_MOD short strings to the driver:
    bounded by construction here, and absent entirely in the external-
    artifact production shape."""
    from .textstats import decontaminate

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_extract(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pa.array(ids % DECON_MOD == 0)
        sub = b.filter(keep)
        toks = tokenize_column(sub["text"])
        nlen = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        grams = pc.binary_join(
            pc.list_slice(toks, 0, DECON_N), " ")
        t = pa.table({"ngram": grams}).filter(pa.array(nlen >= DECON_N))
        return t

    bench = [r["ngram"] for r in
             ds.map_batches(bench_extract, batch_format="pyarrow")
             .take_all()]
    return decontaminate(ds, bench, n=DECON_N)


def lm_perplexity_docs(sf_dir: str):
    """CCNet-style bigram-LM quality scores over documents
    (textstats.lm_perplexity; corpus-trained add-0.1 model so the gate
    is self-contained — see the operator docstring for the
    fixed-external-LM production stance)."""
    from .textstats import lm_perplexity

    return lm_perplexity(read(sf_dir, "documents",
                              columns=["doc_id", "text"]))


def quality_resample(sf_dir: str):
    """Deterministic quality-weighted resampling over documents: weight
    w = 16 * stopword_ratio (a proven quality proxy; the multiplier is
    sized so corpus weights straddle 1 — max ~2.4 — and the gate
    exercises the guaranteed-copy, fractional and drop paths), then
    textstats.resample_by_weight emits floor(w) copies plus a
    mix64(doc_id)-decided fractional copy."""
    from .textstats import quality_scores, resample_by_weight

    q = quality_scores(read(sf_dir, "documents",
                            columns=["doc_id", "text"]))

    def addw(b: pa.Table) -> pa.Table:
        return b.append_column(
            "w", pc.multiply(b["stopword_ratio"], 16.0))

    return resample_by_weight(
        q.map_batches(addw, batch_format="pyarrow"), "w")


def langid_documents(sf_dir: str):
    from .textstats import langid

    return langid(read(sf_dir, "documents", columns=["doc_id", "text"]))


def bpe_counts(sf_dir: str):
    from .textstats import bpe_token_counts

    return bpe_token_counts(read(sf_dir, "documents", columns=["doc_id", "text"]))


def fingerprints(sf_dir: str):
    from .textstats import fingerprint

    return fingerprint(read(sf_dir, "documents", columns=["doc_id", "text"]))


def source_mix(sf_dir: str):
    """Data-mixing stats per (source, lang) over documents
    (textstats.mix_stats — per-batch partial aggregation streaming to a
    tiny driver fold)."""
    from .textstats import mix_stats

    return mix_stats(read(sf_dir, "documents",
                          columns=["text", "source", "lang"]))


# per-source cap for stratified_sample, shared with the SQL oracle
STRAT_CAP = 15


def stratified_sample(sf_dir: str, cap: int = STRAT_CAP):
    """Deterministic per-source cap downsample over documents
    (textstats.stratified_sample — mix64 float64 threshold per source,
    bit-reproducible against the SQL oracle because both engines do the
    identical float64 arithmetic)."""
    from .textstats import stratified_sample as strat

    return strat(read(sf_dir, "documents", columns=["doc_id", "source"]),
                 cap=cap)


# chunk size for chunk_docs, shared with the SQL oracle
CHUNK_SIZE = 64


def chunk_docs(sf_dir: str):
    """Fixed-size token chunking over documents
    (textstats.chunk_documents — the splitting counterpart of
    pack_sequences for training-context preparation; shuffle-free,
    deterministic under any parallelism)."""
    from .textstats import chunk_documents

    return chunk_documents(read(sf_dir, "documents",
                                columns=["doc_id", "text"]),
                           chunk_size=CHUNK_SIZE)


def bpe_train_docs(sf_dir: str, num_merges: int = 30):
    """BPE tokenizer training over documents (textstats.bpe_train): a
    distributed word-count pass streams vocabulary-sized partials to a
    driver fold, then the merge loop runs over the (word, count) table —
    the SentencePiece/HF production shape.  Iterative (each merge
    changes the next iteration's pair counts), so no SQL oracle exists;
    pinned instead by tests/test_bpe_train.py against an independently
    coded dict-based reference plus a parallelism-independence check."""
    from .textstats import bpe_train

    return bpe_train(read(sf_dir, "documents", columns=["text"]),
                     num_merges=num_merges)


def count_events(sf_dir: str):
    """S2 server-side count (metadata-only for unfiltered parquet)."""
    n = read(sf_dir, "events", columns=["event_id"]).count()
    return pd.DataFrame([{"n": n}])


def latest_events(sf_dir: str, k: int = 20):
    """Sort + limit (O1/O3 family): most recent k events."""
    ds = read(sf_dir, "events", columns=["event_id", "ts"])
    return ds.sort(["ts", "event_id"], descending=[True, False]).limit(k)


def dsl_filter(sf_dir: str):
    """Q2 structured DSL filter: bool(must=[range, terms])."""
    from .query.dsl import filter_by_dsl

    ds = read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    out = filter_by_dsl(ds, {"bool": {"must": [
        {"range": {"value": {"gte": 5, "lte": 10}}},
        {"terms": {"event_type": ["click", "view"]}},
    ]}})
    return out.select_columns(["event_id", "event_type"])


def matched_values_highlight(sf_dir: str, query: str = "spark merge slow"):
    """Q7 highlight: per matching doc, which query terms matched."""
    from .query.dsl import add_matched_values
    from .query.parse import filter_by_query_string
    from .query.reader import IndexReader

    reader = IndexReader(documents_index(sf_dir))
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    out = filter_by_query_string(ds, query, reader=reader)
    out = add_matched_values(out, query)

    def proj(b):
        import pyarrow as _pa
        import pyarrow.compute as _pc

        joined = _pc.binary_join(b["matched_values"], "|")
        return _pa.table({"doc_id": b["doc_id"], "matched": joined})

    return out.map_batches(proj, batch_format="pyarrow")


def hash_join_revenue(sf_dir: str):
    """Large-large partitioned hash join (no broadcast): lineitem x
    orders on the order key, revenue per order priority."""
    from ray.data.aggregate import Count, Sum

    from .joins import hash_join

    li = read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["l_orderkey", "o_orderpriority"])

    orders = orders.map_batches(rename, batch_format="pyarrow")
    # B derived from input row counts (joins._join_buckets)
    joined = hash_join(li, orders, "l_orderkey")

    def add_rev(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return b.append_column("rev", rev)

    out = joined.map_batches(add_rev, batch_format="pyarrow") \
        .groupby("o_orderpriority").aggregate(
            Sum("rev", alias_name="revenue"), Count(alias_name="n")) \
        .to_pandas()
    out["revenue"] = duck_round(out["revenue"], ROUND_MONEY)
    return out


def asof_join_events(sf_dir: str):
    """AS-OF JOIN (custom operator — Ray Data has no native form): every
    purchase event gets the most recent click AT OR BEFORE it by the
    same user; ties on the click timestamp resolve to the greatest
    click event_id (deterministic under duplicate timestamps).  One
    hash-bucket co-group shuffle + a fully vectorized composite-key
    searchsorted inside each bucket (joins.asof_join)."""
    from .joins import asof_join

    ev = read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                         "event_type"])

    def only(et: str):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["event_type"], et)) \
                .drop_columns(["event_type"])
        return f

    purchases = ev.map_batches(only("purchase"), batch_format="pyarrow")
    clicks = ev.map_batches(only("click"), batch_format="pyarrow")
    out = asof_join(purchases, clicks, "user_id", "ts", tie_col="event_id")

    def rename(b: pa.Table) -> pa.Table:
        names = {"event_id_r": "click_event_id", "ts_r": "click_ts"}
        return b.rename_columns([names.get(n, n) for n in b.column_names])

    return out.map_batches(rename, batch_format="pyarrow")


def simplequery_filter(sf_dir: str):
    """simplequery via the query-string parser (Q1/Q2 surface): events
    matching ``event_type:error AND _exists_:props``."""
    from .query.parse import filter_by_query_string

    ds = read(sf_dir, "events", columns=["event_id", "event_type", "props"])
    out = filter_by_query_string(ds, "event_type:error AND _exists_:props",
                                 text_col="props", default_operator="and")
    return out.select_columns(["event_id", "event_type"])


def wildcard_search(sf_dir: str, query: str = "sc* OR s?ark"):
    """Lucene wildcard clauses (``*``/``?``) resolved through the index's
    term dictionary (prefix-pruned segment range scan + posting-list
    union, capped at the max_clause_count analogue) — part of the
    query_string surface the reference forwards verbatim to ES
    (/root/reference/app/helpers/es.py:238-250)."""
    from .query.parse import filter_by_query_string
    from .query.reader import IndexReader

    reader = IndexReader(documents_index(sf_dir))
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    out = filter_by_query_string(ds, query, reader=reader)
    return out.select_columns(["doc_id"])


def fuzzy_search(sf_dir: str, query: str = "spark~1"):
    """Lucene fuzzy term (``term~N``) resolved through the index's term
    dictionary with a vectorized Levenshtein DP (query/fuzzy.py) and a
    posting-list union — semantics pinned to DuckDB ``levenshtein()``."""
    from .query.parse import filter_by_query_string
    from .query.reader import IndexReader

    reader = IndexReader(documents_index(sf_dir))
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    out = filter_by_query_string(ds, query, reader=reader)
    return out.select_columns(["doc_id"])


def regexp_search(sf_dir: str, query: str = "/s(can|park)/"):
    """Lucene regexp term (``/pattern/``, full-match) resolved through
    the index's term dictionary — RE2 on both engine (Arrow) and oracle
    (DuckDB regexp_full_match)."""
    from .query.parse import filter_by_query_string
    from .query.reader import IndexReader

    reader = IndexReader(documents_index(sf_dir))
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    out = filter_by_query_string(ds, query, reader=reader)
    return out.select_columns(["doc_id"])


def range_filter(sf_dir: str):
    """query_string range + comparison clauses (``[a TO b]`` inclusive,
    ``>=v`` one-sided) over events, bounds cast to the column's own
    Arrow type — Lucene range-query semantics."""
    from .query.parse import filter_by_query_string

    ds = read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    out = filter_by_query_string(
        ds,
        "event_type:purchase AND value:[100 TO 250]"
        " OR event_type:error AND value:>=320")
    return out.select_columns(["event_id", "event_type"])


def phrase_search(sf_dir: str, phrase: str = "spark merge"):
    """Phrase query over documents: posting intersection + adjacency
    verify (Q1 phrase surface)."""
    from .query.parse import filter_by_query_string
    from .query.reader import IndexReader

    reader = IndexReader(documents_index(sf_dir))
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    out = filter_by_query_string(ds, f'"{phrase}"', reader=reader)
    return out.select_columns(["doc_id"])


def phrase_slop_search(sf_dir: str, phrase: str = "spark merge",
                       slop: int = 1):
    """Sloppy phrase ("a b"~N, Lucene 2-term slop metric |p1-p0-1|<=N)
    over documents — oracled against DuckDB token positions."""
    from .query.parse import filter_by_query_string
    from .query.reader import IndexReader

    reader = IndexReader(documents_index(sf_dir))
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    out = filter_by_query_string(ds, f'"{phrase}"~{slop}', reader=reader)
    return out.select_columns(["doc_id"])


def rare_term_docs(sf_dir: str, k: int = 3):
    """Index-backed rarity scoring (the north-star replacement for the
    reference's ES-side rare-term outlier models): the k rarest terms
    come from segment METADATA df (no posting decode), and each matching
    doc is scored by how many distinct rare terms it contains (posting-
    list union + bincount)."""
    from .index.codec import decode_run
    from .query.reader import IndexReader

    reader = IndexReader(documents_index(sf_dir))
    rare = reader.rarest_terms(k)
    ids = []
    for t, _df in rare:
        run = reader.postings(t)
        if run is not None:
            ids.append(decode_run(run)[0])
    if not ids:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "n_rare": pd.Series(dtype=np.int64)})
    flat = np.concatenate(ids)
    doc, n = np.unique(flat, return_counts=True)
    return pd.DataFrame({"doc_id": doc.astype(np.int64),
                         "n_rare": n.astype(np.int64)})


def word2vec_outliers(sf_dir: str, limit: int = 200):
    """word2vec model over a deterministic slice of documents (rows-only:
    iterative model training is not SQL-expressible)."""
    from .models.word2vec import word2vec_model

    # documents.parquet is doc_id-ordered, so limit-after-read IS the
    # smallest `limit` doc_ids — no global sort shuffle needed
    ds = read(sf_dir, "documents", columns=["doc_id", "text", "lang"]) \
        .limit(limit)
    out = word2vec_model(ds, "lang", "text", trigger_method="stdev",
                         trigger_sensitivity=1.0, trigger_on="low")
    df = out.to_pandas()
    if df.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "w2v_score": pd.Series(dtype=np.float64)})
    return df[["doc_id", "w2v_score"]]


def word2vec_prob_scores(sf_dir: str, limit: int = 200):
    """Exact word2vec probability-model text scores (use_prob_model with
    output_prob=0 -> arithmetic mean of log pair probabilities, incl.
    the reference's +1 counting quirk) per document, grouped by lang —
    fully SQL-expressible, so this pins the prob-model semantics against
    a DuckDB oracle.  Docs with <2 space-separated tokens produce no
    pairs and are excluded (mirrored in SQL)."""
    from .models.word2vec import GroupWord2Vec, W2VSettings

    ds = read(sf_dir, "documents", columns=["doc_id", "text", "lang"]) \
        .limit(limit)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable").reset_index(drop=True)
        s = W2VSettings(use_prob_model=True, output_prob=False,
                        separators=" ", size_window=2,
                        trigger_focus="text", trigger_score="mean")
        m = GroupWord2Vec(s)
        texts = g["text"].tolist()
        m.prepare(texts)
        res = m.find_outliers(texts)
        if not res:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "w2v_prob_score": pd.Series(dtype=np.float64)})
        idx = [r["text_idx"] for r in res]
        return pd.DataFrame({
            "doc_id": g["doc_id"].iloc[idx].to_numpy(),
            "w2v_prob_score": duck_round(
                [r["score"] for r in res], ROUND_SCORE)})

    out = ds.groupby("lang").map_groups(fn, batch_format="pandas")
    df = out.to_pandas()
    if df.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "w2v_prob_score": pd.Series(dtype=np.float64)})
    return df[["doc_id", "w2v_prob_score"]]


# above this flagged-row count the enrichment uses the hash-sharded
# actor store (apply_outliers_sharded) instead of the broadcast driver
# dict — at corpus scale the outlier entries never collect on the driver
_ENRICH_SHARDED_MIN_ROWS = 10_000


def enrichment_snapshot(sf_dir: str):
    """Enrichment pipeline (S5 semantics): flag docs via the terms model,
    merge outlier arrays + tag, return enriched rows.

    Size-gated like search_and: sparse outliers broadcast as a driver
    dict; above ``_ENRICH_SHARDED_MIN_ROWS`` the flagged rows NEVER
    touch driver pandas — the terms-model output stays a Dataset,
    one ``map_batches`` rewrites it into entry rows, and those push
    hash-sharded straight into the actor store while the corpus streams
    one merge pass (the scale path — pytest forces the gate to prove
    both paths produce identical output).  The materialize is bounded
    by the outlier rate, not the corpus, and spills rather than
    collecting."""
    from .models.terms import terms_model

    ds = read(sf_dir, "events", columns=["event_id", "event_type", "user_id"])
    flagged_ds = terms_model(
        read(sf_dir, "events",
             columns=["event_id", "user_id", "event_type"]),
        "event_type", "user_id",
        target_count_method="within_aggregator",
        trigger_method="pct_of_median_value",
        trigger_sensitivity=50, trigger_on="low").materialize()
    if flagged_ds.count() > _ENRICH_SHARDED_MIN_ROWS:
        from .enrich import apply_outliers_sharded

        def to_entries(b: pa.Table) -> pa.Table:
            n = b.num_rows
            summary = pc.binary_join_element_wise(
                pa.array(["rare"] * n),
                pc.cast(b["target"], pa.string()),
                pa.array(["in"] * n),
                pc.cast(b["aggregator"], pa.string()), " ")
            return pa.table({
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "type": pa.array(["rare"] * n),
                "reason": pa.array(["rarely seen target"] * n),
                "summary": summary,
                "model_name": pa.array(["rare_users"] * n),
                "model_type": pa.array(["terms"] * n),
                "extra": pa.nulls(n, pa.string()),
            })

        entries_ds = flagged_ds.map_batches(to_entries,
                                            batch_format="pyarrow")
        out = apply_outliers_sharded(ds, entries_ds, id_col="event_id")
    else:
        from .enrich import apply_outliers

        flagged = flagged_ds.to_pandas()
        ids = flagged["event_id"].to_numpy().astype(np.int64) \
            if len(flagged) else np.array([], dtype=np.int64)
        summaries = ("rare " + flagged["target"].astype(str)
                     + " in " + flagged["aggregator"].astype(str)).tolist() \
            if len(flagged) else []
        entries: dict[int, list[dict]] = {}
        for i, s in zip(ids, summaries):
            entries.setdefault(int(i), []).append({
                "type": "rare", "reason": "rarely seen target",
                "summary": s, "model_name": "rare_users",
                "model_type": "terms"})
        out = apply_outliers(ds, entries, id_col="event_id")
    df = out.to_pandas()
    df = df[df["outliers"].notna()]
    return pd.DataFrame({
        "event_id": df["event_id"].astype(np.int64),
        "total_outliers": [o["total_outliers"] for o in df["outliers"]],
        "tags": ["|".join(t) for t in df["tags"]],
    })


def whitelist_housekeeping(sf_dir: str):
    """S7 housekeeping pass: enrich then strip whitelisted outliers
    (rows-only)."""
    from .enrich import apply_outliers, remove_whitelisted_outliers
    from .models.whitelist import Whitelist

    # deterministic slice: smallest 50 event_ids (map_groups output order
    # is scheduling-dependent)
    flagged = terms_within_median(sf_dir).sort_values("event_id").head(50)
    summaries = ("rare " + flagged["target"].astype(str)
                 + " in " + flagged["aggregator"].astype(str)).tolist()
    entries = {
        int(i): [{
            "type": "rare", "reason": "rarely seen target",
            "summary": s, "model_name": "rare_users",
            "model_type": "terms"}]
        for i, s in zip(flagged["event_id"].to_numpy(np.int64), summaries)
    }
    wl = Whitelist.from_config(regexp_entries=[r"^rare .* in error$"])
    ds = read(sf_dir, "events", columns=["event_id", "event_type", "user_id"])
    out = remove_whitelisted_outliers(apply_outliers(ds, entries,
                                                     id_col="event_id"), wl)
    df = out.to_pandas()
    df = df[df["outliers"].notna()]
    return pd.DataFrame({
        "event_id": df["event_id"].astype(np.int64),
        "total_outliers": [o["total_outliers"] for o in df["outliers"]],
    })


def media_features(sf_dir: str):
    """Multimodal decode stage over the deterministic synthetic media
    table (payload columns are not part of the driver testdata).  All
    three modalities take REAL pure-stdlib decode paths: image rows
    carry PNG payloads (png.py) and, alternating, baseline JPEG
    payloads (jpeg.py — Annex K Huffman + DCT, 4:4:4/4:2:0), audio
    rows 16-bit PCM WAV and, alternating, IMA-ADPCM compressed WAV
    (wav.py -> spectral/energy features; the ADPCM kernel is pinned
    bit-exact to stdlib audioop), video rows uncompressed-DIB AVI
    (avi.py -> temporal pixel features); ``fake=False`` asserts no row
    can silently fall back to the stub."""
    import ray.data

    from .multimodal import decode_features, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(n=64, seed=5,
                                               real_png=True,
                                               real_wav=True,
                                               real_avi=True,
                                               real_jpeg=True,
                                               real_adpcm=True))
    return decode_features(ds, fake=False)


def url_host_stats(sf_dir: str):
    """Canonical-URL dedup summary per host (urls.url_host_stats).  The
    testdata carries no url column, so this entry synthesizes
    Common-Crawl-style raw urls deterministically from (doc_id, source)
    — mixed-case scheme/host, default :80 ports, utm_* tracking params,
    trailing slashes, fragments — and the SQL oracle builds the
    IDENTICAL raw strings and runs the IDENTICAL canonicalization regex
    chain (urls.CANON_STEPS, interpolated verbatim — the PII_PATTERNS
    stance).  The synthesis is test-input generation local to this
    entry; canonicalize + the per-host fold are the corpus-scale
    stages."""
    from .urls import url_host_stats as _stats

    ds = read(sf_dir, "documents", columns=["doc_id", "source"])

    def aug(b: pa.Table) -> pa.Table:
        # canonical-determining parts derive from k = doc_id % 17 so
        # distinct docs genuinely collapse onto shared canonical urls
        # (dup_docs > 0); raw-side noise that canonicalization must
        # erase (scheme/host case, :80, trailing slash, utm, fragment)
        # derives from doc_id itself.
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = ids % 17
        src = np.asarray(b["source"].to_pandas(), dtype=np.str_)
        h = np.char.add(np.char.add(np.char.add(np.char.add(
            "www.", src), "-"), (k % 5).astype(np.str_)), ".example.com")
        hostp = np.where(ids % 3 == 0, np.char.upper(h), h)
        url = np.where(ids % 2 == 0, "HTTP://", "http://")
        url = np.char.add(url.astype(np.str_), hostp)
        url = np.char.add(url, np.where(ids % 5 == 0, ":80", ""))
        url = np.char.add(url, np.char.add("/p/", (k % 11).astype(np.str_)))
        url = np.char.add(url, np.where(ids % 4 == 0, "/", ""))
        q = np.where(
            k % 6 == 0,
            np.char.add("?utm_source=feed&ref=", (k % 3).astype(np.str_)),
            np.where(k % 6 == 3,
                     np.char.add("?id=", (k % 7).astype(np.str_)), ""))
        url = np.char.add(url, q.astype(np.str_))
        url = np.char.add(url, np.where(ids % 9 == 0, "#sec", ""))
        return pa.table({"url": pa.array(url.tolist(), type=pa.string())})

    return _stats(ds.map_batches(aug, batch_format="pyarrow"))


def top_ngrams(sf_dir: str, n: int = 2, k: int = 20):
    """Top-k word n-grams (bigrams by default) by corpus frequency, ties
    (count desc, gram asc) — collocation / contamination-screen stats
    over the documents table (textstats.ngram_counts; windows never
    cross a doc boundary).  The gram table from the fold arrives sorted
    ascending, so a stable argsort on -count preserves the gram-asc
    tie order exactly."""
    from .textstats import ngram_counts

    ds = read(sf_dir, "documents", columns=["text"])
    w, c = ngram_counts(ds, n=n)
    order = np.argsort(-c, kind="stable")[:k]
    return pd.DataFrame({"gram": w[order].astype(str),
                         "c": c[order].astype(np.int64)})


def more_like_this(sf_dir: str, doc_id: int = 7, max_terms: int = 5,
                   min_match: int = 2, k: int = 10):
    """Elasticsearch ``more_like_this`` re-owned (the reference reaches
    MLT-style relevance through es_query pass-through,
    /root/reference/app/helpers/es.py:238-250): take the source doc's
    top tf-idf terms (stored-field tokenize + index-metadata df — the
    same two inputs ES MLT uses), then run a BM25 minimum_should_match
    OR query over them, excluding the source doc.

    Determinism: per-term tf-idf is duck-rounded to 6 dp BEFORE ranking
    on BOTH engines, ties (tfidf desc, term asc); the query itself is
    engine.min_match_topk (top-(k+1) then drop the source then take k ==
    filter-then-top-k, since dropping one row keeps the filtered top-k
    inside the unfiltered top-(k+1)).

    Driver-only access pattern: the source row comes from a parquet
    row-filter read (stored fields), postings/df from the index reader
    — no corpus scan, no Ray stage; at scale this is one serving-path
    request, exactly like bm25_topk."""
    import pyarrow.parquet as pq

    from .query.engine import min_match_topk
    from .query.reader import IndexReader
    from .tokenizer import tokenize

    reader = IndexReader(documents_index(sf_dir))
    t = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"],
                      filters=[("doc_id", "==", doc_id)])
    empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                          "n_matched": pd.Series(dtype=np.int64),
                          "score": pd.Series(dtype=np.float64)})
    if t.num_rows == 0:
        return empty
    toks = tokenize(t["text"][0].as_py())
    if not toks:
        return empty
    terms, tfs = np.unique(np.asarray(toks, dtype=np.str_),
                           return_counts=True)
    dfs = np.array([reader.df(str(x)) for x in terms], dtype=np.float64)
    idfv = np.log(1.0 + (reader.n_docs - dfs + 0.5) / (dfs + 0.5))
    tfidf = duck_round(tfs.astype(np.float64) * idfv, ROUND_SCORE)
    order = np.lexsort((terms, -tfidf))[:max_terms]
    sel = tuple(sorted(terms[order].tolist()))
    d, nm, s = min_match_topk(reader, sel, min_match, k=k + 1)
    keep = d != doc_id
    return pd.DataFrame({
        "doc_id": d[keep][:k],
        "n_matched": nm[keep][:k],
        "score": duck_round(s[keep][:k], ROUND_SCORE),
    })


def ann_pq(sf_dir: str, k: int = 10, n_queries: int = 5,
           m: int = 32, ks: int = 256):
    """Product-quantized ANN recall TABLE (similarity.PqIndex): for each
    of the fixed query vectors, overlap of the ADC top-k (scanned over
    m-byte codes only — the float vectors are never read at query time)
    vs brute-force cosine top-k.  Fully deterministic (shared
    hash-sorted sample, seeded per-subspace k-means, rounded tie-aware
    cuts), so the table is stable across runs/parallelism; the recall
    floor is pytest-gated (tests/test_dedup_sim.py), the same stance as
    ann_ivf_recall.  PQ cannot have an exactness gate (quantization is
    lossy by construction) — this entry is rows-only for the driver.

    Defaults: m=32 (dsub=2) on the 64-dim isotropic testdata measures
    recall 0.7-1.0 (mean 0.84-0.96) across sf0.001-0.1 at 8x
    compression; m=16 (16x) trades to 0.7-0.9.  Real embedding corpora
    cluster far better than isotropic noise, so these floors are the
    hard case."""
    from .similarity import PqIndex, cosine_topk_multi

    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qm, qids = _query_matrix(sf_dir, n_queries)
    idx = PqIndex(m=m, ks=ks).fit_dataset(ds, max_sample=4096)
    coded = idx.encode_column(ds).select_columns(["vec_id", "pq_code"])
    pq_all = idx.adc_topk_multi(coded, qm, qids, k=k)
    brute = cosine_topk_multi(ds, qm, qids, k=k)
    if not isinstance(brute, pd.DataFrame):
        brute = brute.to_pandas()
    rows = []
    for qid in qids:
        a = set(pq_all[pq_all["query_id"] == qid]["vec_id"])
        b = set(brute[brute["query_id"] == qid]["vec_id"])
        rows.append({"query_id": int(qid), "k": k,
                     "n_overlap": len(a & b),
                     "recall_at_k": round(len(a & b) / k, 6)})
    return pd.DataFrame(rows)
