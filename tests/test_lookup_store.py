"""Direct pins for the sharded store's ARRAY MODE and the
coarse-partition distributed pair kernel (dedup._pairs_distributed).

These paths are load-bearing for the 1M-scale dedup invariants
(CLAUDE.md): per-key value segments must survive push -> consolidate ->
fetch in their original intra-segment order, duplicate keys must keep
dict-parity last-write-wins, and the coarse-partition pair generation
must emit exactly the per-bucket pair set.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from ee_outliers_ray.dedup import _pairs_distributed, distinct_pairs
from ee_outliers_ray.lookup import ShardedStore, _segment_gather


def test_segment_gather_basic_and_empty():
    flat = np.arange(100, dtype=np.int64)
    starts = np.array([10, 50, 0], dtype=np.int64)
    lens = np.array([3, 0, 5], dtype=np.int64)
    out = _segment_gather(flat, starts, lens)
    assert out.tolist() == [10, 11, 12, 0, 1, 2, 3, 4]
    assert _segment_gather(flat, starts[:0], lens[:0]).size == 0
    assert _segment_gather(flat, starts, np.zeros(3, np.int64)).size == 0


def _build_store(keys, segments, num_shards=3):
    """Push (key, 1-D uint64 segment) rows through array-mode build."""
    flat = (np.concatenate(segments) if segments
            else np.zeros(0, np.uint64))
    lens = np.array([len(s) for s in segments], dtype=np.int64)
    t = pa.table({"k": pa.array(np.asarray(keys, np.int64))})
    ds = ray.data.from_arrow(t)
    state = {"flat": flat, "lens": lens,
             "keys": np.asarray(keys, np.int64)}

    def make_kv(b: pa.Table):
        # single-block dataset: the one batch carries every row
        assert len(b) == len(state["keys"])
        return state["keys"], state["flat"], state["lens"]

    return ShardedStore(num_shards).build(ds, make_kv)


def test_array_mode_roundtrip_preserves_segment_order():
    rng = np.random.default_rng(5)
    keys = np.arange(20, dtype=np.int64)
    # deliberately UNSORTED values inside each segment: the store must
    # not reorder within a segment (the dedup packed-verify invariant
    # is sorted-uint64 segments, but the store itself must be
    # order-preserving, not order-creating)
    segs = [rng.integers(0, 2**63, size=rng.integers(0, 9)).astype(np.uint64)
            for _ in keys]
    store = _build_store(keys, segs)
    try:
        ask = np.array([3, 17, 999, 0, 3], dtype=np.int64)
        uids, flat, off, present = store.get_array_segments(ask)
        assert uids.tolist() == [0, 3, 17, 999]
        assert present.tolist() == [True, True, True, False]
        for u, p in zip(uids, present):
            i = int(np.searchsorted(uids, u))
            got = flat[off[i]:off[i + 1]]
            if p:
                assert got.tolist() == segs[int(u)].tolist()
            else:
                assert got.size == 0
    finally:
        store.shutdown()


def test_array_mode_duplicate_keys_last_write_wins():
    # same key pushed twice in one batch: dict parity keeps the LAST
    keys = np.array([7, 8, 7], dtype=np.int64)
    segs = [np.array([1, 2], np.uint64), np.array([9], np.uint64),
            np.array([3, 4, 5], np.uint64)]
    store = _build_store(keys, segs, num_shards=2)
    try:
        uids, flat, off, present = store.get_array_segments(
            np.array([7, 8], np.int64))
        assert present.all()
        i7 = int(np.searchsorted(uids, 7))
        assert flat[off[i7]:off[i7 + 1]].tolist() == [3, 4, 5]
        # size() counts distinct keys, not pushes
        assert sum(ray.get([s.size.remote() for s in store.shards])) == 2
    finally:
        store.shutdown()


@pytest.mark.parametrize("bucket_cols", [["bucket"], ["band_id", "band_val"]])
def test_pairs_distributed_equals_per_bucket_reference(bucket_cols):
    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({"doc_id": rng.integers(0, 900, size=n)})
    for c in bucket_cols:
        df[c] = rng.integers(-5, 60, size=n).astype(np.int64)
    # reference: per-bucket distinct unordered pairs, pandas groupby
    ref = set()
    for _, g in df.groupby(bucket_cols):
        ids = np.unique(g["doc_id"].to_numpy())
        ia, ib = np.triu_indices(len(ids), k=1)
        ref.update(zip(ids[ia].tolist(), ids[ib].tolist()))
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = distinct_pairs(
        _pairs_distributed(ds, "doc_id", bucket_cols=bucket_cols,
                           num_parts=7)).to_pandas()
    got_set = set(zip(got["id_a"].tolist(), got["id_b"].tolist()))
    assert got_set == ref
    # distinct_pairs output must carry no duplicates
    assert len(got) == len(got_set)
