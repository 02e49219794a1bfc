"""Exact substring-duplicate spans: kernel property pins (rolling
window hash == whole-string hash of the same bytes; winnowing vs a
brute-force reference + the Schleimer detection guarantee) and the
operator pinned to EXHAUSTIVE pure-Python truth on a planted corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from ee_outliers_ray.dedup import _substring_hits, substring_dup_spans
from ee_outliers_ray.hashing import (
    hash_bytes_segments,
    window_hashes,
    winnow_mask,
)

segments = st.lists(st.binary(min_size=0, max_size=50), min_size=0,
                    max_size=12)


def _flat(texts):
    data = (np.frombuffer(b"".join(texts), dtype=np.uint8)
            if texts else np.zeros(0, np.uint8))
    off = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in texts], out=off[1:])
    return data, off


@settings(max_examples=60, deadline=None)
@given(segments, st.integers(min_value=1, max_value=12))
def test_window_hashes_match_whole_string_hash(texts, L):
    data, off = _flat(texts)
    seg, pos, h = window_hashes(data, off, L)
    exp_seg, exp_pos, exp_h = [], [], []
    for k, t in enumerate(texts):
        for i in range(len(t) - L + 1):
            exp_seg.append(k)
            exp_pos.append(i)
            w = np.frombuffer(t[i:i + L], dtype=np.uint8)
            exp_h.append(hash_bytes_segments(
                w, np.array([0, L], dtype=np.int64))[0])
    assert seg.tolist() == exp_seg
    assert pos.tolist() == exp_pos
    assert h.tolist() == exp_h


def _winnow_ref(h, seg, w):
    """Brute-force rightmost-min-per-window reference."""
    ref = np.zeros(len(h), dtype=bool)
    for s in np.unique(seg):
        idx = np.flatnonzero(seg == s)
        hs = h[idx]
        m = len(hs)
        if m < w:
            ref[idx[m - 1 - int(hs[::-1].argmin())]] = True
            continue
        for j in range(m - w + 1):
            win = hs[j:j + w]
            ref[idx[j + (w - 1 - int(win[::-1].argmin()))]] = True
    return ref


@settings(max_examples=40, deadline=None)
@given(segments, st.integers(min_value=1, max_value=6),
       st.integers(min_value=1, max_value=5))
def test_winnow_mask_matches_reference(texts, L, w):
    data, off = _flat(texts)
    seg, _pos, h = window_hashes(data, off, L)
    assert (winnow_mask(h, seg, w) == _winnow_ref(h, seg, w)).all()


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=40), st.binary(min_size=0, max_size=40),
       st.integers(min_value=2, max_value=6), st.data())
def test_winnow_shared_substring_guarantee(pre_a, pre_b, w, data_st):
    """Two docs sharing a substring of length >= L + w - 1 both select a
    fingerprint with the same hash (the winnowing guarantee)."""
    L = 8
    shared = bytes(data_st.draw(
        st.binary(min_size=L + w - 1, max_size=L + w - 1 + 10)))
    a, b = pre_a + shared, shared + pre_b
    data, off = _flat([a, b])
    seg, _pos, h = window_hashes(data, off, L)
    m = winnow_mask(h, seg, w)
    sel_a = set(h[(seg == 0) & m].tolist())
    sel_b = set(h[(seg == 1) & m].tolist())
    assert sel_a & sel_b


def _truth_hits(docs, L):
    """Exhaustive (doc_id, pos) windows whose bytes occur in >= 2 docs."""
    from collections import defaultdict

    owner = defaultdict(set)
    for did, t in docs:
        for i in range(len(t) - L + 1):
            owner[t[i:i + L]].add(did)
    hits = set()
    for did, t in docs:
        for i in range(len(t) - L + 1):
            if len(owner[t[i:i + L]]) >= 2:
                hits.add((did, i))
    return hits


def _planted_corpus():
    rng = np.random.default_rng(7)
    boiler = bytes(rng.integers(97, 123, size=60).astype(np.uint8))
    docs = []
    for did in range(40):
        body = bytes(rng.integers(97, 123, size=int(rng.integers(10, 120)))
                     .astype(np.uint8))
        if did % 3 == 0:   # plant shared boilerplate at varying offsets
            cut = int(rng.integers(0, len(body) + 1))
            body = body[:cut] + boiler + body[cut:]
        docs.append((did, body))
    return docs


@pytest.fixture(scope="module")
def planted_ds():
    docs = _planted_corpus()
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t.decode() for _, t in docs])})
    return docs, ray.data.from_arrow(tbl)


def test_substring_hits_exhaustive_truth(planted_ds):
    docs, ds = planted_ds
    L = 20
    got = _substring_hits(ds, L=L).to_pandas()
    got_set = set(zip(got["doc_id"].astype(int), got["pos"].astype(int)))
    assert got_set == _truth_hits(docs, L)


def test_substring_dup_spans_exhaustive_truth(planted_ds):
    docs, ds = planted_ds
    L = 20
    truth = _truth_hits(docs, L)
    rows = {}
    for did, pos in truth:
        rows.setdefault(did, []).append(pos)
    exp = []
    for did in sorted(rows):
        p = np.sort(np.array(rows[did]))
        cover = int(np.minimum(np.diff(p), L).sum()) + L
        exp.append((did, len(p), cover))
    got = substring_dup_spans(ds, L=L).to_pandas()
    assert [tuple(r) for r in got.astype(int).itertuples(index=False)] == exp


def test_substring_winnowed_exact_and_guaranteed(planted_ds):
    """Winnowed fingerprints: zero false positives (every reported hit is
    a true cross-doc window) and every doc sharing the planted >=L+w-1
    boilerplate is detected."""
    docs, ds = planted_ds
    L, w = 20, 4
    truth = _truth_hits(docs, L)
    got = _substring_hits(ds, L=L, winnow=w).to_pandas()
    got_set = set(zip(got["doc_id"].astype(int), got["pos"].astype(int)))
    assert got_set <= truth
    planted = {did for did, _ in docs if did % 3 == 0}
    assert planted <= set(got["doc_id"].astype(int))


def test_substring_dups_empty_schema_stable():
    tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["abcdefgh", "zyxwvuts"])})
    df = substring_dup_spans(ray.data.from_arrow(tbl), L=5)
    assert isinstance(df, pd.DataFrame)
    assert list(df.columns) == ["doc_id", "dup_windows", "dup_cover"]
    assert len(df) == 0
    assert df["doc_id"].dtype == np.int64
