"""Property tests: the vectorized hashing kernels equal their per-item
pure-Python definitions on arbitrary inputs."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ee_outliers_ray.hashing import (
    _C,
    _R,
    combine_sequences,
    hash_string_array,
    minhash_signatures,
    mix64,
    shingle_hashes,
    simhash_from_tokens,
    unique_per_segment,
)

M64 = (1 << 64) - 1


def ref_mix64(x: int) -> int:
    x &= M64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & M64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & M64
    x ^= x >> 31
    return x


def ref_hash_string(s: str) -> int:
    data = s.encode("utf-8")
    h = 0
    for j, c in enumerate(data):
        h = (h + c * pow(int(_R), len(data) - 1 - j, 1 << 64)) & M64
    return ref_mix64(h ^ len(data))


tokens_st = st.lists(st.text(min_size=0, max_size=12), min_size=0,
                     max_size=40)
docs_st = st.lists(tokens_st, min_size=0, max_size=8)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=20), max_size=50))
def test_hash_string_array_matches_reference(strings):
    got = hash_string_array(pa.array(strings, type=pa.string()))
    want = [ref_hash_string(s) for s in strings]
    assert [int(x) for x in got] == want


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=90), min_size=1,
                max_size=60))
def test_hash_bytes_segments_paths_bit_identical(segs):
    """The column-wise Horner path and the gather+reduceat path compute
    the identical polynomial mod 2^64 for ANY segment lengths — the
    _HORNER_MAX_LEN cutoff (exercised both ways by max_size=90) must
    never observably matter."""
    from ee_outliers_ray import hashing as H

    data = np.frombuffer(b"".join(segs), dtype=np.uint8)
    off = np.zeros(len(segs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in segs], out=off[1:])
    lens = off[1:] - off[:-1]
    if len(data) == 0:
        return
    a = H._hash_bytes_segments_horner(data, off, lens)
    b = H._hash_bytes_segments_reduceat(data, off, lens)
    assert (a == b).all()
    # and the public kernel equals the strings reference regardless of
    # which side of the cutoff it picked
    full = H.hash_bytes_segments(data, off)
    want = H.mix64(b ^ lens.astype(np.uint64))
    assert (full == want).all()


@settings(max_examples=40, deadline=None)
@given(docs_st, st.integers(min_value=1, max_value=5))
def test_shingle_counts_and_values(docs, k):
    flat = [t for d in docs for t in d]
    offsets = np.cumsum([0] + [len(d) for d in docs]).astype(np.int64)
    th = hash_string_array(pa.array(flat, type=pa.string()))
    sh, sh_off = shingle_hashes(th, offsets, k)
    for i, d in enumerate(docs):
        n = sh_off[i + 1] - sh_off[i]
        want = 0 if len(d) == 0 else max(len(d) - k + 1, 1)
        assert n == want
    # k-gram equality: identical token windows hash identically
    for i, d in enumerate(docs):
        if len(d) >= k:
            window_hash = {}
            vals = sh[sh_off[i]:sh_off[i + 1]]
            for j in range(len(d) - k + 1):
                key = tuple(d[j:j + k])
                if key in window_hash:
                    assert window_hash[key] == vals[j]
                window_hash[key] = vals[j]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=M64),
                         max_size=20), max_size=6))
def test_unique_per_segment_matches_numpy(segs):
    flat = np.array([v for s in segs for v in s], dtype=np.uint64)
    offsets = np.cumsum([0] + [len(s) for s in segs]).astype(np.int64)
    uv, uo = unique_per_segment(flat, offsets)
    for i, s in enumerate(segs):
        got = uv[uo[i]:uo[i + 1]]
        want = np.unique(np.array(s, dtype=np.uint64))
        assert (got == want).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=M64),
                         max_size=15), min_size=1, max_size=5),
       st.integers(min_value=1, max_value=8))
def test_minhash_signatures_match_reference(segs, nperm):
    M = np.uint64((1 << 61) - 1)
    rng = np.random.default_rng(1)
    a = rng.integers(1, int(M), size=nperm, dtype=np.uint64)
    b = rng.integers(0, int(M), size=nperm, dtype=np.uint64)
    flat = np.array([v for s in segs for v in s], dtype=np.uint64)
    offsets = np.cumsum([0] + [len(s) for s in segs]).astype(np.int64)
    sig = minhash_signatures(flat, offsets, a, b, perm_chunk=3)
    for i, s in enumerate(segs):
        for p in range(nperm):
            if not s:
                assert sig[i, p] == M
            else:
                with np.errstate(over="ignore"):
                    vals = (a[p] * np.array(s, dtype=np.uint64) + b[p]) % M
                assert sig[i, p] == vals.min()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=M64),
                         max_size=30), max_size=5))
def test_simhash_matches_reference(segs):
    flat = np.array([v for s in segs for v in s], dtype=np.uint64)
    offsets = np.cumsum([0] + [len(s) for s in segs]).astype(np.int64)
    got = simhash_from_tokens(flat, offsets, bit_chunk=7)
    for i, s in enumerate(segs):
        if not s:
            assert got[i] == 0
            continue
        want = 0
        for bit in range(64):
            cnt = sum((v >> bit) & 1 for v in s)
            if 2 * cnt > len(s):
                want |= 1 << bit
        assert int(got[i]) == want


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=M64),
                         max_size=12), max_size=5))
def test_combine_sequences_matches_reference(segs):
    flat = np.array([v for s in segs for v in s], dtype=np.uint64)
    offsets = np.cumsum([0] + [len(s) for s in segs]).astype(np.int64)
    got = combine_sequences(flat, offsets)
    for i, s in enumerate(segs):
        acc = 0
        m = len(s)
        for j, v in enumerate(s):
            acc = (acc + v * pow(int(_C), m - 1 - j, 1 << 64)) & M64
        assert int(got[i]) == ref_mix64(acc ^ m)


def test_mix64_reference():
    xs = np.array([0, 1, 2, 12345, M64], dtype=np.uint64)
    got = mix64(xs)
    assert [int(g) for g in got] == [ref_mix64(int(x)) for x in xs]


def test_hash_any_array_integer_nulls_deterministic():
    """Null-carrying integer key columns must bucket deterministically
    (nulls pinned to the hash of 0), not via NaN->int64 UB (ADVICE r2)."""
    import pyarrow as pa

    from ee_outliers_ray.hashing import hash_any_array

    with_nulls = pa.array([1, None, 3, None], type=pa.int64())
    h = hash_any_array(with_nulls)
    h2 = hash_any_array(pa.array([1, 0, 3, 0], type=pa.int64()))
    assert (h == h2).all()
    assert h.dtype == np.uint64


@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=0, max_codepoint=0x2FF),
    max_size=24), max_size=40))
@settings(max_examples=120, deadline=None)
def test_crc32_segments_equals_zlib(strings):
    import zlib

    from ee_outliers_ray.hashing import crc32_segments, string_bytes

    arr = pa.array(strings, type=pa.string())
    data, offsets = string_bytes(arr)
    got = crc32_segments(data, offsets)
    want = np.array([zlib.crc32(s.encode()) for s in strings],
                    dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_term_bucket_of_arrow_equals_python():
    from ee_outliers_ray.index.build import term_bucket_of, term_bucket_of_arrow

    terms = ["the", "data", "w0042", "", "a" * 30, "z9", "merge", "spark"]
    arr = pa.array(terms, type=pa.string())
    np.testing.assert_array_equal(
        term_bucket_of_arrow(arr, 32),
        term_bucket_of(np.asarray(terms, dtype=object), 32))
