import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ee_outliers_ray.index.codec import (
    EncodedRun,
    concat_runs,
    decode_block,
    decode_run,
    encode_postings,
)


def _mk(n, rng, max_doc=10**9):
    doc_ids = np.sort(rng.choice(max_doc, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 500, size=n).astype(np.int64)
    dls = rng.integers(1, 5000, size=n).astype(np.int64)
    return doc_ids, tfs, dls


def test_roundtrip_small():
    doc_ids = np.array([0, 1, 5, 1000, 10**12], dtype=np.int64)
    tfs = np.array([1, 2, 3, 1, 7], dtype=np.int64)
    dls = np.array([10, 20, 30, 40, 50], dtype=np.int64)
    run = encode_postings(doc_ids, tfs, dls)
    d, t = decode_run(run)
    np.testing.assert_array_equal(d, doc_ids)
    np.testing.assert_array_equal(t, tfs)


def test_roundtrip_multi_block():
    rng = np.random.default_rng(7)
    doc_ids, tfs, dls = _mk(1000, rng)
    run = encode_postings(doc_ids, tfs, dls, block_size=128)
    assert len(run.block_len) == 8
    d, t = decode_run(run)
    np.testing.assert_array_equal(d, doc_ids)
    np.testing.assert_array_equal(t, tfs)
    # block metadata
    np.testing.assert_array_equal(run.block_last_doc[-1:], doc_ids[-1:])
    assert run.block_max_tf[0] == tfs[:128].max()
    assert run.block_min_dl[0] == dls[:128].min()


def test_single_posting():
    run = encode_postings(np.array([42]), np.array([1]), np.array([7]))
    d, t = decode_run(run)
    assert list(d) == [42] and list(t) == [1]


def test_decode_single_block():
    rng = np.random.default_rng(3)
    doc_ids, tfs, dls = _mk(300, rng)
    run = encode_postings(doc_ids, tfs, dls, block_size=128)
    d, t = decode_block(run.payload, int(run.block_offset[1]),
                        int(run.block_len[1]), int(run.block_first_doc[1]))
    np.testing.assert_array_equal(d, doc_ids[128:256])
    np.testing.assert_array_equal(t, tfs[128:256])


def test_concat_runs_equals_single_encode():
    rng = np.random.default_rng(11)
    doc_ids, tfs, dls = _mk(700, rng)
    # split into doc-range-contiguous runs
    cut1, cut2 = 250, 600
    runs = [
        encode_postings(doc_ids[:cut1], tfs[:cut1], dls[:cut1]),
        encode_postings(doc_ids[cut1:cut2], tfs[cut1:cut2], dls[cut1:cut2]),
        encode_postings(doc_ids[cut2:], tfs[cut2:], dls[cut2:]),
    ]
    merged = concat_runs(runs)
    d, t = decode_run(merged)
    np.testing.assert_array_equal(d, doc_ids)
    np.testing.assert_array_equal(t, tfs)
    assert merged.n_postings == 700


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 400), st.integers(0, 2**31))
def test_roundtrip_property(n, seed):
    rng = np.random.default_rng(seed)
    doc_ids, tfs, dls = _mk(n, rng)
    run = encode_postings(doc_ids, tfs, dls)
    d, t = decode_run(run)
    np.testing.assert_array_equal(d, doc_ids)
    np.testing.assert_array_equal(t, tfs)


def test_run_members_and_intersection_fuzz():
    """Block-skip membership (_run_members) over synthetic encoded runs
    == plain np.isin, across random posting lists that straddle many
    blocks (the search_and cursor-intersection kernel, minus the
    reader)."""
    from ee_outliers_ray.index.codec import encode_postings
    from ee_outliers_ray.query.engine import _run_members

    rng = np.random.default_rng(41)
    for trial in range(30):
        n = int(rng.integers(1, 2000))
        docs = np.unique(rng.integers(0, 10_000, size=n)).astype(np.int64)
        tfs = rng.integers(1, 5, size=len(docs)).astype(np.int64)
        dls = rng.integers(5, 50, size=len(docs)).astype(np.int64)
        run = encode_postings(docs, tfs, dls)
        m = int(rng.integers(0, 500))
        cand = np.unique(rng.integers(0, 10_000, size=m)).astype(np.int64)
        got = _run_members(run, cand)
        want = np.isin(cand, docs)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 63), st.integers(1, 500), st.integers(0, 2**31))
def test_pack_unpack_width_sweep(width, n, seed):
    """Kernel-level pin across EVERY width, straddling both internal
    cutoffs (word-lane pack for widths 4-57, strided-gather unpack for
    widths <= 57, bit-matrix fallbacks outside) — the two sides must
    stay a bijection at every width, not just the ones real postings
    produce."""
    from ee_outliers_ray.index.codec import _pack_bits, _unpack_bits

    rng = np.random.default_rng(seed)
    hi = (1 << width) - 1
    vals = rng.integers(0, hi, size=n, endpoint=True).astype(np.uint64)
    packed = np.frombuffer(_pack_bits(vals, width), dtype=np.uint8)
    assert len(packed) == (n * width + 7) // 8
    got = _unpack_bits(packed, n, width)
    np.testing.assert_array_equal(got, vals)


def test_roundtrip_extreme_deltas():
    """Doc gaps wider than 57 bits force the bit-matrix fallbacks on
    both sides (pack >57, unpack >57, decode_run per-block fallback) —
    unreachable by realistic corpora, so pin it directly."""
    doc_ids = np.array([0, 1, (1 << 60) + 5, (1 << 62) + 9], dtype=np.int64)
    tfs = np.array([1, 7, 2, (1 << 58) + 3], dtype=np.int64)
    dls = np.array([10, 20, 30, 40], dtype=np.int64)
    run = encode_postings(doc_ids, tfs, dls)
    d, t = decode_run(run)
    np.testing.assert_array_equal(d, doc_ids)
    np.testing.assert_array_equal(t, tfs)
    # multi-block form exercises decode_run's per-block >57-bit fallback
    run2 = encode_postings(doc_ids, tfs, dls, block_size=2)
    assert len(run2.block_len) == 2
    d2, t2 = decode_run(run2)
    np.testing.assert_array_equal(d2, doc_ids)
    np.testing.assert_array_equal(t2, tfs)


def test_write_segment_table_row_groups(tmp_path):
    """Size-aware segment writer: row groups respect the byte/row caps,
    terms stay in order, and the reassembled table is byte-identical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(5)
    n = 40
    payloads = [rng.integers(0, 256, size=int(sz)).astype(np.uint8).tobytes()
                for sz in rng.integers(10, 5000, size=n)]
    t = pa.table({"term": [f"t{i:04d}" for i in range(n)],
                  "payload": pa.array(payloads, type=pa.binary())})
    from ee_outliers_ray.index.build import write_segment_table

    path = str(tmp_path / "seg.parquet")
    write_segment_table(t, path, target_bytes=8000, max_rows=7)
    pf = pq.ParquetFile(path)
    assert pf.metadata.num_row_groups > 1
    total = 0
    for gi in range(pf.metadata.num_row_groups):
        g = pf.read_row_group(gi)
        assert g.num_rows <= 7
        gbytes = sum(len(p) for p in g["payload"].to_pylist())
        assert gbytes <= 8000 or g.num_rows == 1  # single huge row allowed
        total += g.num_rows
    assert total == n
    back = pq.read_table(path)
    assert back.equals(t)
    # predicate pushdown finds single terms
    one = pq.read_table(path, filters=[("term", "=", "t0031")])
    assert one.num_rows == 1 and one["payload"][0].as_py() == payloads[31]
