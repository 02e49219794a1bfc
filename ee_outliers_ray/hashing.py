"""Vectorized 64-bit hash kernels shared by the dedup / fingerprint /
join-bucketing stages.

All kernels operate on whole Arrow arrays with numpy — no per-row or
per-token Python in any hot path.  The string hash is a polynomial
rolling hash over the raw utf8 buffer (one multiply+add per byte, all
bytes of the batch processed in one vector op) followed by a splitmix64
finalizer; k-gram (shingle) and sequence hashes are built by combining
per-token hashes, never re-touching the character data.

Determinism: pure integer arithmetic mod 2^64 (numpy uint64 wraparound),
no PYTHONHASHSEED dependence — stable across processes and nodes, which
the partitioned joins and LSH band buckets rely on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_R = np.uint64(1099511628211)          # byte-level polynomial base (FNV prime)
_C = np.uint64(0x9E3779B97F4A7C15)     # token/shingle combine base (golden ratio)

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_S30, _S27, _S31 = np.uint64(30), np.uint64(27), np.uint64(31)

# numpy warns on uint64 overflow in some scalar paths; array wraparound is
# well-defined and intended here
_ERR = np.errstate(over="ignore")


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized)."""
    with _ERR:
        x = x.astype(np.uint64, copy=True)
        x ^= x >> _S30
        x *= _M1
        x ^= x >> _S27
        x *= _M2
        x ^= x >> _S31
    return x


def _pow_table(base: np.uint64, n: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(n-1)] mod 2^64."""
    if n <= 0:
        return np.ones(1, dtype=np.uint64)
    with _ERR:
        t = np.empty(n, dtype=np.uint64)
        t[0] = 1
        if n > 1:
            t[1:] = base
            np.cumprod(t, out=t)
            t[0] = 1
    return t


def string_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat utf8 bytes, int64 offsets) of a string/large_string array,
    zero-copy from the Arrow buffers."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off_buf = arr.buffers()[1]
    all_off = np.frombuffer(off_buf, dtype=off_dtype)
    offsets = all_off[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data_buf = arr.buffers()[2]
    if data_buf is None or len(offsets) < 2:
        return np.zeros(0, dtype=np.uint8), np.zeros(len(arr) + 1, dtype=np.int64)
    data = np.frombuffer(data_buf, dtype=np.uint8)[offsets[0]:offsets[-1]]
    return data, offsets - offsets[0]


# hash_bytes_segments picks the column-wise Horner path when the longest
# segment is at most this many bytes (covers tokenizer tokens and
# substring windows); longer segments fall back to the gather+reduceat
# path.  Both paths compute the identical polynomial mod 2^64 — the
# hypothesis property pins and the forced-path equality test hold across
# the cutoff, so moving it is safe (unlike the codec kernel cutoffs).
_HORNER_MAX_LEN = 64


def _hash_bytes_segments_reduceat(data: np.ndarray, offsets: np.ndarray,
                                  lens: np.ndarray) -> np.ndarray:
    """Gather+reduceat evaluation (one power-table gather per byte)."""
    n = len(offsets) - 1
    powers = _pow_table(_R, int(lens.max()))
    pos = np.arange(len(data), dtype=np.int64) - np.repeat(offsets[:-1], lens)
    exp = np.repeat(lens - 1, lens) - pos
    with _ERR:
        terms = data.astype(np.uint64) * powers[exp]
        sums = np.add.reduceat(np.concatenate([terms, np.zeros(1, np.uint64)]),
                               offsets[:-1])[:n]
    sums[lens == 0] = 0  # reduceat quirk on empty segments
    return sums


def _hash_bytes_segments_horner(data: np.ndarray, offsets: np.ndarray,
                                lens: np.ndarray) -> np.ndarray:
    """Column-wise Horner evaluation: segments sorted by length
    descending, then one ``acc = acc*R + byte_j`` vector step per byte
    position over the (shrinking) active prefix.  Identical polynomial
    mod 2^64; ~3 full-array passes fewer than the gather+reduceat path
    (no arange/repeat/exp intermediates), measured 2-3x faster on
    token-length segments."""
    n = len(offsets) - 1
    order = np.argsort(lens, kind="stable")[::-1]
    starts = offsets[:-1][order]
    slens = lens[order]
    maxlen = int(slens[0])
    # active prefix per position j: segments with len > j
    kj = np.searchsorted(-slens, -np.arange(1, maxlen + 1), side="right")
    acc = np.zeros(n, dtype=np.uint64)
    with _ERR:
        for j in range(maxlen):
            k = int(kj[j])
            if k == 0:
                break
            a = acc[:k]
            a *= _R
            a += data[starts[:k] + j]
    out = np.empty(n, dtype=np.uint64)
    out[order] = acc
    return out


def hash_bytes_segments(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """One 64-bit hash per segment of ``data`` delimited by ``offsets``:
    h_i = mix64( len_i ^ sum_j data[j] * R^(end_i-1-j) ).  Fully
    vectorized; short segments (<= _HORNER_MAX_LEN bytes) take the
    column-wise Horner path, long ones the power-gather + reduceat
    path — bit-identical by construction and by forced-path test."""
    n = len(offsets) - 1
    lens = offsets[1:] - offsets[:-1]
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if len(data) == 0:
        return mix64(lens.astype(np.uint64))
    if int(lens.max()) <= _HORNER_MAX_LEN:
        sums = _hash_bytes_segments_horner(data, offsets, lens)
    else:
        sums = _hash_bytes_segments_reduceat(data, offsets, lens)
    return mix64(sums ^ lens.astype(np.uint64))


def hash_string_array(arr: pa.Array) -> np.ndarray:
    """Vectorized 64-bit hash of every string in an Arrow string array."""
    data, offsets = string_bytes(arr)
    return hash_bytes_segments(data, offsets)


def combine_sequences(hashes: np.ndarray, offsets: np.ndarray,
                      weight_by_position: bool = True) -> np.ndarray:
    """Order-sensitive combine of per-token hashes into one hash per
    segment: h = mix64( m ^ sum_j tok_j * C^(m-1-j) ).  Used for document
    fingerprints and LSH band hashes."""
    n = len(offsets) - 1
    lens = offsets[1:] - offsets[:-1]
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if len(hashes) == 0:
        return mix64(lens.astype(np.uint64))
    with _ERR:
        if weight_by_position:
            powers = _pow_table(_C, int(lens.max()))
            pos = np.arange(len(hashes), dtype=np.int64) - \
                np.repeat(offsets[:-1], lens)
            exp = np.repeat(lens - 1, lens) - pos
            terms = hashes * powers[exp]
        else:
            terms = hashes
        sums = np.add.reduceat(np.concatenate([terms, np.zeros(1, np.uint64)]),
                               offsets[:-1])[:n]
    sums[lens == 0] = 0
    return mix64(sums ^ lens.astype(np.uint64))


def _grouped_arange(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate arange(starts[i], starts[i]+counts[i]) — vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    out_off = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=out_off[1:])
    return (np.arange(total, dtype=np.int64)
            - np.repeat(out_off[:-1], counts)
            + np.repeat(starts, counts))


def shingle_hashes(tok_hashes: np.ndarray, offsets: np.ndarray, k: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Per-document k-gram shingle hashes from per-token hashes.

    Documents with 0 < m < k tokens yield ONE shingle covering all m
    tokens (mirrors set-of-tuples shingling); empty documents yield none.
    Returns (flat shingle hashes, int64 offsets per document)."""
    ndoc = len(offsets) - 1
    lens = offsets[1:] - offsets[:-1]
    n = len(tok_hashes)
    out_counts = np.where(lens == 0, 0, np.maximum(lens - k + 1, 1))
    out_offsets = np.zeros(ndoc + 1, dtype=np.int64)
    np.cumsum(out_counts, out=out_offsets[1:])
    total = int(out_offsets[-1])
    out = np.empty(total, dtype=np.uint64)
    if total == 0:
        return out, out_offsets

    # full-width combine at every flat position: s_i = sum_{j<k} t[i+j]*C^j
    with _ERR:
        s = np.zeros(n, dtype=np.uint64)
        cj = np.uint64(1)
        for j in range(k):
            if j < n:
                s[:n - j] += tok_hashes[j:] * cj
            cj = cj * _C

    full = lens >= k
    src = _grouped_arange(offsets[:-1][full],
                          np.maximum(lens[full] - k + 1, 0))
    dst = _grouped_arange(out_offsets[:-1][full],
                          np.maximum(lens[full] - k + 1, 0))
    out[dst] = mix64(s[src])

    short = (lens > 0) & (lens < k)
    if short.any():
        sh_out = combine_sequences(
            tok_hashes[_grouped_arange(offsets[:-1][short], lens[short])],
            np.concatenate([[0], np.cumsum(lens[short])]).astype(np.int64),
            weight_by_position=True)
        out[out_offsets[:-1][short]] = sh_out
    else:
        # keep full-doc shingles distinguishable from k-gram ones: nothing
        # to do — positions already filled above
        pass
    return out, out_offsets


def unique_per_segment(values: np.ndarray, offsets: np.ndarray
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Sorted-unique values per segment, vectorized (one lexsort over the
    batch).  Returns (flat uniques, new offsets)."""
    ndoc = len(offsets) - 1
    lens = offsets[1:] - offsets[:-1]
    if len(values) == 0:
        return values, offsets.copy()
    seg = np.repeat(np.arange(ndoc, dtype=np.int64), lens)
    order = np.lexsort((values, seg))
    sv, ss = values[order], seg[order]
    keep = np.empty(len(sv), dtype=bool)
    keep[0] = True
    keep[1:] = (sv[1:] != sv[:-1]) | (ss[1:] != ss[:-1])
    uv, us = sv[keep], ss[keep]
    counts = np.bincount(us, minlength=ndoc).astype(np.int64)
    new_off = np.zeros(ndoc + 1, dtype=np.int64)
    np.cumsum(counts, out=new_off[1:])
    return uv, new_off


_MERSENNE = (1 << 61) - 1


def minhash_signatures(sh: np.ndarray, offsets: np.ndarray,
                       a: np.ndarray, b: np.ndarray,
                       perm_chunk: int = 8) -> np.ndarray:
    """(ndoc, num_perm) MinHash signature matrix from flat shingle hashes:
    sig[d, p] = min over doc-d shingles of ((a_p * h + b_p) mod 2^61-1),
    computed as a chunked outer product + per-segment minimum (reduceat).
    Empty documents get the sentinel max (2^61-1)."""
    ndoc = len(offsets) - 1
    nperm = len(a)
    M = np.uint64(_MERSENNE)
    sig = np.full((ndoc, nperm), M, dtype=np.uint64)
    if len(sh) == 0 or ndoc == 0:
        return sig
    empty = offsets[:-1] == offsets[1:]
    with _ERR:
        for c0 in range(0, nperm, perm_chunk):
            ac = a[c0:c0 + perm_chunk][:, None]
            bc = b[c0:c0 + perm_chunk][:, None]
            vals = (ac * sh[None, :] + bc) % M
            # sentinel column guards reduceat indices == len(sh)
            vals = np.concatenate(
                [vals, np.full((vals.shape[0], 1), M, np.uint64)], axis=1)
            mins = np.minimum.reduceat(vals, offsets[:-1], axis=1)
            mins[:, empty] = M
            sig[:, c0:c0 + perm_chunk] = mins.T
    return sig


def simhash_from_tokens(tok_hashes: np.ndarray, offsets: np.ndarray,
                        bit_chunk: int = 16) -> np.ndarray:
    """64-bit SimHash per document from per-token hashes: bit b of the
    output is set when more than half the tokens have bit b set.  Chunked
    bit expansion keeps peak memory at len(tokens) x bit_chunk bytes."""
    ndoc = len(offsets) - 1
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    out = np.zeros(ndoc, dtype=np.uint64)
    if len(tok_hashes) == 0 or ndoc == 0:
        return out
    empty = lens == 0
    with _ERR:
        for b0 in range(0, 64, bit_chunk):
            shifts = np.arange(b0, min(b0 + bit_chunk, 64), dtype=np.uint64)
            bits = ((tok_hashes[:, None] >> shifts[None, :])
                    & np.uint64(1)).astype(np.int32)
            cnt = np.add.reduceat(
                np.concatenate([bits, np.zeros((1, len(shifts)), np.int32)]),
                offsets[:-1], axis=0)[:ndoc]
            cnt[empty] = 0
            # majority: acc = 2*cnt - m > 0
            maj = (2 * cnt) > lens[:, None]
            maj[empty] = False
            out |= (maj.astype(np.uint64)
                    << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return out


def hash_any_array(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """64-bit hash of an arbitrary Arrow array: integers are mixed
    directly, everything else is cast to string and poly-hashed.  Used
    for deterministic join bucketing."""
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_integer(t):
        if arr.null_count:
            # to_numpy would yield float64 + NaN, and NaN->int64 is
            # platform-undefined; pin nulls to a fixed bucket key instead
            arr = pc.fill_null(arr, 0)
        v = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        return mix64(v.view(np.uint64))
    s = pc.cast(arr, pa.string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    return hash_string_array(s)


# modular inverse of _R mod 2^64 (_R is odd, so it exists); lets the
# rolling window hash be computed as a prefix-sum difference in O(N)
# independent of the window length
_RINV = np.uint64(pow(1099511628211, -1, 1 << 64))


def window_hashes(data: np.ndarray, offsets: np.ndarray, L: int
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rolling 64-bit hash of EVERY length-``L`` byte window of every
    segment, O(N) total regardless of L (Rabin-Karp prefix-difference
    over 2^64: q_k = sum_{j<k} d_j * Rinv^j, window sum at start s is
    (q_{s+L} - q_s) * R^{L-1+s}).

    Each value is BIT-IDENTICAL to ``hash_bytes_segments(data[s:s+L],
    [0, L])`` — the window hash of a gram equals the whole-string hash
    of the same bytes, so candidate hashes compare across any producer
    (property-pinned in tests/test_substring_dups.py).

    Returns ``(seg_idx, pos, hashes)``: segment index, 0-based byte
    offset of the window START within its segment, and the hash, in
    (segment, pos) order.  Segments shorter than L yield no windows;
    windows never cross a segment boundary."""
    n = len(offsets) - 1
    lens = offsets[1:] - offsets[:-1]
    counts = np.maximum(lens - L + 1, 0)
    total = int(counts.sum())
    seg_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    pos = _grouped_arange(np.zeros(n, dtype=np.int64), counts)
    if total == 0:
        return seg_idx, pos, np.zeros(0, dtype=np.uint64)
    starts = pos + offsets[:-1][seg_idx]
    N = len(data)
    with _ERR:
        rinv = _pow_table(_RINV, N)
        q = np.zeros(N + 1, dtype=np.uint64)
        np.cumsum(data.astype(np.uint64) * rinv, out=q[1:])
        rpow = _pow_table(_R, N + L)
        sums = (q[starts + L] - q[starts]) * rpow[starts + L - 1]
    return seg_idx, pos, mix64(sums ^ np.uint64(L))


def winnow_mask(hashes: np.ndarray, seg_idx: np.ndarray, w: int
                ) -> np.ndarray:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, MOSS):
    boolean mask over per-position window hashes keeping, for every run
    of ``w`` consecutive positions inside one segment, the RIGHTMOST
    minimal hash.  Guarantee: two segments sharing a substring of length
    >= L + w - 1 both select at least one fingerprint with the same hash
    (their shared run of w consecutive equal window-hashes selects the
    same minimal VALUE in both).  w=1 selects everything.

    ``hashes``/``seg_idx`` are the flat (segment, pos)-ordered outputs of
    :func:`window_hashes`."""
    n = len(hashes)
    mask = np.zeros(n, dtype=bool)
    if n == 0:
        return mask
    if w <= 1:
        mask[:] = True
        return mask
    # segments with fewer than w positions keep their single minimum
    # (rightmost on ties), same rule as a truncated final window
    seg_start = np.concatenate(
        [[0], np.flatnonzero(seg_idx[1:] != seg_idx[:-1]) + 1])
    seg_end = np.concatenate([seg_start[1:], [n]])
    from numpy.lib.stride_tricks import sliding_window_view

    if n >= w:
        # rightmost argmin = (w-1) - argmin over the reversed window
        win = sliding_window_view(hashes, w)[:, ::-1]
        sel = (np.arange(n - w + 1, dtype=np.int64)
               + (w - 1) - win.argmin(axis=1))
        # keep only windows fully inside one segment
        ok = seg_idx[: n - w + 1] == seg_idx[w - 1:]
        mask[np.unique(sel[ok])] = True
    short = (seg_end - seg_start) < w
    if short.any():
        posn = np.arange(n, dtype=np.int64)
        run = np.searchsorted(seg_start, posn, side="right") - 1
        sp = np.flatnonzero(short[run])
        order = np.lexsort((-posn[sp], hashes[sp], run[sp]))
        r_ord = run[sp][order]
        first = np.empty(len(order), dtype=bool)
        first[0] = True
        first[1:] = r_ord[1:] != r_ord[:-1]
        mask[sp[order][first]] = True
    return mask


_CRC_TABLE: np.ndarray | None = None


def _crc32_table() -> np.ndarray:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        t = np.arange(256, dtype=np.uint32)
        for _ in range(8):
            t = np.where(t & 1, np.uint32(0xEDB88320) ^ (t >> 1),
                         t >> 1).astype(np.uint32)
        _CRC_TABLE = t
    return _CRC_TABLE


def crc32_segments(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """``zlib.crc32`` of each byte segment, vectorized ACROSS segments:
    one table-lookup pass per byte position over the still-active rows
    (bit-identical to zlib.crc32 — property-pinned).  Replaces the last
    per-term Python loop in the SPIMI build hot path (term -> segment
    bucket assignment), so the on-disk bucket layout is unchanged."""
    table = _crc32_table()
    n = len(offsets) - 1
    starts = offsets[:-1].astype(np.int64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    if n == 0:
        return crc ^ np.uint32(0xFFFFFFFF)
    for j in range(int(lens.max())):
        act = np.flatnonzero(lens > j)
        b = data[starts[act] + j].astype(np.uint32)
        c = crc[act]
        crc[act] = (c >> np.uint32(8)) ^ table[(c ^ b) & np.uint32(0xFF)]
    return crc ^ np.uint32(0xFFFFFFFF)
