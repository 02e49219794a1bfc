"""Deterministic tokenizer / analysis chain, shared build- and query-side.

Reference analogue: ``split_text_by_separator``
(/root/reference/app/helpers/utils.py:522-534) — a regex-split tokenizer.
Ours is the fixed analysis chain of the index engine: lowercase, then
extract maximal ``[a-z0-9]+`` runs.  It is expressed both as a plain-Python
function (query side, golden tests) and as a vectorized pyarrow kernel
(build side, zero-copy over Arrow batches).

Oracle equivalence (used by __ray_entry__.oracle_sql):
    DuckDB  regexp_extract_all(lower(text), '[a-z0-9]+')
yields exactly the same token stream for any input string.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"[a-z0-9]+")
# Split pattern used by the vectorized path: complement of the token class.
_SPLIT_PATTERN = "[^a-z0-9]+"


def tokenize(text: str) -> list[str]:
    """Tokenize one string (query side / tests)."""
    return _TOKEN_RE.findall(text.lower())


# byte-class tables for the ASCII fast path (kept for tests/reference;
# the hot kernel uses SIMD-friendly range compares instead — measured
# ~5x faster than the uint8 table gathers on multi-MB buffers)
_LOWER = np.arange(256, dtype=np.uint8)
_LOWER[65:91] += 32
_IS_TOK = np.zeros(256, dtype=bool)
_IS_TOK[97:123] = True
_IS_TOK[48:58] = True


def _classify_bytes(b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(case-folded bytes, token-byte mask) via arithmetic range
    compares — no table gathers.

    Case folding is ``b | 0x20``: bit 5 maps A-Z onto a-z and leaves
    a-z AND 0-9 unchanged (digits already carry bit 5), so the folded
    buffer equals the lowercased byte at every TOKEN position — the only
    positions ever read (``values = folded[is_tok]``).  Non-token bytes
    may differ from true lowercasing ('@' -> '`'); that is fine and
    saves the separate is_upper mask + add of the previous kernel
    (~3 fewer full-buffer passes; this stage is DRAM-bound).
    The alpha test runs on the FOLDED byte ((t >= 97) & (t <= 122)
    covers upper+lower in one range); the digit test must use the raw
    byte (control bytes 0x10-0x19 fold into the digit range)."""
    t = b | np.uint8(0x20)
    is_tok = (t >= 97) & (t <= 122)
    is_tok |= (b >= 48) & (b <= 57)
    return t, is_tok


def _tokenize_chunk_ascii(chunk: pa.Array,
                          region_mask: np.ndarray | None = None
                          ) -> pa.ListArray | None:
    """Single-pass numpy tokenizer over the raw string buffer.

    Valid only for all-ASCII chunks (the only non-ASCII codepoints that
    lowercase INTO [a-z0-9] are oddities like U+212A KELVIN SIGN, which
    the regex path handles); returns None when a non-ASCII byte is seen
    and the caller falls back.  ~10x cheaper than lower+regex-split: one
    table lookup, one boolean mask, reductions — all memory-speed.

    ``region_mask``: optional per-byte bool (relative to the chunk's
    value range) limiting which bytes may belong to tokens — used by the
    fused html tokenizer to mask everything outside <p>..</p>.
    """
    off_buf = chunk.buffers()[1]
    all_offsets = np.frombuffer(off_buf, dtype=np.int32)
    offsets = all_offsets[chunk.offset: chunk.offset + len(chunk) + 1].astype(np.int64)
    data_buf = chunk.buffers()[2]
    if data_buf is None or len(offsets) < 2:
        b = np.zeros(0, dtype=np.uint8)
        offsets = np.zeros(len(chunk) + 1, dtype=np.int64)
    else:
        b = np.frombuffer(data_buf, dtype=np.uint8)[offsets[0]:offsets[-1]]
    if len(b) and (b > 127).any():
        return None
    base = offsets[0]
    rel_off = offsets - base
    lowered, is_tok = _classify_bytes(b)
    if region_mask is not None:
        is_tok &= region_mask

    prev_not_tok = np.empty(len(b), dtype=bool)
    if len(b):
        prev_not_tok[0] = True
        np.logical_not(is_tok[:-1], out=prev_not_tok[1:])
    starts = is_tok & prev_not_tok
    # force a token break at every document boundary
    doc_bounds = rel_off[1:-1]
    inb = doc_bounds[doc_bounds < len(b)]
    starts[inb] |= is_tok[inb]
    next_not_tok = np.empty(len(b), dtype=bool)
    if len(b):
        next_not_tok[-1] = True
        np.logical_not(is_tok[1:], out=next_not_tok[:-1])
    ends = is_tok & next_not_tok
    inb_pos = inb[inb > 0]
    ends[inb_pos - 1] |= is_tok[inb_pos - 1]

    starts_idx = np.flatnonzero(starts)
    ends_idx = np.flatnonzero(ends)
    # doc-boundary forcing can desync starts/ends pairing only if a run
    # crosses a boundary; both sides were forced, so pairing holds
    lengths = ends_idx - starts_idx + 1
    tok_offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
    tok_offsets[1:] = np.cumsum(lengths)
    values = lowered[is_tok]
    # py_buffer wraps the numpy arrays zero-copy (no .tobytes() copies);
    # Arrow keeps the buffers alive
    flat = pa.StringArray.from_buffers(
        len(lengths),
        pa.py_buffer(tok_offsets),
        pa.py_buffer(values))
    toks_per_doc = np.searchsorted(starts_idx, rel_off[1:]) - \
        np.searchsorted(starts_idx, rel_off[:-1])
    list_offsets = np.zeros(len(toks_per_doc) + 1, dtype=np.int64)
    np.cumsum(toks_per_doc, out=list_offsets[1:])
    return pa.ListArray.from_arrays(pa.array(list_offsets, type=pa.int64()), flat)


def tokenize_column(col: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """Vectorized tokenize of a string column -> list<string> column.

    ASCII chunks take the numpy byte-classification fast path; any chunk
    with non-ASCII bytes falls back to lower -> regex-split (identical
    results — property-tested against the plain-Python tokenizer).
    """
    if isinstance(col, (pa.Array, pa.ChunkedArray)) and col.null_count:
        col = pc.fill_null(col, "")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array) and pa.types.is_string(col.type):
        fast = _tokenize_chunk_ascii(col)
        if fast is not None:
            return fast
    lowered = pc.utf8_lower(col)
    split = pc.split_pattern_regex(lowered, _SPLIT_PATTERN)
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    # Drop empty tokens while preserving the list structure.
    flat = split.flatten()
    keep = pc.not_equal(flat, "")
    # Rebuild offsets: count kept tokens per row.
    keep_np = keep.to_numpy(zero_copy_only=False)
    offsets = split.offsets.to_numpy(zero_copy_only=False)
    kept_per_row = np.add.reduceat(
        np.concatenate([keep_np.astype(np.int64), [0]]),
        offsets[:-1],
    ) if len(offsets) > 1 else np.zeros(0, dtype=np.int64)
    # reduceat quirk: when offsets[i] == offsets[i+1] (empty row) it takes
    # the single element at that index instead of 0 — fix those rows.
    empty_rows = offsets[:-1] == offsets[1:]
    kept_per_row[empty_rows] = 0
    new_offsets = np.zeros(len(kept_per_row) + 1, dtype=np.int64)
    np.cumsum(kept_per_row, out=new_offsets[1:])
    kept_flat = flat.filter(keep)
    return pa.ListArray.from_arrays(pa.array(new_offsets, type=pa.int64()), kept_flat)


def tokenize_html_column(html, open_tag: str = "<p>",
                         close_tag: str = "</p>") -> pa.ListArray | None:
    """Fused extract+tokenize: tokenize directly inside the html buffer,
    masking every byte outside the first <p>..</p> region — zero-copy
    with respect to the text (no extracted column is materialized).

    Token-equivalent to ``tokenize_column(HtmlExtract()(batch)["text"])``
    because '<' and '>' are separator bytes: token runs can never cross a
    region boundary.  Returns None for non-ASCII payloads (caller falls
    back to extract-then-tokenize).
    """
    s = pc.cast(html, pa.string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    offs = np.frombuffer(s.buffers()[1], dtype=np.int32)[
        s.offset: s.offset + len(s) + 1].astype(np.int64)
    nbytes = int(offs[-1] - offs[0])
    data = np.frombuffer(s.buffers()[2], dtype=np.uint8)[offs[0]:offs[-1]] \
        if s.buffers()[2] is not None else np.zeros(0, dtype=np.uint8)
    rel = offs - offs[0]
    start = pc.find_substring(s, open_tag).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    abs_start = rel[:-1] + start + len(open_tag)
    # first close tag AT OR AFTER the open (a stray </p> before the first
    # <p> is skipped, matching the regex <p>(.*?)</p> semantics)
    from .extract import first_close_after

    close_ok, close_pos = first_close_after(
        data, rel[1:], abs_start, close_tag.encode())
    valid = (start >= 0) & close_ok
    abs_start = abs_start[valid]
    abs_end = close_pos[valid]
    # region mask via +1/-1 boundary flags and a cumulative sum.  After
    # dropping empty regions, all boundary positions are DISTINCT
    # (regions of different docs live in disjoint byte ranges and never
    # nest), so plain fancy-index assignment replaces the much slower
    # buffered np.add.at; and with flag values in {0,1} the int8 cumsum
    # can be reinterpreted as the bool mask zero-copy (no `!= 0` pass).
    nonempty = abs_end > abs_start
    flags = np.zeros(nbytes + 1, dtype=np.int8)
    flags[abs_start[nonempty]] = 1
    flags[abs_end[nonempty]] = -1
    mask = np.cumsum(flags[:-1], dtype=np.int8)[: nbytes].view(np.bool_)
    return _tokenize_chunk_ascii(s, region_mask=mask)


def token_counts_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Number of tokens per row (doc length), vectorized."""
    toks = tokenize_column(col)
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    return (offsets[1:] - offsets[:-1]).astype(np.int64)
