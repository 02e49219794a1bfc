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


def tokenize_column(col: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """Vectorized tokenize of a string column -> list<string> column.

    lower -> split on non-token runs -> per-token empty strings removed
    (split leaves '' at the edges when the string starts/ends with a
    separator).  Pure pyarrow.compute; no Python per-row loop.
    """
    if isinstance(col, (pa.Array, pa.ChunkedArray)) and col.null_count:
        col = pc.fill_null(col, "")
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


def token_counts_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Number of tokens per row (doc length), vectorized."""
    toks = tokenize_column(col)
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    return (offsets[1:] - offsets[:-1]).astype(np.int64)
