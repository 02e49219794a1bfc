"""Join operators (SURVEY §2.6 — the reference delegates joins to ES;
here they are explicit).

- ``broadcast_join``: small side shipped once via ray.put, looked up per
  batch (dimension tables, flagged-key sets).
- ``hash_join``: both sides large — add ``_bucket = hash(key) % B`` to
  each side, co-locate matching buckets with one groupby over the
  union, and join pairwise inside each bucket group (an explicit
  partitioned hash join; B and hot-key salting are the caller's
  partitioning decisions, documented per call site).
- ``semi_join`` / ``anti_join``: broadcast key-set membership filters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_any_array


def _bucket_of(col: pa.Array | pa.ChunkedArray, num_buckets: int) -> np.ndarray:
    # deterministic across processes (no PYTHONHASHSEED dependence):
    # vectorized 64-bit mix of the key column (hashing.hash_any_array)
    return (hash_any_array(col) % np.uint64(num_buckets)).astype(np.int32)


def broadcast_join(ds, small_df: pd.DataFrame, key: str, *,
                   how: str = "inner"):
    """Join a Dataset against a small pandas side (broadcast once)."""
    import ray

    ref = ray.put(small_df)

    def f(b: pa.Table) -> pa.Table:
        left = b.to_pandas()
        right = ray.get(ref)
        out = left.merge(right, on=key, how=how)
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(f, batch_format="pyarrow")


def hash_join(ds_a, ds_b, key: str, *, num_buckets: int = 16,
              how: str = "inner", suffix: str = "_r"):
    """Partitioned hash join of two Datasets on ``key``.

    Both sides gain a bucket column and a side marker, union into one
    dataset, and a single groupby(bucket) co-locates matching keys; the
    group task splits sides and merges with pandas.  One shuffle total;
    key skew is bounded by bucket granularity (salt hot keys into
    sub-buckets by raising num_buckets).
    """
    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError, ValueError):
            return pa.string()  # pandas object dtype and friends

    schema_a, schema_b = ds_a.schema(), ds_b.schema()
    a_cols = list(schema_a.names)
    b_cols = [n for n in schema_b.names]
    # disambiguate overlapping non-key names on the right side up front
    b_renamed = {n: (n + suffix if n in a_cols and n != key else n)
                 for n in b_cols}
    types_a = {n: _pa_type(t) for n, t in zip(schema_a.names, schema_a.types)}
    types_b = {b_renamed[n]: _pa_type(t)
               for n, t in zip(schema_b.names, schema_b.types)}
    all_fields = {**types_a, **types_b}

    def tag(side: str, rename: dict | None):
        def f(b: pa.Table) -> pa.Table:
            if rename:
                b = b.rename_columns([rename[n] for n in b.column_names])
            # pad to the union schema so both sides share one layout
            cols = {}
            for name, typ in all_fields.items():
                cols[name] = b[name] if name in b.column_names \
                    else pa.nulls(b.num_rows, typ)
            cols["_bucket"] = pa.array(_bucket_of(b[key], num_buckets))
            cols["_side"] = pa.array([side] * b.num_rows)
            return pa.table(cols)
        return f

    u = ds_a.map_batches(tag("a", None), batch_format="pyarrow").union(
        ds_b.map_batches(tag("b", b_renamed), batch_format="pyarrow"))

    right_cols = [key] + [c for c in types_b if c != key]
    left_cols = list(types_a)

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == "a"][left_cols]
        right = g[g["_side"] == "b"][right_cols]
        return left.merge(right, on=key, how=how)

    return u.groupby("_bucket").map_groups(join_group, batch_format="pandas")


def _membership_mask(b: pa.Table, key_col: str, value_set: pa.Array):
    col = b[key_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.type != value_set.type:
        col = pc.cast(col, value_set.type)
    return pc.is_in(col, value_set=value_set)


def semi_join(ds, keys: set, key_col: str):
    """Broadcast semi-join: keep rows whose key is in ``keys`` —
    vectorized ``pc.is_in`` against a broadcast value set."""
    import ray

    ref = ray.put(pa.array(list(keys)))

    def f(b: pa.Table) -> pa.Table:
        return b.filter(_membership_mask(b, key_col, ray.get(ref)))

    return ds.map_batches(f, batch_format="pyarrow")


def anti_join(ds, keys: set, key_col: str):
    """Broadcast anti-join: drop rows whose key is in ``keys`` (the
    reference's already-tagged exclusion, Q8 simplequery.py:26-56)."""
    import ray

    ref = ray.put(pa.array(list(keys)))

    def f(b: pa.Table) -> pa.Table:
        mask = _membership_mask(b, key_col, ray.get(ref))
        return b.filter(pc.invert(mask))

    return ds.map_batches(f, batch_format="pyarrow")
