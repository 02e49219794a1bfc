"""Join operators (SURVEY §2.6 — the reference delegates joins to ES;
here they are explicit).

- ``broadcast_join``: small side shipped once via ray.put, looked up per
  batch (dimension tables, flagged-key sets).
- ``hash_join``: both sides large — add ``_bucket = hash(key) % B`` to
  each side, co-locate matching buckets with one groupby over the
  union, and join pairwise inside each bucket group (an explicit
  partitioned hash join).  B defaults from the input sizes
  (``_join_buckets``); hot-key skew splits via the ``salt`` hook
  (``_salted_bucket`` — left round-robin, right replicated).
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


# target rows per co-group bucket: ~256k rows keeps the per-group pandas
# merge payload in the tens of MB on typical row widths — small enough
# for a worker heap, large enough that group scheduling overhead
# amortizes.  Derived B is clamped to [8, 4096].
_TARGET_BUCKET_ROWS = 1 << 18


def _derive_buckets(n_rows: int) -> int:
    return int(min(4096, max(8, -(-n_rows // _TARGET_BUCKET_ROWS))))


def _join_buckets(ds_a, ds_b, num_buckets: int | None) -> int:
    """Default B from input size when the caller doesn't pass one.
    Costs one counting pass over both inputs (re-executed lazily), so
    callers that already know their sizes should pass ``num_buckets``
    explicitly; parquet-backed inputs count from metadata."""
    if num_buckets is not None:
        return num_buckets
    return _derive_buckets((ds_a.count() or 0) + (ds_b.count() or 0))


def _salted_bucket(base: np.ndarray, salt: int, side: str) -> np.ndarray:
    """Hot-key salting (the join-side analogue of the index build's
    heavy-hitter term splitting): left rows spread round-robin over
    ``salt`` sub-buckets of their hash bucket; the right side is
    REPLICATED into every sub-bucket (joins.hash_join tag()), so each
    left row still meets the full right partition for its key.  Any
    balanced assignment yields identical results — round-robin needs no
    RNG and bounds every sub-group at ceil(n/salt) rows of the hot
    key."""
    if side == "a":
        sub = np.arange(len(base), dtype=np.int32) % np.int32(salt)
        return base * np.int32(salt) + sub
    # right side: caller replicates rows; this computes the bucket ids
    # for the replicated layout (row i repeated salt times)
    rep = np.repeat(base * np.int32(salt), salt)
    rep += np.tile(np.arange(salt, dtype=np.int32), len(base))
    return rep


def _restore_dtypes(out: pd.DataFrame, out_types: dict) -> pd.DataFrame:
    """Cast an inner-join's output back to the source dtypes — but only
    integer columns that carry NO nulls: a source int64 column that
    already contained nulls (pre-existing, not join-introduced) is
    widened by pandas to float64 with NaN, and a hard astype(int64)
    would raise IntCastingNaNError; such columns keep the widened
    float, matching what the source itself looks like in pandas."""
    casts = {}
    for c, t in out_types.items():
        if c not in out.columns:
            continue
        if pd.api.types.is_integer_dtype(t) and out[c].isna().any():
            continue
        casts[c] = t
    return out.astype(casts, copy=False)


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


def hash_join(ds_a, ds_b, key: str, *, num_buckets: int | None = None,
              how: str = "inner", suffix: str = "_r", salt: int = 1):
    """Partitioned hash join of two Datasets on ``key``.

    Both sides gain a bucket column and a side marker, union into one
    dataset, and a single groupby(bucket) co-locates matching keys; the
    group task splits sides and merges with pandas.  One shuffle total.

    ``num_buckets=None`` derives B from the input row counts
    (``_TARGET_BUCKET_ROWS`` per bucket, clamped to [8, 4096]) at the
    cost of one counting pass.  ``salt > 1`` splits each bucket into
    ``salt`` sub-buckets for HOT-KEY skew (a single key whose group
    exceeds the payload bound): left rows spread round-robin, right
    rows replicate into every sub-bucket — results identical, per-group
    rows bounded at ~ceil(hot/salt) + replicated right.  Salt requires
    ``how`` in (inner, left): right/outer joins would duplicate
    unmatched right rows across sub-buckets.
    """
    if salt > 1 and how not in ("inner", "left"):
        raise ValueError("salt > 1 supports only inner/left joins")
    num_buckets = _join_buckets(ds_a, ds_b, num_buckets)
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
            base = _bucket_of(b[key], num_buckets)
            if salt > 1:
                if side == "b":
                    # replicate right rows into every sub-bucket
                    t = pa.table(cols)
                    idx = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                                    salt)
                    t = t.take(pa.array(idx))
                    cols = {n: t[n] for n in t.column_names}
                bucket = _salted_bucket(base, salt, side)
            else:
                bucket = base
            n_out = len(bucket)
            cols["_bucket"] = pa.array(bucket)
            cols["_side"] = pa.array([side] * n_out)
            return pa.table(cols)
        return f

    u = ds_a.map_batches(tag("a", None), batch_format="pyarrow").union(
        ds_b.map_batches(tag("b", b_renamed), batch_format="pyarrow"))

    right_cols = [key] + [c for c in types_b if c != key]
    left_cols = list(types_a)
    # The union's typed-null padding makes pandas widen int64 columns to
    # float64 inside the co-group.  Inner joins can't emit nulls, so cast
    # the output back to the source Arrow types; left/outer joins keep
    # the widened dtypes (nulls may survive there).

    def _pd_dtype(t):
        try:
            return t.to_pandas_dtype()
        except (NotImplementedError, TypeError):
            return object

    out_types = {c: _pd_dtype(t) for c, t in all_fields.items()} \
        if how == "inner" else None

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == "a"][left_cols]
        right = g[g["_side"] == "b"][right_cols]
        out = left.merge(right, on=key, how=how)
        return _restore_dtypes(out, out_types) if out_types else out

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


def asof_join(ds_left, ds_right, key: str, ts_col: str, *,
              tie_col: str, num_buckets: int | None = None,
              suffix: str = "_r"):
    """Distributed AS-OF JOIN: for every left row, attach the right row
    with the greatest ``ts_col`` <= the left row's, per ``key`` (inner:
    left rows with no eligible right row are dropped).

    Ties on the right timestamp resolve to the greatest ``tie_col``
    (deterministic — plain ASOF JOIN is underspecified under duplicate
    timestamps, which would break cross-engine hash comparison).

    Shape: the same single-shuffle co-group as ``hash_join`` (both sides
    tagged with hash(key) % B, one groupby); inside each bucket the
    match is fully vectorized — factorize keys, rank-compress
    timestamps, pack (key, ts_rank) into ONE int64 composite, and a
    single ``np.searchsorted(side='right') - 1`` finds every left row's
    predecessor in the (key, ts, tie)-sorted right side.  No per-key
    loop, no per-row loop; skew is bounded by bucket granularity like
    hash_join.  ``num_buckets=None`` derives B from the input sizes
    (``_join_buckets``)."""
    num_buckets = _join_buckets(ds_left, ds_right, num_buckets)
    l_cols = list(ds_left.schema().names)
    r_schema = ds_right.schema()
    r_rename = {n: (n + suffix if n in l_cols else n)
                for n in r_schema.names}
    r_cols = [r_rename[n] for n in r_schema.names]
    rk, rts, rtie = r_rename[key], r_rename[ts_col], r_rename[tie_col]

    def _pa_type(t):
        return t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t)

    all_fields = {n: _pa_type(t) for n, t in
                  zip(ds_left.schema().names, ds_left.schema().types)}
    for n, t in zip(r_schema.names, r_schema.types):
        all_fields[r_rename[n]] = _pa_type(t)

    def tag(side: str, rename: dict | None):
        def f(b: pa.Table) -> pa.Table:
            if rename:
                b = b.rename_columns([rename[n] for n in b.column_names])
            cols = {}
            for name, typ in all_fields.items():
                cols[name] = b[name] if name in b.column_names \
                    else pa.nulls(b.num_rows, typ)
            bucket_key = key if side == "a" else rk
            cols["_bucket"] = pa.array(_bucket_of(b[bucket_key], num_buckets))
            cols["_side"] = pa.array([side] * b.num_rows)
            return pa.table(cols)
        return f

    u = ds_left.map_batches(tag("a", None), batch_format="pyarrow").union(
        ds_right.map_batches(tag("b", r_rename), batch_format="pyarrow"))

    out_cols = l_cols + [c for c in r_cols if c != rk]
    # The union pads each side's missing columns with typed nulls, and
    # pandas widens int64-with-nulls to float64 inside the co-group; the
    # join is inner (no null payloads survive), so cast the output back
    # to the source Arrow types or downstream consumers (and the
    # cross-engine hash compare) see double where the input had int64.

    def _pd_dtype(t):
        try:
            return t.to_pandas_dtype()
        except (NotImplementedError, TypeError):
            return object

    out_types = {c: _pd_dtype(all_fields[c]) for c in out_cols}

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == "a"]
        right = g[g["_side"] == "b"]
        empty = pd.DataFrame({c: pd.Series(dtype=out_types[c])
                              for c in out_cols})
        if not len(left) or not len(right):
            return empty
        kid, _ = pd.factorize(
            pd.concat([left[key], right[rk]], ignore_index=True), sort=True)
        lk, rkid = kid[:len(left)], kid[len(left):]
        lts = left[ts_col].to_numpy()
        rtsv = right[rts].to_numpy()
        # rank-compress timestamps over the union so (key, ts) packs
        # into one int64 composite with no overflow
        uts = np.unique(np.concatenate([lts, rtsv]))
        lr = np.searchsorted(uts, lts).astype(np.int64)
        rr = np.searchsorted(uts, rtsv).astype(np.int64)
        m = np.int64(len(uts) + 1)
        order = np.lexsort([right[rtie].to_numpy(), rr, rkid])
        rcomp = rkid[order] * m + rr[order]
        pos = np.searchsorted(rcomp, lk * m + lr, side="right") - 1
        ok = pos >= 0
        ok[ok] &= rkid[order][pos[ok]] == lk[ok]
        lsel = left[l_cols].iloc[np.flatnonzero(ok)].reset_index(drop=True)
        rsel = right[r_cols].iloc[order[pos[ok]]].reset_index(drop=True)
        out = pd.concat([lsel, rsel.drop(columns=[rk])], axis=1)
        return _restore_dtypes(out, out_types) if len(out) else empty

    return u.groupby("_bucket").map_groups(join_group, batch_format="pandas")
