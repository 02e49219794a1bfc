"""sudden_appearance analyzer as a Ray Data plan (reference
/root/reference/app/analyzers/sudden_appearance.py).

Reference behavior: slide a window of size W_slide by steps of W_step
across the history window; at each position query ES for the earliest doc
per (aggregator, target) bucket within the window
(scan_first_occur_documents, /root/reference/app/helpers/es.py:713-778)
and flag it when that first occurrence falls inside the window's last
step (sudden_appearance.py:92-147, predicate at :120).

Ray formulation (SURVEY §2.8): ONE ``groupby(aggregator,
target)`` shuffle collects each pair's sorted timestamps; every window
position is then evaluated per group with a vectorized ``searchsorted``
— equivalent results, one shuffle instead of num_scan ES aggregations.
Window positions replicate the reference's loop exactly, including the
final clamped window [end - step, end] (sudden_appearance.py:81-88).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from .terms import _drop_null_keys, add_key_column


def window_positions(start: dt.datetime, end: dt.datetime,
                     slide: dt.timedelta, step: dt.timedelta
                     ) -> list[tuple[dt.datetime, dt.datetime]]:
    """Mirror of the reference's sliding loop (sudden_appearance.py:60-90)."""
    wins = []
    s = start
    e = s + slide
    if e == end:
        wins.append((s, e))
    while e < end:
        wins.append((s, e))
        s += step
        e += step
        if e >= end:
            wins.append((end - step, end))
    return wins


def sudden_appearance_model(ds, aggregator, target, *, ts_col: str,
                            history_start: dt.datetime,
                            history_end: dt.datetime,
                            slide: dt.timedelta, step: dt.timedelta,
                            tiebreak_col: str | None = None):
    """Returns a Dataset of outlier rows — per (window, pair) the earliest
    in-window doc whose first occurrence is within the window's last step.
    Output columns: original group-representative row + (aggregator,
    target, win_start, win_end, first_ts).

    Formulation: ONE global sort by (pair, ts, tiebreak), then pure
    per-batch vector arithmetic — an event can be flagged for at most
    ONE grid window (grid starts are step-spaced and the flag interval
    for an event has width step, so ``ceil((t - slide - start)/step)``
    names the only candidate), decided from (t, prev-same-pair-ts)
    alone.  No per-group Python: the old ``groupby().map_groups`` form
    (kept as ``sudden_appearance_model_groups``, the reference kernel
    for tests) pays per-GROUP call overhead, which at corpus scale —
    millions of (aggregator, target) pairs — dominates.  Each batch's
    first row lacks its predecessor; those (one per block) resolve on
    the driver from per-block boundary records."""
    import ray.data

    us = 1_000_000
    start_us = np.datetime64(history_start, "us").astype(np.int64)
    step_us = np.int64(int(step.total_seconds() * us))
    slide_us = np.int64(int(slide.total_seconds() * us))
    wins = window_positions(history_start, history_end, slide, step)
    win_s = np.array([np.datetime64(s, "us") for s, _ in wins]) \
        .astype(np.int64)
    win_e = np.array([np.datetime64(e, "us") for _, e in wins]) \
        .astype(np.int64)
    k_of = (win_s - start_us) // step_us
    is_grid = (win_s == start_us + k_of * step_us) & \
        (win_e == win_s + slide_us)
    # k -> window-list index for grid windows; -1 = no such window
    k_to_win = np.full(int(k_of[is_grid].max()) + 1 if is_grid.any()
                       else 1, -1, dtype=np.int64)
    k_to_win[k_of[is_grid]] = np.flatnonzero(is_grid)
    specials = np.flatnonzero(~is_grid)

    ds = add_key_column(ds, aggregator, "aggregator")
    ds = add_key_column(ds, target, "target")
    ds = _drop_null_keys(ds, ["aggregator", "target"])
    sort_cols = ["aggregator", "target", ts_col] + \
        ([tiebreak_col] if tiebreak_col else [])
    dss = ds.sort(sort_cols)

    neg_inf = np.int64(np.iinfo(np.int64).min)

    def flag_events(ts: np.ndarray, tprev: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
        """(event row indices, window-list indices) of flagged events."""
        rows_list, wins_list = [], []
        # unique grid candidate per event
        num = ts - slide_us - start_us
        k = -((-num) // step_us)                     # ceil division
        k_ok = (k >= 0) & (k < len(k_to_win))
        widx = np.where(k_ok, k_to_win[np.clip(k, 0, len(k_to_win) - 1)],
                        -1)
        cs = start_us + k * step_us
        ce = cs + slide_us
        ok = (widx >= 0) & (cs > tprev) & (cs <= ts) & (ts <= ce) & \
            (ts > ce - step_us)
        rows_list.append(np.flatnonzero(ok))
        wins_list.append(widx[ok])
        for wi in specials:
            s, e = win_s[wi], win_e[wi]
            ok = (tprev < s) & (s <= ts) & (ts <= e) & (ts > e - step_us)
            rows_list.append(np.flatnonzero(ok))
            wins_list.append(np.full(int(ok.sum()), wi, dtype=np.int64))
        return np.concatenate(rows_list), np.concatenate(wins_list)

    def _out_frame(b: pd.DataFrame, rows: np.ndarray, widx: np.ndarray,
                   ts: np.ndarray) -> pd.DataFrame:
        out = b.iloc[rows].copy().reset_index(drop=True)
        out["win_start"] = pd.Series(win_s[widx].astype("datetime64[us]"))
        out["win_end"] = pd.Series(win_e[widx].astype("datetime64[us]"))
        out["first_ts"] = pd.Series(ts[rows].astype("datetime64[us]"))
        return out

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        schema_cols = list(b.columns) + ["win_start", "win_end", "first_ts",
                                         "_kind", "_tail_aggregator",
                                         "_tail_target", "_tail_ts"]
        if b.empty:
            e = b.copy()
            for c in ("win_start", "win_end", "first_ts"):
                e[c] = pd.Series(dtype="datetime64[us]")
            e["_kind"] = pd.Series(dtype=object)
            e["_tail_aggregator"] = pd.Series(dtype=object)
            e["_tail_target"] = pd.Series(dtype=object)
            e["_tail_ts"] = pd.Series(dtype="datetime64[us]")
            return e[schema_cols]
        ts = b[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        agg = b["aggregator"].to_numpy()
        tgt = b["target"].to_numpy()
        tprev = np.full(len(b), neg_inf)
        if len(b) > 1:
            same = (agg[1:] == agg[:-1]) & (tgt[1:] == tgt[:-1])
            tprev[1:][same] = ts[:-1][same]
        # row 0's predecessor may live in the previous block: exclude it
        # here, emit a boundary record, resolve on the driver
        rows, widx = flag_events(ts, tprev)
        keep = rows != 0
        out = _out_frame(b, rows[keep], widx[keep], ts)
        out["_kind"] = "o"
        # explicit dtypes on the all-NA columns: pandas' future concat
        # behavior stops excluding all-NA entries from dtype inference,
        # so give both sides matching dtypes up front (kills the
        # FutureWarning and pins the result dtype either way)
        out["_tail_aggregator"] = pd.Series(None, index=out.index,
                                            dtype=object)
        out["_tail_target"] = pd.Series(None, index=out.index, dtype=object)
        out["_tail_ts"] = pd.Series(pd.NaT, index=out.index,
                                    dtype="datetime64[us]")
        bnd = b.iloc[[0]].copy().reset_index(drop=True)
        for c in ("win_start", "win_end", "first_ts"):
            # explicit us dtype: a bare pd.NaT scalar makes an all-NA
            # ns column, which both mismatches `out` and trips pandas'
            # all-NA-entry concat deprecation
            bnd[c] = pd.Series(pd.NaT, index=bnd.index,
                               dtype="datetime64[us]")
        bnd["_kind"] = "b"
        bnd["_tail_aggregator"] = agg[-1]
        bnd["_tail_target"] = tgt[-1]
        bnd["_tail_ts"] = pd.Timestamp(ts[-1].astype("datetime64[us]"))
        # exclude empty frames from the concat: pandas deprecates dtype
        # inference over empty/all-NA entries, and `out` is legitimately
        # empty whenever a batch flags no events
        out = bnd if out.empty else pd.concat([out, bnd],
                                              ignore_index=True)
        for c in ("win_start", "win_end", "first_ts", "_tail_ts"):
            out[c] = out[c].astype("datetime64[us]")
        return out[schema_cols]

    tagged = dss.map_batches(flag, batch_format="pandas",
                             batch_size=None).materialize()
    helper_cols = ["_kind", "_tail_aggregator", "_tail_target", "_tail_ts"]

    def _only(kind):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["_kind"] == kind]
        return f

    bnd_df = tagged.map_batches(_only("b"), batch_format="pandas") \
        .to_pandas()
    extra = None
    if not bnd_df.empty:
        bnd_df = bnd_df.sort_values(
            ["aggregator", "target", ts_col] +
            ([tiebreak_col] if tiebreak_col else []),
            kind="stable").reset_index(drop=True)
        ts0 = bnd_df[ts_col].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        tprev0 = np.full(len(bnd_df), neg_inf)
        if len(bnd_df) > 1:
            same = (bnd_df["_tail_aggregator"].to_numpy()[:-1] ==
                    bnd_df["aggregator"].to_numpy()[1:]) & \
                   (bnd_df["_tail_target"].to_numpy()[:-1] ==
                    bnd_df["target"].to_numpy()[1:])
            tails = bnd_df["_tail_ts"].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
            tprev0[1:][same] = tails[:-1][same]
        rows, widx = flag_events(ts0, tprev0)
        extra = _out_frame(bnd_df, rows, widx, ts0) \
            .drop(columns=helper_cols)

    out = tagged.map_batches(_only("o"), batch_format="pandas") \
        .drop_columns(helper_cols)
    if extra is not None and not extra.empty:
        # from_pandas keeps the union's block types uniform (tagged's
        # blocks are pandas)
        out = out.union(ray.data.from_pandas(extra))
    return out


def sudden_appearance_model_groups(ds, aggregator, target, *, ts_col: str,
                                   history_start: dt.datetime,
                                   history_end: dt.datetime,
                                   slide: dt.timedelta, step: dt.timedelta,
                                   tiebreak_col: str | None = None):
    """Original groupby().map_groups formulation — per-group Python, kept
    as the reference kernel the vectorized model is tested against."""
    wins = window_positions(history_start, history_end, slide, step)
    win_start = np.array([np.datetime64(s, "us") for s, _ in wins])
    win_end = np.array([np.datetime64(e, "us") for _, e in wins])
    step64 = np.timedelta64(int(step.total_seconds() * 1_000_000), "us")

    ds = add_key_column(ds, aggregator, "aggregator")
    ds = add_key_column(ds, target, "target")
    ds = _drop_null_keys(ds, ["aggregator", "target"])

    sort_keys = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_keys, kind="stable").reset_index(drop=True)
        ts = g[ts_col].to_numpy(dtype="datetime64[us]")
        # first in-window occurrence per window position (inclusive range,
        # mirroring the ES gte/lte range filter)
        idx = np.searchsorted(ts, win_start, side="left")
        valid = idx < len(ts)
        first_ts = np.full(len(wins), np.datetime64("NaT"), dtype="datetime64[us]")
        first_ts[valid] = ts[np.minimum(idx, len(ts) - 1)][valid]
        in_win = valid & (first_ts <= win_end)
        flag = in_win & (first_ts > (win_end - step64))
        out_rows = []
        for wi in np.flatnonzero(flag):
            row = g.iloc[int(idx[wi])].copy()
            row["win_start"] = pd.Timestamp(win_start[wi])
            row["win_end"] = pd.Timestamp(win_end[wi])
            row["first_ts"] = pd.Timestamp(first_ts[wi])
            out_rows.append(row)
        if not out_rows:
            e = g.iloc[0:0].copy()
            for c in ("win_start", "win_end", "first_ts"):
                e[c] = pd.Series(dtype="datetime64[us]")
            return e
        return pd.DataFrame(out_rows)

    return ds.groupby(["aggregator", "target"]).map_groups(
        fn, batch_format="pandas")
