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
                            history_start: dt.datetime, history_end: dt.datetime,
                            slide: dt.timedelta, step: dt.timedelta,
                            tiebreak_col: str | None = None):
    """Returns a Dataset of outlier rows — per (window, pair) the earliest
    in-window doc whose first occurrence is within the window's last step.
    Output columns: original group-representative row + (aggregator,
    target, win_start, win_end, first_ts)."""
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
