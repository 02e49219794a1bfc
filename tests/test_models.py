"""Analyzer-model pipelines vs hand-computed expectations mirroring the
reference semantics (terms.py / metrics.py / sudden_appearance.py)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
import ray.data

from ee_outliers_ray.models.frontier import get_decision_frontier
from ee_outliers_ray.models.metrics import metrics_model
from ee_outliers_ray.models.simplequery import simplequery_model
from ee_outliers_ray.models.sudden_appearance import (
    sudden_appearance_model,
    window_positions,
)
from ee_outliers_ray.models.terms import terms_model
from ee_outliers_ray.models.whitelist import Whitelist


def _events_df():
    # agg A: targets x,x,x,y ; agg B: z,z ; agg C: q,r,s,t,u (5 distinct)
    rows = []
    for i, (a, t) in enumerate(
        [("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
         ("B", "z"), ("B", "z"),
         ("C", "q"), ("C", "r"), ("C", "s"), ("C", "t"), ("C", "u")]
    ):
        rows.append({"doc_id": i, "agg": a, "tgt": t})
    return pd.DataFrame(rows)


def test_terms_across():
    ds = ray.data.from_pandas(_events_df())
    # distinct counts: A=2, B=1, C=5 ; frontier pct_of_max 60 -> 3 ;
    # high -> only C (5 > 3) flagged -> all 5 docs of C
    out = terms_model(ds, "agg", "tgt", target_count_method="across_aggregators",
                      trigger_method="pct_of_max_value", trigger_sensitivity=60,
                      trigger_on="high").to_pandas()
    assert sorted(out["doc_id"]) == [6, 7, 8, 9, 10]
    assert (out["term_count"] == 5.0).all()
    assert (out["decision_frontier"] == 3.0).all()


def test_terms_across_low():
    ds = ray.data.from_pandas(_events_df())
    # low trigger: counts [2,1,5], frontier = 60% of max = 3 -> A(2), B(1)
    out = terms_model(ds, "agg", "tgt", target_count_method="across_aggregators",
                      trigger_method="pct_of_max_value", trigger_sensitivity=60,
                      trigger_on="low").to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2, 3, 4, 5]


def test_terms_within():
    ds = ray.data.from_pandas(_events_df())
    # within A: counts x:3 y:1 ; frontier pct_of_max 50 -> 1.5 ; high ->
    # docs with count > 1.5 -> the three x docs. B: z:2 -> frontier 1.0,
    # z(2)>1 -> both docs. C: each 1 -> frontier 0.5 -> all 5 docs.
    out = terms_model(ds, "agg", "tgt", target_count_method="within_aggregator",
                      trigger_method="pct_of_max_value", trigger_sensitivity=50,
                      trigger_on="high").to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2, 4, 5, 6, 7, 8, 9, 10]


def test_terms_within_low_rare():
    ds = ray.data.from_pandas(_events_df())
    # classic "rarely seen": low trigger on count < 2 -> A:y, C:all
    out = terms_model(ds, "agg", "tgt", target_count_method="within_aggregator",
                      trigger_method="float", trigger_sensitivity=2,
                      trigger_on="low").to_pandas()
    assert sorted(out["doc_id"]) == [3, 6, 7, 8, 9, 10]


def test_terms_min_target_buckets():
    ds = ray.data.from_pandas(_events_df())
    # gate 3: A has 2 distinct, B 1 -> skipped; C has 5 -> evaluated
    out = terms_model(ds, "agg", "tgt", target_count_method="within_aggregator",
                      trigger_method="float", trigger_sensitivity=2,
                      trigger_on="low", min_target_buckets=3).to_pandas()
    assert sorted(out["doc_id"]) == [6, 7, 8, 9, 10]


def test_terms_whitelist_fixpoint_within():
    ds = ray.data.from_pandas(_events_df())
    # whitelist y: in A, y(count 1) flagged low<2 but whitelisted ->
    # removed -> recompute: counts x:3, frontier still float 2 -> x not <2
    # -> A yields nothing. C docs all flagged, q whitelisted -> removed ->
    # recompute on r,s,t,u (each 1 < 2) -> flagged.
    wl = Whitelist.from_config(literal_entries=["y", "q"])
    out = terms_model(ds, "agg", "tgt", target_count_method="within_aggregator",
                      trigger_method="float", trigger_sensitivity=2,
                      trigger_on="low", whitelist=wl).to_pandas()
    assert sorted(out["doc_id"]) == [7, 8, 9, 10]


def test_terms_whitelist_across():
    ds = ray.data.from_pandas(_events_df())
    # across high flags C; whitelist s -> pair (C,s) removed -> C distinct
    # becomes 4, frontier = 60% of max(2,1,4)=2.4 -> C(4) still > 2.4 ->
    # flagged; docs of C except s
    wl = Whitelist.from_config(literal_entries=["s"])
    out = terms_model(ds, "agg", "tgt", target_count_method="across_aggregators",
                      trigger_method="pct_of_max_value", trigger_sensitivity=60,
                      trigger_on="high", whitelist=wl).to_pandas()
    assert sorted(out["doc_id"]) == [6, 7, 9, 10]
    assert (out["term_count"] == 4.0).all()


def test_terms_cv():
    # coeff_of_variation: group flagged when cv is an outlier vs sensitivity
    df = pd.DataFrame([
        {"doc_id": 0, "agg": "A", "tgt": "x"},  # A: x:1,y:1 -> cv 0 < 0.1 (low)
        {"doc_id": 1, "agg": "A", "tgt": "y"},
        {"doc_id": 2, "agg": "B", "tgt": "x"},  # B: x:3,y:1 -> cv 0.5 not < 0.1
        {"doc_id": 3, "agg": "B", "tgt": "x"},
        {"doc_id": 4, "agg": "B", "tgt": "x"},
        {"doc_id": 5, "agg": "B", "tgt": "y"},
    ])
    ds = ray.data.from_pandas(df)
    out = terms_model(ds, "agg", "tgt", target_count_method="within_aggregator",
                      trigger_method="coeff_of_variation",
                      trigger_sensitivity=0.1, trigger_on="low").to_pandas()
    assert sorted(out["doc_id"]) == [0, 1]


def test_terms_multi_field_key():
    df = pd.DataFrame([
        {"doc_id": 0, "a1": "p", "a2": "q", "tgt": "x"},
        {"doc_id": 1, "a1": "p", "a2": "q", "tgt": "x"},
        {"doc_id": 2, "a1": "p", "a2": "r", "tgt": "y"},
    ])
    ds = ray.data.from_pandas(df)
    out = terms_model(ds, ["a1", "a2"], "tgt",
                      target_count_method="within_aggregator",
                      trigger_method="float", trigger_sensitivity=2,
                      trigger_on="low").to_pandas()
    # group "p - q": x count 2 not <2; group "p - r": y count 1 < 2
    assert sorted(out["doc_id"]) == [2]
    assert out["aggregator"].iloc[0] == "p - r"


def test_metrics_model():
    df = pd.DataFrame([
        {"doc_id": 0, "agg": "A", "cmd": "short"},
        {"doc_id": 1, "agg": "A", "cmd": "short"},
        {"doc_id": 2, "agg": "A", "cmd": "short"},
        {"doc_id": 3, "agg": "A", "cmd": "a much longer command line here"},
    ])
    ds = ray.data.from_pandas(df)
    vals = [5.0, 5.0, 5.0, 31.0]
    frontier = get_decision_frontier("stdev", vals, 1, "high")
    out = metrics_model(ds, "agg", "cmd", metric="length",
                        trigger_method="stdev", trigger_sensitivity=1,
                        trigger_on="high").to_pandas()
    assert sorted(out["doc_id"]) == [3]
    assert out["decision_frontier"].iloc[0] == pytest.approx(frontier)
    assert out["metric"].iloc[0] == 31.0


def test_metrics_whitelist_fixpoint():
    df = pd.DataFrame([
        {"doc_id": 0, "agg": "A", "cmd": "aa"},
        {"doc_id": 1, "agg": "A", "cmd": "bb"},
        {"doc_id": 2, "agg": "A", "cmd": "cc"},
        {"doc_id": 3, "agg": "A", "cmd": "whitelisted-long-value"},
        {"doc_id": 4, "agg": "A", "cmd": "another-long-outlier"},
    ])
    ds = ray.data.from_pandas(df)
    wl = Whitelist.from_config(regexp_entries=[r"whitelisted-.*"])
    out = metrics_model(ds, "agg", "cmd", metric="length",
                        trigger_method="pct_of_max_value",
                        trigger_sensitivity=90, trigger_on="high",
                        whitelist=wl).to_pandas()
    # iteration 1: frontier=0.9*22=19.8 -> doc3 (22) flagged, whitelisted,
    # removed; doc4 (20) flagged too but discarded with the iteration.
    # iteration 2: frontier=0.9*20=18 -> doc4 (20) flagged, kept.
    assert sorted(out["doc_id"]) == [4]
    assert out["decision_frontier"].iloc[0] == pytest.approx(18.0)


def test_simplequery_anti_join():
    df = pd.DataFrame({"doc_id": range(6), "lang": ["en", "fr", "en", "en", "de", "en"]})
    ds = ray.data.from_pandas(df)
    import pyarrow.compute as pc

    out = simplequery_model(
        ds, predicate=lambda b: pc.equal(b["lang"], "en"),
        already_tagged={0, 2}).to_pandas()
    assert sorted(out["doc_id"]) == [3, 5]
    assert (out["model_name"] == "simplequery").all()


def test_window_positions_mirror_reference():
    start = dt.datetime(2024, 1, 1)
    # history 10h, slide 4h, step 2h
    end = start + dt.timedelta(hours=10)
    wins = window_positions(start, end, dt.timedelta(hours=4), dt.timedelta(hours=2))
    got = [(int((s - start).total_seconds() // 3600),
            int((e - start).total_seconds() // 3600)) for s, e in wins]
    # mirror loop: [0,4],[2,6],[4,8] then clamped [8,10]
    assert got == [(0, 4), (2, 6), (4, 8), (8, 10)]
    # exact fit: slide == history
    wins = window_positions(start, start + dt.timedelta(hours=4),
                            dt.timedelta(hours=4), dt.timedelta(hours=2))
    assert len(wins) == 1


def test_sudden_appearance():
    start = dt.datetime(2024, 1, 1)
    end = start + dt.timedelta(hours=10)
    rows = [
        # pair (A,x): first at hour 1 -> inside window [0,4] but not in its
        # last step (hours 2-4)? 1 <= 2 -> not flagged; window [2,6]: first
        # in-window is hour 3 (>4? no, 6-2=4 -> 3 not > 4) ... construct:
        {"doc_id": 0, "agg": "A", "tgt": "x", "ts": start + dt.timedelta(hours=1)},
        {"doc_id": 1, "agg": "A", "tgt": "x", "ts": start + dt.timedelta(hours=3)},
        # pair (A,y): first at hour 5.5 -> window [2,6] last step (4,6] -> flagged
        {"doc_id": 2, "agg": "A", "tgt": "y", "ts": start + dt.timedelta(hours=5, minutes=30)},
        # pair (B,z): first at hour 9.5 -> clamped window [8,10] last step (8,10] -> flagged
        {"doc_id": 3, "agg": "B", "tgt": "z", "ts": start + dt.timedelta(hours=9, minutes=30)},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = sudden_appearance_model(
        ds, "agg", "tgt", ts_col="ts", history_start=start, history_end=end,
        slide=dt.timedelta(hours=4), step=dt.timedelta(hours=2)).to_pandas()
    flagged = set(zip(out["aggregator"], out["tgt"]))
    assert ("A", "y") in flagged
    assert ("B", "z") in flagged
    assert ("A", "x") not in flagged
    # (A,y) hour 5.5: windows [2,6] (last step (4,6]) and [4,8] (first
    # in-window 5.5, last step (6,8] -> not flagged there)
    ay = out[out["tgt"] == "y"]
    assert len(ay) == 1 and ay["doc_id"].iloc[0] == 2


def test_sudden_appearance_vectorized_matches_groups():
    """The sort+vector formulation must equal the per-group reference
    kernel on real testdata and on a randomized corpus with ties and
    boundary-spanning groups."""
    import datetime as dt

    import numpy as np
    import pandas as pd
    import ray.data

    from ee_outliers_ray.models.sudden_appearance import (
        sudden_appearance_model,
        sudden_appearance_model_groups,
    )

    def run(model, ds, **kw):
        df = model(ds, "event_type", "user_id", ts_col="ts",
                   tiebreak_col="event_id", **kw).to_pandas()
        df = df[["aggregator", "target", "win_start", "win_end",
                 "first_ts", "event_id"]]
        for c in ("win_start", "win_end", "first_ts"):
            df[c] = df[c].astype("datetime64[us]")
        return df.sort_values(list(df.columns)).reset_index(drop=True) \
            .astype({"target": str})

    kw = dict(history_start=dt.datetime(2024, 1, 1),
              history_end=dt.datetime(2024, 1, 29),
              slide=dt.timedelta(days=7), step=dt.timedelta(days=1))
    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                               columns=["event_id", "user_id",
                                        "event_type", "ts"])
    pd.testing.assert_frame_equal(run(sudden_appearance_model, ds, **kw),
                                  run(sudden_appearance_model_groups, ds,
                                      **kw))

    # randomized corpus: duplicate timestamps, sparse pairs, events
    # outside the history window, slide == step
    rng = np.random.default_rng(11)
    n = 4000
    ts0 = np.datetime64("2023-12-28") + \
        rng.integers(0, 40 * 24 * 3600, n).astype("timedelta64[s]")
    ts0[::17] = ts0[0]  # ties
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 400, n),
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts": ts0.astype("datetime64[us]"),
    })
    ds2 = ray.data.from_pandas(df)
    for slide_d, step_d in [(7, 1), (3, 3), (5, 2)]:
        kw2 = dict(history_start=dt.datetime(2024, 1, 1),
                   history_end=dt.datetime(2024, 1, 29),
                   slide=dt.timedelta(days=slide_d),
                   step=dt.timedelta(days=step_d))
        a = run(sudden_appearance_model, ds2, **kw2)
        b = run(sudden_appearance_model_groups, ds2, **kw2)
        pd.testing.assert_frame_equal(a, b), (slide_d, step_d)
