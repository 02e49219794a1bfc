import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from ee_outliers_ray.functions import (
    flatten_dict,
    get_dotkey_value,
    struct_field_column,
)
from ee_outliers_ray.joins import anti_join, broadcast_join, hash_join, semi_join
from ee_outliers_ray.query.dsl import add_matched_values, build_search, filter_by_dsl


def _events():
    return ray.data.from_pandas(pd.DataFrame({
        "event_id": range(6),
        "event_type": ["click", "view", "click", "error", None, "view"],
        "value": [1.0, 7.5, 9.0, 20.0, 5.0, None],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03",
                              "2024-01-04", "2024-01-05", "2024-01-06"]),
    }))


def test_dsl_term_terms_range_exists():
    out = filter_by_dsl(_events(), {"term": {"event_type": "click"}}).to_pandas()
    assert sorted(out["event_id"]) == [0, 2]
    out = filter_by_dsl(_events(), {"terms": {"event_type": ["view", "error"]}}).to_pandas()
    assert sorted(out["event_id"]) == [1, 3, 5]
    out = filter_by_dsl(_events(), {"range": {"value": {"gte": 5, "lt": 10}}}).to_pandas()
    assert sorted(out["event_id"]) == [1, 2, 4]
    out = filter_by_dsl(_events(), {"exists": {"field": "value"}}).to_pandas()
    assert sorted(out["event_id"]) == [0, 1, 2, 3, 4]


def test_dsl_bool_nesting():
    dsl = {"bool": {
        "must": [{"range": {"value": {"gte": 5}}}],
        "should": [{"term": {"event_type": "click"}},
                   {"term": {"event_type": "view"}}],
        "must_not": [{"term": {"event_id": "1"}}],
    }}
    out = filter_by_dsl(_events(), dsl).to_pandas()
    assert sorted(out["event_id"]) == [2]


def test_dsl_range_timestamp():
    out = filter_by_dsl(_events(), {"range": {"ts": {
        "gte": "2024-01-03", "lte": "2024-01-05"}}}).to_pandas()
    assert sorted(out["event_id"]) == [2, 3, 4]


def test_dsl_list_is_conjunction():
    out = filter_by_dsl(_events(), [
        {"range": {"value": {"gte": 5}}},
        {"term": {"event_type": "view"}},
    ]).to_pandas()
    assert sorted(out["event_id"]) == [1]


def test_build_search_composition():
    out = build_search(
        _events(),
        dsl={"exists": {"field": "value"}},
        ts_col="ts", ts_range=("2024-01-01", "2024-01-04"),
        columns=["event_id", "value"],
        sort_by="value", descending=True, limit=2,
    ).to_pandas()
    assert list(out.columns) == ["event_id", "value"]
    assert list(out["event_id"]) == [3, 2]


def test_matched_values():
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1], "text": ["spark only here", "merge and spark"]}))
    out = add_matched_values(ds, "spark merge").to_pandas().sort_values("doc_id")
    assert list(out["matched_values"].iloc[0]) == ["spark"]
    assert list(out["matched_values"].iloc[1]) == ["merge", "spark"]


def test_broadcast_join():
    small = pd.DataFrame({"event_type": ["click", "view"], "w": [1, 2]})
    out = broadcast_join(_events(), small, "event_type").to_pandas()
    assert sorted(out["event_id"]) == [0, 1, 2, 5]


def test_hash_join_matches_pandas():
    a = pd.DataFrame({"k": [1, 1, 2, 3, 5], "x": list("abcde")})
    b = pd.DataFrame({"k": [1, 2, 2, 4], "y": [10, 20, 21, 40]})
    got = hash_join(ray.data.from_pandas(a), ray.data.from_pandas(b),
                    "k", num_buckets=3).to_pandas()
    want = a.merge(b, on="k")
    key = lambda df: df.sort_values(["k", "x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(got)[["k", "x", "y"]], key(want),
                                  check_dtype=False)


def test_hash_join_overlapping_columns():
    a = pd.DataFrame({"k": [1, 2], "v": ["a1", "a2"]})
    b = pd.DataFrame({"k": [1, 2], "v": ["b1", "b2"]})
    got = hash_join(ray.data.from_pandas(a), ray.data.from_pandas(b),
                    "k").to_pandas().sort_values("k")
    assert list(got.columns) == ["k", "v", "v_r"]
    assert list(got["v"]) == ["a1", "a2"]
    assert list(got["v_r"]) == ["b1", "b2"]


def test_semi_anti_join():
    out = semi_join(_events(), {0, 3}, "event_id").to_pandas()
    assert sorted(out["event_id"]) == [0, 3]
    out = anti_join(_events(), {0, 3}, "event_id").to_pandas()
    assert sorted(out["event_id"]) == [1, 2, 4, 5]


def test_notifier_dedup():
    from ee_outliers_ray.notifier import NotifierActor, notify_outliers

    n = NotifierActor.remote(max_cache_ignore=3)
    ds = ray.data.from_pandas(pd.DataFrame({
        "summary": ["a", "b", "a", "c", "b", "d"]}))
    sent = notify_outliers(ds, n)
    assert sent == 4  # a b c d; dups suppressed
    drained = ray.get(n.drain.remote())
    assert [d["summary"] for d in drained] == ["a", "b", "c", "d"]


def test_dotkey_and_flatten():
    d = {"OsqueryFilter": {"process_name": "x", "Nested": {"v": 1}}}
    assert get_dotkey_value(d, "OsqueryFilter.process_name") == "x"
    assert get_dotkey_value(d, "osqueryfilter.PROCESS_NAME",
                            case_sensitive=False) == "x"
    with pytest.raises(KeyError):
        get_dotkey_value(d, "osqueryfilter.process_name")  # case sensitive
    flat = flatten_dict(d)
    assert flat == {"OsqueryFilter.process_name": "x",
                    "OsqueryFilter.Nested.v": 1}


def test_struct_field_column_and_flatten_ds():
    from ee_outliers_ray.functions import flatten_struct_columns

    t = pa.table({
        "id": [1, 2],
        "meta": pa.array([{"Host": "a", "deep": {"x": 1}},
                          {"Host": "b", "deep": {"x": 2}}]),
    })
    col = struct_field_column(t, "meta.Host")
    assert col.to_pylist() == ["a", "b"]
    col = struct_field_column(t, "META.host", case_sensitive=False)
    assert col.to_pylist() == ["a", "b"]
    ds = ray.data.from_arrow(t)
    flat = flatten_struct_columns(ds).to_pandas()
    assert "meta.Host" in flat.columns and "meta.deep.x" in flat.columns


def test_notifier_email_assembly_and_fake_transport():
    """build_email mirrors the reference's subject/body layout
    (notifier.py:48-55, outlier.py:54-63); a fake transport receives the
    deduped notifications through the actor."""
    import ray
    import ray.data

    from ee_outliers_ray.notifier import (NotifierActor, build_email,
                                          notify_outliers)

    o = {"summary": "rare user u1 in click", "type": "rare user",
         "model_name": "m1", "doc": {"event_id": 7, "user_id": "u1"}}
    msg = build_email(o, from_addr="eo@x", to_addr="soc@x")
    assert msg["Subject"] == "Eagle Eye - outlier alert: rare user u1 in click"
    assert msg["From"] == "eo@x" and msg["To"] == "soc@x"
    body = msg.get_payload()
    assert "outlier\n=======" in body
    assert "summary\t -> rare user u1 in click" in body
    assert "========RAW EVENT========" in body
    assert '"event_id": 7' in body

    sent = []

    @ray.remote
    class Collector:
        def __init__(self):
            self.got = []

        def __call__(self, o):
            self.got.append(o["summary"])

        def add(self, o):
            self.got.append(o["summary"])

        def all(self):
            return self.got

    col = Collector.remote()
    transport = lambda o: ray.get(col.add.remote(o))  # noqa: E731
    n = NotifierActor.remote(max_cache_ignore=10, transport=transport)
    ds = ray.data.from_items([
        {"summary": "a", "event_id": 1},
        {"summary": "a", "event_id": 2},   # deduped
        {"summary": "b", "event_id": 3},
    ])
    assert notify_outliers(ds, n) == 2
    assert sorted(ray.get(col.all.remote())) == ["a", "b"]


def test_asof_join_ties_and_no_match():
    """asof_join determinism: duplicate right timestamps resolve to the
    greatest tie_col; left rows with no eligible right row drop; exact
    ts equality counts as 'at or before'."""
    import pandas as pd
    import ray.data

    from ee_outliers_ray.joins import asof_join

    left = ray.data.from_pandas(pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "ts": pd.to_datetime(["2024-01-05", "2024-01-02", "2024-01-01",
                              "2024-01-09"]).astype("datetime64[us]"),
        "user_id": [7, 7, 7, 8],
    }))
    right = ray.data.from_pandas(pd.DataFrame({
        "event_id": [10, 11, 12, 13, 14],
        "ts": pd.to_datetime(["2024-01-02", "2024-01-02", "2024-01-04",
                              "2024-01-06", "2024-01-01"]
                             ).astype("datetime64[us]"),
        "user_id": [7, 7, 7, 7, 9],
    }))
    out = asof_join(left, right, "user_id", "ts", tie_col="event_id") \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    # event 1 (Jan 5, u7) -> click 12 (Jan 4); event 2 (Jan 2) -> tie on
    # Jan 2 resolves to id 11 (greatest); event 3 (Jan 1) has no prior
    # click; event 4 is user 8 with no clicks at all
    assert out["event_id"].tolist() == [1, 2]
    assert out["event_id_r"].tolist() == [12, 11]
    # the union's typed-null padding must not leak float64 into the
    # output: inner join -> source dtypes survive (int64, not double)
    for c in ("event_id", "user_id", "event_id_r"):
        assert out[c].dtype == "int64", (c, out[c].dtype)
    assert str(out["ts"].dtype) == "datetime64[us]"


def test_hash_join_source_int_column_with_nulls():
    """A source int64 column that ALREADY contains nulls must survive an
    inner hash_join (pre-fix: pandas widened it to float64 with NaN and
    the dtype-restore astype(int64) raised IntCastingNaNError); rows and
    values must match pandas, with the nullable column widened."""
    a = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                  "x": pa.array([10, None, 30], type=pa.int64())})
    b = pa.table({"k": pa.array([1, 2, 2], type=pa.int64()),
                  "y": pa.array([7, 8, 9], type=pa.int64())})
    got = hash_join(ray.data.from_arrow(a), ray.data.from_arrow(b),
                    "k", num_buckets=3).to_pandas() \
        .sort_values(["k", "y"]).reset_index(drop=True)
    assert list(got["k"]) == [1, 2, 2]          # ints restored
    assert got["k"].dtype == np.int64
    assert got["y"].dtype == np.int64
    assert got["x"].isna().tolist() == [False, True, True]
    assert got.loc[0, "x"] == 10


def test_asof_join_source_int_column_with_nulls():
    from ee_outliers_ray.joins import asof_join

    left = pa.table({
        "k": pa.array([1, 1], type=pa.int64()),
        "ts": pa.array([10, 20], type=pa.int64()),
        "tie": pa.array([0, 1], type=pa.int64()),
        "payload": pa.array([None, 5], type=pa.int64()),
    })
    right = pa.table({
        "k": pa.array([1], type=pa.int64()),
        "ts": pa.array([5], type=pa.int64()),
        "tie": pa.array([0], type=pa.int64()),
        "payload": pa.array([None], type=pa.int64()),
    })
    got = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    "k", "ts", tie_col="tie", num_buckets=2).to_pandas() \
        .sort_values("ts").reset_index(drop=True)
    assert len(got) == 2
    assert got["k"].dtype == np.int64 and got["ts"].dtype == np.int64
    assert got["payload"].isna().tolist() == [True, False]
    assert got["payload_r"].isna().all()


def test_join_buckets_derived_from_size():
    """num_buckets=None derives B from input row counts: ~256k rows per
    bucket, clamped to [8, 4096] — the engine's default partitioning
    decision instead of a per-call-site constant."""
    from ee_outliers_ray.joins import _derive_buckets

    assert _derive_buckets(0) == 8
    assert _derive_buckets(100) == 8
    assert _derive_buckets((1 << 18) * 16) == 16
    assert _derive_buckets((1 << 18) * 100 + 1) == 101
    assert _derive_buckets(10**12) == 4096


def test_hash_join_salt_splits_hot_key_and_matches_unsalted():
    """Hot-key salting: one key carrying most of the left side splits
    round-robin across `salt` sub-buckets (per-sub-group payload bounded
    at ~ceil(hot/salt)), the right side replicates, and the join result
    is IDENTICAL to the unsalted join and to pandas."""
    from ee_outliers_ray.joins import _bucket_of, _salted_bucket, hash_join

    rng = np.random.default_rng(7)
    n_hot, salt, B = 5000, 8, 4
    lk = np.concatenate([np.full(n_hot, 42, dtype=np.int64),
                         rng.integers(0, 42, size=500)])
    left = pa.table({"k": pa.array(lk),
                     "x": pa.array(np.arange(len(lk), dtype=np.int64))})
    right = pa.table({"k": pa.array(np.arange(50, dtype=np.int64)),
                      "y": pa.array(np.arange(50, dtype=np.int64) * 10)})

    # partition-level bound: the hot key's rows land in `salt` distinct
    # sub-buckets, each holding at most ceil(n_hot/salt) of them
    base = _bucket_of(pa.array(lk), B)
    bucket = _salted_bucket(base, salt, "a")
    hot = bucket[lk == 42]
    sizes = pd.Series(hot).value_counts()
    assert len(sizes) == salt
    assert sizes.max() <= -(-n_hot // salt) + 1

    want = left.to_pandas().merge(right.to_pandas(), on="k") \
        .sort_values(["k", "x"]).reset_index(drop=True)
    plain = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                      "k", num_buckets=B).to_pandas() \
        .sort_values(["k", "x"]).reset_index(drop=True)
    salted = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                       "k", num_buckets=B, salt=salt).to_pandas() \
        .sort_values(["k", "x"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, want[plain.columns])
    pd.testing.assert_frame_equal(salted, plain)

    with pytest.raises(ValueError, match="salt"):
        hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  "k", num_buckets=B, salt=2, how="outer")
