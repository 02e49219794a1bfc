"""Source connectors: parquet/csv/ndjson readers produce equivalent
normalized tables; CLI runs over any of them."""

import json

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ee_outliers_ray.sources import read_events


@pytest.fixture(scope="module")
def three_formats(tmp_path_factory):
    d = tmp_path_factory.mktemp("src")
    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "event_type": ["click", "view", "error"],
        "ts": ["2024-01-01 10:00:00", "2024-01-02 11:30:00",
               "2024-01-03 12:45:00"],
        "value": [1.5, 2.5, 3.5],
    })
    pq_path = str(d / "e.parquet")
    t = pa.Table.from_pandas(df)
    t = t.set_column(t.column_names.index("ts"), "ts",
                     t["ts"].cast(pa.timestamp("us")))
    pq.write_table(t, pq_path)
    csv_path = str(d / "e.csv")
    df.to_csv(csv_path, index=False)
    json_path = str(d / "e.json")
    with open(json_path, "w") as f:
        for r in df.to_dict("records"):
            f.write(json.dumps(r) + "\n")
    return pq_path, csv_path, json_path


def test_formats_equivalent(three_formats):
    pq_path, csv_path, json_path = three_formats
    frames = {}
    for p in three_formats:
        out = read_events(p, columns=["event_id", "event_type", "ts"],
                          ts_cols=["ts"]).to_pandas()
        out["ts"] = out["ts"].astype("datetime64[us]")
        frames[p] = out.sort_values("event_id").reset_index(drop=True)
    base = frames[pq_path]
    assert str(base["ts"].dtype) == "datetime64[us]"
    for p in (csv_path, json_path):
        pd.testing.assert_frame_equal(base, frames[p], check_dtype=False)


def test_format_inference_and_pruning(three_formats):
    pq_path, csv_path, _ = three_formats
    out = read_events(pq_path, columns=["event_id"]).to_pandas()
    assert list(out.columns) == ["event_id"]
    out2 = read_events(csv_path, columns=["event_id", "value"]).to_pandas()
    assert list(out2.columns) == ["event_id", "value"]
    with pytest.raises(ValueError, match="cannot infer"):
        read_events("/tmp/nonexistent.xyz")


def test_model_over_csv_source(three_formats):
    """A reference-style pipeline runs unchanged over a csv source."""
    _, csv_path, _ = three_formats
    from ee_outliers_ray.query.dsl import filter_by_dsl

    ds = read_events(csv_path, ts_cols=["ts"])
    out = filter_by_dsl(ds, {"range": {"ts": {"gte": "2024-01-02"}}}) \
        .to_pandas()
    assert sorted(out["event_id"]) == [2, 3]


def test_cli_runs_over_csv(tmp_path):
    """The reference-style CLI accepts a csv input end to end."""
    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ee_outliers_ray.__main__ import main

    df = pd.DataFrame({
        "event_id": range(40),
        "event_type": (["click"] * 36) + (["rare"] * 4),
        "user_id": [i % 6 for i in range(36)] + [99, 99, 98, 98],
    })
    src = str(tmp_path / "events.csv")
    df.to_csv(src, index=False)
    uc = tmp_path / "uc.conf"
    uc.write_text("""
[terms_rare]
aggregator=event_type
target=user_id
target_count_method=across_aggregators
trigger_method=pct_of_max_value
trigger_sensitivity=50
trigger_on=low
""")
    out_dir = str(tmp_path / "out")
    rc = main(["run", "--use-cases", str(uc), "--input", src,
               "--output", out_dir])
    assert rc == 0
    t = pq.read_table(out_dir)
    assert t.num_rows == 40
    tagged = t.filter(pc.is_valid(t["outliers"]))
    assert tagged.num_rows == 4  # the 'rare' aggregator's events


def test_sharded_store_roundtrip():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ee_outliers_ray.lookup import ShardedStore

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(100, dtype=np.int64)),
        "v": pa.array((np.arange(100) * 3).astype(np.int64)),
    }))

    def kv(b):
        return (b["k"].to_numpy(zero_copy_only=False),
                b["v"].to_pylist())

    store = ShardedStore(3).build(ds, kv)
    got = store.get_many(np.array([0, 7, 42, 99, 1000]))
    assert got[0] == 0 and got[7] == 21 and got[42] == 126 and got[99] == 297
    assert got[1000] is None


def test_cron_dom_dow_or_semantics():
    """Standard cron: when BOTH day-of-month and day-of-week are
    restricted, either matching fires (OR)."""
    import datetime as dt

    from ee_outliers_ray.cron import CronSchedule

    s = CronSchedule("0 0 15 * 1")  # 15th of month OR Mondays
    t = s.next_run(dt.datetime(2024, 3, 8))  # Friday Mar 8
    assert t == dt.datetime(2024, 3, 11)     # Monday before the 15th
    assert s.next_run(t) == dt.datetime(2024, 3, 15)


def test_infer_format_skips_markers_and_unknowns(tmp_path):
    """A _SUCCESS marker or unknown-extension entry must not break (or
    mis-drive) directory format inference (ADVICE r2)."""
    from ee_outliers_ray.sources import _infer_format

    d = tmp_path / "out"
    d.mkdir()
    (d / "_SUCCESS").write_text("")
    (d / "_manifest.json").write_text("{}")
    (d / "README.txt").write_text("notes")
    (d / "part-0.parquet").write_text("")
    assert _infer_format(str(d)) == "parquet"

    e = tmp_path / "empty"
    e.mkdir()
    (e / "_SUCCESS").write_text("")
    import pytest

    with pytest.raises(ValueError):
        _infer_format(str(e))


def test_normalize_timestamps_iso_variants():
    """ISO-8601 'T' separator, timezone offsets and fractional seconds
    parse through the fallback chain (ADVICE r2)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ee_outliers_ray.sources import normalize_timestamps

    for vals, expect in [
        (["2024-01-03 10:00:00"], np.datetime64("2024-01-03T10:00:00")),
        (["2024-01-03T10:00:00"], np.datetime64("2024-01-03T10:00:00")),
        (["2024-01-03T10:00:00+0100"], np.datetime64("2024-01-03T09:00:00")),
        (["2024-01-03T10:00:00.123456"],
         np.datetime64("2024-01-03T10:00:00.123456")),
        (["2024-01-03"], np.datetime64("2024-01-03T00:00:00")),
    ]:
        ds = ray.data.from_arrow(pa.table({"ts": pa.array(vals)}))
        out = normalize_timestamps(ds, ["ts"]).to_pandas()
        assert out["ts"].dtype == "datetime64[us]"
        assert out["ts"].iloc[0] == expect, (vals, out["ts"].iloc[0])
