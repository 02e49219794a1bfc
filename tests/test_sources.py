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
