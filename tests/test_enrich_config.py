import textwrap

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ee_outliers_ray.enrich import (
    apply_outliers,
    remove_all_outliers,
    remove_whitelisted_outliers,
    wrap_summary,
)
from ee_outliers_ray.models.config import load_use_cases, run_model
from ee_outliers_ray.models.whitelist import Whitelist


def _docs():
    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a", "b", "c"],
    }))


def _entry(summary, model="m1", typ="t", reason="r"):
    return {"type": typ, "reason": reason, "summary": summary,
            "model_name": model, "model_type": "terms"}


def test_apply_outliers_basic():
    out = apply_outliers(_docs(), {1: [_entry("sus doc")]}).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["outliers"][0] is None and list(out["tags"][0]) == []
    o = out["outliers"][1]
    assert list(o["summary"]) == ["sus doc"] and o["total_outliers"] == 1
    assert list(out["tags"][1]) == ["outlier"]


def test_apply_outliers_merge_and_dedup():
    ds = apply_outliers(_docs(), {1: [_entry("first"), _entry("second", "m2")]})
    ds = apply_outliers(ds, {1: [_entry("first")]})  # dup summary ignored
    out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    o = out["outliers"][1]
    assert list(o["summary"]) == ["first", "second"]
    assert list(o["model_name"]) == ["m1", "m2"]
    assert o["total_outliers"] == 2
    assert list(out["tags"][1]) == ["outlier"]  # tag added once


def test_summary_wrap_150():
    long = "word " * 60
    assert wrap_summary(long) == textwrap.fill(long, width=150)


def test_remove_all_outliers():
    ds = apply_outliers(_docs(), {0: [_entry("x")]})
    out = remove_all_outliers(ds).to_pandas().sort_values("doc_id")
    assert "outliers" not in out.columns
    assert all("outlier" not in list(t) for t in out["tags"])


def test_remove_whitelisted_outliers():
    ds = apply_outliers(_docs(), {
        0: [_entry("benign thing"), _entry("bad thing")],
        1: [_entry("benign thing")],
    })
    wl = Whitelist.from_config(literal_entries=["benign thing"])
    out = remove_whitelisted_outliers(ds, wl).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert list(out["outliers"][0]["summary"]) == ["bad thing"]
    assert out["outliers"][0]["total_outliers"] == 1
    assert out["outliers"][1] is None
    assert "outlier" not in list(out["tags"][1])
    assert "outlier" in list(out["tags"][0])


USE_CASE = """
[terms_rare_users]
es_query_filter=*
aggregator=event_type
target=user_id
target_count_method=within_aggregator
trigger_on=low
trigger_method=pct_of_median_value
trigger_sensitivity=50
run_model=1

[metrics_props_len]
aggregator=event_type
target=props
metric=length
trigger_method=stdev
trigger_sensitivity=1
trigger_on=high

[whitelist_literals]
w1=benign, pair

[whitelist_regexps]
r1=^ok-.*$
"""


def test_load_use_cases(tmp_path):
    p = tmp_path / "uc.conf"
    p.write_text(USE_CASE)
    cfgs = load_use_cases(str(p))
    assert [c.model_type for c in cfgs] == ["terms", "metrics"]
    assert cfgs[0].model_name == "rare_users"
    assert cfgs[0].get("trigger_sensitivity", cast=float) == 50.0
    assert len(cfgs[0].whitelist.literals) == 1
    assert cfgs[0].whitelist.literals[0] == frozenset({"benign", "pair"})
    assert len(cfgs[0].whitelist.regexps) == 1


def test_run_model_from_config(tmp_path):
    p = tmp_path / "uc.conf"
    p.write_text(USE_CASE)
    cfgs = load_use_cases(str(p))
    events = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    out = run_model(cfgs[0], events).to_pandas()
    # matches the direct pipeline invocation
    from ee_outliers_ray.pipelines import terms_within_median

    direct = terms_within_median("/root/testdata/sf0.001")
    assert sorted(out["event_id"]) == sorted(direct["event_id"])


def test_run_model_defaults_fallback(tmp_path):
    p = tmp_path / "uc.conf"
    p.write_text("[terms_t]\naggregator=a\ntarget=b\n"
                 "target_count_method=within_aggregator\ntrigger_on=low\n")
    cfgs = load_use_cases(str(p), defaults={
        "terms": {"trigger_method": "float", "trigger_sensitivity": "2"}})
    assert cfgs[0].get("trigger_method") == "float"
    assert cfgs[0].get("trigger_sensitivity", cast=float) == 2.0


def test_word2vec_model_runs():
    import numpy as np

    rows = []
    normal = ["open file read", "open file write", "read file close",
              "open read close"]
    for i in range(20):
        rows.append({"doc_id": i, "agg": "A", "cmd": normal[i % len(normal)]})
    rows.append({"doc_id": 99, "agg": "A", "cmd": "zz qq xx yy ww vv"})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    from ee_outliers_ray.models.word2vec import word2vec_model

    out = word2vec_model(ds, "agg", "cmd", trigger_method="stdev",
                         trigger_sensitivity=1, trigger_on="low").to_pandas()
    # deterministic across runs
    out2 = word2vec_model(ds, "agg", "cmd", trigger_method="stdev",
                          trigger_sensitivity=1, trigger_on="low").to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # the gibberish sentence is the least probable and must be flagged
    assert 99 in set(out["doc_id"])
    assert out[out["doc_id"] == 99]["w2v_score"].iloc[0] == out["w2v_score"].min()


def test_derived_fields_and_assets():
    from ee_outliers_ray.derived import DerivedFields, extract_asset_information

    b = pa.table({
        "ts_str": ["2024-03-07T12:34:56+00:00", "not a date"],
        "user": ["alice", None],
        "host": ["web1", "web2"],
    })
    stage = DerivedFields({"ts_str": "%{YEAR:y}-%{MONTHNUM:mo}-%{MONTHDAY:d}[T ]%{HOUR:h}:?%{MINUTE:mi}"})
    out = stage(b)
    assert out["derived_y"][0].as_py() == "2024"
    assert out["derived_mo"][0].as_py() == "03"
    assert out["derived_y"][1].as_py() is None
    out2 = extract_asset_information(b, {"user": "user", "host": "host"})
    assert out2["assets"][0].as_py() == ["user: alice", "host: web1"]
    assert out2["assets"][1].as_py() == ["host: web2"]


def test_config_derived_fields_and_highlight(tmp_path):
    import ray.data

    uc = tmp_path / "uc.conf"
    uc.write_text("""
[simplequery_find_spark]
es_query_filter=spark
highlight_match=1
text_field=text

[terms_by_year]
aggregator=derived_y
target=doc_id
target_count_method=within_aggregator
trigger_method=float
trigger_sensitivity=2
trigger_on=low
use_derived_fields=1

[derivedfields]
ts_str=%{YEAR:y}-%{MONTHNUM:mo}
""")
    cfgs = load_use_cases(str(uc))
    assert cfgs[0].derived_fields == {"ts_str": "%{YEAR:y}-%{MONTHNUM:mo}"}
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["spark here", "no match", "spark and merge"],
        "ts_str": ["2024-03-01", "2023-05-01", "2024-06-01"],
    }))
    sq = run_model(cfgs[0], ds).to_pandas()
    assert sorted(sq["doc_id"]) == [0, 2]
    assert list(sq.sort_values("doc_id")["matched_values"].iloc[0]) == ["spark"]
    tm = run_model(cfgs[1], ds).to_pandas()
    # derived_y: 2024 x2, 2023 x1 -> each doc_id unique (count 1 < 2): all flagged
    assert len(tm) == 3
    assert set(tm["aggregator"]) == {"2024", "2023"}


def test_config_training_pct(tmp_path):
    import ray.data

    uc = tmp_path / "uc.conf"
    uc.write_text("""
[metrics_sampled]
aggregator=event_type
target=value
metric=numerical_value
trigger_method=mad
trigger_sensitivity=1
trigger_on=high
training_data_size_pct=10
""")
    cfgs = load_use_cases(str(uc))
    events = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    out1 = run_model(cfgs[0], events).to_pandas()
    out2 = run_model(cfgs[0], events).to_pandas()
    # seeded sample -> deterministic, and far fewer rows than the full run
    assert sorted(out1["event_id"]) == sorted(out2["event_id"])


def test_grok_library_and_custom_patterns():
    from ee_outliers_ray.derived import DerivedFields, grok_to_regex
    import re as _re

    # nested standard patterns compile and match
    rx = grok_to_regex("%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:lvl} %{IP:ip}")
    m = _re.search(rx, "2024-03-07T12:34:56Z ERROR 10.1.2.3 boom")
    assert m and m.group("lvl") == "ERROR" and m.group("ip") == "10.1.2.3"
    rx2 = grok_to_regex("%{URI:uri}")
    assert _re.search(rx2, "go https://example.com:8443/a/b?x=1 now") \
        .group("uri").startswith("https://example.com")
    # custom patterns extend the library (pygrok custom dirs parity)
    rx3 = grok_to_regex("%{TICKET:t}",
                        custom_patterns={"TICKET": r"[A-Z]{2,5}-%{POSINT}"})
    assert _re.search(rx3, "see ABC-1234.").group("t") == "ABC-1234"

    stage = DerivedFields({"msg": "%{LOGLEVEL:level}: %{GREEDYDATA:rest}"})
    b = pa.table({"msg": ["WARN: disk low", "no level here"]})
    out = stage(b)
    assert out["derived_level"].to_pylist() == ["WARN", None]


def test_grok_patterns_section_in_config(tmp_path):
    from ee_outliers_ray.models.config import load_use_cases

    p = tmp_path / "uc.conf"
    p.write_text("""
[grok_patterns]
TICKET=[A-Z]{2,5}-%{POSINT}

[derivedfields]
msg=%{TICKET:ticket}

[terms_t]
aggregator=a
target=b
use_derived_fields=1
target_count_method=within_aggregator
trigger_method=float
trigger_sensitivity=2
trigger_on=low
""")
    cfgs = load_use_cases(str(p))
    assert cfgs[0].custom_grok == {"ticket": "[A-Z]{2,5}-%{POSINT}"} or \
        cfgs[0].custom_grok == {"TICKET": "[A-Z]{2,5}-%{POSINT}"}


def test_word2vec_requires_trigger_score(tmp_path):
    """A word2vec use case omitting trigger_score must fail loudly
    (reference analyzers/word2vec.py:114-116), not default silently."""
    import pytest

    from ee_outliers_ray.models.config import load_use_cases

    conf = tmp_path / "w2v.conf"
    conf.write_text("""
[word2vec_testcase]
es_query_filter=*
aggregator=agg
target=cmd
trigger_focus=text
""")
    cfgs = load_use_cases(str(conf))
    from ee_outliers_ray.models.config import run_model
    import ray.data
    import pyarrow as pa

    ds = ray.data.from_arrow(pa.table({"agg": ["a"], "cmd": ["x y"]}))
    with pytest.raises(ValueError, match="trigger_score"):
        run_model(cfgs[0], ds)


def test_enrichment_snapshot_sharded_path_identical(monkeypatch):
    """Forcing the row gate to 0 sends the enrichment queries() entry
    down apply_outliers_sharded; output must equal the driver-dict
    path (and hence the driver oracle)."""
    from ee_outliers_ray import pipelines as P

    sf = "/root/testdata/sf0.001"
    want = P.enrichment_snapshot(sf).sort_values("event_id") \
        .reset_index(drop=True)
    monkeypatch.setattr(P, "_ENRICH_SHARDED_MIN_ROWS", 0)
    got = P.enrichment_snapshot(sf).sort_values("event_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(want) > 0
