"""CLI surface: python -m ee_outliers_ray run (in-process main())."""

import pyarrow.compute as pc
import pyarrow.parquet as pq

from ee_outliers_ray.__main__ import main

USE_CASES = """
[terms_rare_users]
aggregator=event_type
target=user_id
target_count_method=within_aggregator
trigger_on=low
trigger_method=pct_of_median_value
trigger_sensitivity=50
outlier_type=rare user
outlier_reason=rarely seen user for type
outlier_summary=rare user {target} in {aggregator}
run_model=1

[metrics_skip_me]
aggregator=event_type
target=value
metric=numerical_value
trigger_method=mad
trigger_sensitivity=1
trigger_on=high
run_model=0
"""


def test_cli_run(tmp_path):
    uc = tmp_path / "uc.conf"
    uc.write_text(USE_CASES)
    out_dir = str(tmp_path / "out")
    rc = main(["run", "--use-cases", str(uc),
               "--input", "/root/testdata/sf0.001/events.parquet",
               "--output", out_dir])
    assert rc == 0
    t = pq.read_table(out_dir)
    assert t.num_rows == 1000
    tagged = t.filter(pc.is_valid(t["outliers"]))
    assert tagged.num_rows > 0
    o = tagged["outliers"][0].as_py()
    assert o["model_type"] == ["terms"]  # run_model=0 section skipped
    assert o["summary"][0].startswith("rare user ")
    assert "outlier" in tagged["tags"][0].as_py()


def test_cli_observations_column(tmp_path):
    """terms/metrics outliers carry the seeded non-outlier sample."""
    import ray.data

    from ee_outliers_ray.models.terms import terms_model

    events = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    out = terms_model(events, "event_type", "user_id",
                      target_count_method="within_aggregator",
                      trigger_method="pct_of_median_value",
                      trigger_sensitivity=50, trigger_on="low").to_pandas()
    assert "non_outlier_values_sample" in out.columns
    if len(out):
        s = out["non_outlier_values_sample"].iloc[0]
        assert s == "" or 1 <= len(s.split(",")) <= 3
        # deterministic across runs
        out2 = terms_model(events, "event_type", "user_id",
                           target_count_method="within_aggregator",
                           trigger_method="pct_of_median_value",
                           trigger_sensitivity=50, trigger_on="low").to_pandas()
        assert sorted(out["non_outlier_values_sample"]) == \
            sorted(out2["non_outlier_values_sample"])
