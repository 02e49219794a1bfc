"""Resumable partitioned sink: atomic per-partition writes, skip-on-
resume, lossless read-back."""

import glob
import os

import pandas as pd
import ray.data

from ee_outliers_ray.sinks import read_partitioned, write_partitioned


def _ds(n=500):
    return ray.data.from_pandas(pd.DataFrame({
        "event_id": range(n), "v": [i * 2 for i in range(n)]}))


def test_write_read_roundtrip(tmp_path):
    out = str(tmp_path / "out")
    m = write_partitioned(_ds(), out, "event_id", num_partitions=8)
    assert m["written"] == 8 and m["skipped"] == 0
    back = read_partitioned(out).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    assert len(back) == 500
    assert back["v"].tolist() == [i * 2 for i in range(500)]
    assert len(glob.glob(os.path.join(out, "part=*", "_SUCCESS"))) == 8


def test_resume_skips_finished_partitions(tmp_path):
    import shutil

    out = str(tmp_path / "out")
    write_partitioned(_ds(), out, "event_id", num_partitions=8)
    # simulate a failed run: one partition lost (no _SUCCESS)
    victim = sorted(glob.glob(os.path.join(out, "part=*")))[3]
    shutil.rmtree(victim)
    mtimes = {d: os.path.getmtime(os.path.join(d, "data.parquet"))
              for d in glob.glob(os.path.join(out, "part=*"))}
    m = write_partitioned(_ds(), out, "event_id", num_partitions=8)
    assert m["written"] == 1 and m["skipped"] == 7  # only the victim redone
    for d, old in mtimes.items():  # untouched partitions not rewritten
        assert os.path.getmtime(os.path.join(d, "data.parquet")) == old
    back = read_partitioned(out).to_pandas()
    assert len(back) == 500  # complete again


def test_cli_partitioned_output(tmp_path):
    import glob as g
    import os

    from ee_outliers_ray.__main__ import main

    uc = tmp_path / "uc.conf"
    uc.write_text("""
[terms_rare_users]
aggregator=event_type
target=user_id
target_count_method=within_aggregator
trigger_on=low
trigger_method=pct_of_median_value
trigger_sensitivity=50
""")
    out = str(tmp_path / "enriched")
    rc = main(["run", "--use-cases", str(uc),
               "--input", "/root/testdata/sf0.001/events.parquet",
               "--output", out, "--partitions", "4"])
    assert rc == 0
    assert len(g.glob(os.path.join(out, "part=*", "_SUCCESS"))) == 4
    back = read_partitioned(out).to_pandas()
    assert len(back) == 1000
