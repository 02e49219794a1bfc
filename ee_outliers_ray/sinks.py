"""Resumable partitioned Parquet sink.

The brief's output contract for 100 TB runs: write one directory per
key-range partition with an atomic completion marker, so a failed run
re-executes ONLY the missing partitions — never one giant file, never a
full rewrite.  (The reference's bulk-update sink retries per action,
/root/reference/app/helpers/es.py:406-469; here the partition is the
retry/resume unit, like the index build's per-bucket segments.)

Layout:
    out_dir/part=00007/data.parquet     (tmp+rename, atomic)
    out_dir/part=00007/_SUCCESS         (completion marker)
    out_dir/_manifest.json              (partition count + key column)
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .hashing import hash_any_array


def write_partitioned(ds, out_dir: str, id_col: str,
                      num_partitions: int = 16) -> dict:
    """Write ``ds`` as ``num_partitions`` hash-partitioned directories.

    One shuffle co-locates each partition's rows; each partition task
    writes atomically (tmp+rename, then a _SUCCESS marker) and SKIPS
    partitions already marked complete — rerunning after a failure
    redoes only missing partitions.  Returns a summary manifest."""
    os.makedirs(out_dir, exist_ok=True)

    def add_part(b: pa.Table) -> pa.Table:
        part = (hash_any_array(b[id_col]) % np.uint64(num_partitions)) \
            .astype(np.int32)
        return b.append_column("_part", pa.array(part))

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["_part"].iloc[0])
        d = os.path.join(out_dir, f"part={part:05d}")
        marker = os.path.join(d, "_SUCCESS")
        if os.path.exists(marker):
            return pd.DataFrame({"part": [part], "rows": [-1],
                                 "skipped": [True]})
        os.makedirs(d, exist_ok=True)
        out = g.drop(columns=["_part"]).sort_values(id_col, kind="stable")
        tmp = os.path.join(d, f"data.parquet.tmp{os.getpid()}")
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False), tmp)
        os.rename(tmp, os.path.join(d, "data.parquet"))
        open(marker, "w").close()
        return pd.DataFrame({"part": [part], "rows": [len(out)],
                             "skipped": [False]})

    results = ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(write_group, batch_format="pandas") \
        .to_pandas()
    manifest = {
        "num_partitions": num_partitions,
        "id_col": id_col,
        "written": int((~results["skipped"]).sum()) if len(results) else 0,
        "skipped": int(results["skipped"].sum()) if len(results) else 0,
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def read_partitioned(out_dir: str):
    """Read back a partitioned sink as one Dataset (complete partitions
    only)."""
    import glob as globlib

    import ray.data

    files = sorted(
        os.path.join(d, "data.parquet")
        for d in globlib.glob(os.path.join(out_dir, "part=*"))
        if os.path.exists(os.path.join(d, "_SUCCESS")))
    return ray.data.read_parquet(files)
