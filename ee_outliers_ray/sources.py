"""Input connectors: parquet / csv / ndjson readers with the engine's
schema normalization (typed timestamp[us] at ingest, column pruning).

The reference's only source is the ES scan (S1,
/root/reference/app/helpers/es.py:110-141); a user switching to this
engine points the same pipelines at files instead.  Format is inferred
from the extension unless given.  Timestamp normalization mirrors the
reference's ES date handling (everything becomes a comparable typed
timestamp before analysis; M16).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def _infer_format(path: str) -> str:
    p = path.rstrip("/")
    ext = os.path.splitext(p)[1].lower()
    if ext in (".parquet", ".pq"):
        return "parquet"
    if ext in (".csv", ".tsv"):
        return "csv"
    if ext in (".json", ".jsonl", ".ndjson"):
        return "json"
    if os.path.isdir(p):
        # skip marker/sidecar entries (_SUCCESS, _manifest.json) and keep
        # scanning past unknown extensions — the first recognizable DATA
        # file decides the format
        for f in sorted(os.listdir(p)):
            if f.startswith(("_", ".")):
                continue
            try:
                return _infer_format(os.path.join(p, f))
            except ValueError:
                continue
    raise ValueError(f"cannot infer input format for {path!r}")


# tried in order; first format parsing EVERY non-null value wins
_TS_FORMATS = (
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%d",
)


def _parse_ts_strings(col) -> pa.Array | pa.ChunkedArray:
    """String -> timestamp[us] with a small format-fallback chain:
    space- or T-separated ISO-8601, optional timezone, date-only; a
    direct Arrow string->timestamp cast (which handles fractional
    seconds) is the last resort."""
    for fmt in _TS_FORMATS:
        try:
            parsed = pc.strptime(col, format=fmt, unit="us")
        except pa.ArrowInvalid:
            continue
        return pc.cast(parsed, pa.timestamp("us"))
    return pc.cast(col, pa.timestamp("us"))


def normalize_timestamps(ds, ts_cols: list[str] | None = None):
    """Cast the given (or every timestamp-ish string/ns) column to
    timestamp[us] — the engine-wide unit (CLAUDE.md invariant; parquet
    sources and DuckDB fetchdf both use us)."""

    def f(b: pa.Table) -> pa.Table:
        for name in (ts_cols if ts_cols is not None else b.column_names):
            if name not in b.column_names:
                continue
            col = b[name]
            t = col.type
            if pa.types.is_timestamp(t) and t.unit != "us":
                b = b.set_column(b.column_names.index(name), name,
                                 pc.cast(col, pa.timestamp("us")))
            elif ts_cols is not None and pa.types.is_string(t):
                b = b.set_column(b.column_names.index(name), name,
                                 _parse_ts_strings(col))
        return b

    return ds.map_batches(f, batch_format="pyarrow")


def read_events(path: str, *, fmt: str | None = None,
                columns: list[str] | None = None,
                ts_cols: list[str] | None = None):
    """Read an events table from parquet / csv / ndjson into a Dataset
    with pruned columns and normalized timestamps.

    Parquet prunes columns AT THE READ (only requested columns leave
    storage); csv/json prune right after parse (those formats are
    row-oriented on disk — prefer parquet at scale)."""
    import ray.data

    fmt = fmt or _infer_format(path)
    if fmt == "parquet":
        ds = ray.data.read_parquet(path, columns=columns)
    elif fmt == "csv":
        ds = ray.data.read_csv(path)
        if columns:
            ds = ds.select_columns(columns)
    elif fmt == "json":
        ds = ray.data.read_json(path)
        if columns:
            ds = ds.select_columns(columns)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    return normalize_timestamps(ds, ts_cols)
