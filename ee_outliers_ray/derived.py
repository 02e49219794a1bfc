"""Derived fields (Grok-pattern extraction) + asset extraction as
stateful actor-pool stages.

Reference: ``extract_derived_fields``
(/root/reference/app/helpers/es.py:489-517) compiles Grok patterns once
per process (cache at es.py:41,502-506) and adds new fields from a source
field before analysis, so derived fields can serve as aggregators /
targets (defaults/outliers.conf:146-150);
``extract_outlier_asset_information``
(/root/reference/app/helpers/utils.py:130-155) pulls configured asset
fields into "type: value" strings.

Here: a minimal Grok -> regex compiler (the pygrok dependency is not in
this environment) supporting the pattern set the reference's defaults
use, compiled ONCE per actor in ``__init__`` and applied vectorized with
``pyarrow.compute.extract_regex`` per batch.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

GROK_PATTERNS = {
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?)",
    "ISO8601_TIMEZONE": r"(?:Z|[+-](?:2[0123]|[01]?[0-9])(?::?(?:[0-5][0-9])))",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "NUMBER": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?))",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def grok_to_regex(pattern: str) -> str:
    """Compile a Grok pattern to a python/RE2 regex with named groups."""

    def sub(m: re.Match) -> str:
        name, alias = m.group(1), m.group(2)
        body = GROK_PATTERNS.get(name)
        if body is None:
            raise KeyError(f"unknown grok pattern %{{{name}}}")
        return f"(?P<{alias}>{body})" if alias else f"(?:{body})"

    return _GROK_REF.sub(sub, pattern)


class DerivedFields:
    """Actor-pool stage: add ``derived_<name>`` columns extracted from
    source columns via Grok patterns (compiled once per actor)."""

    def __init__(self, field_patterns: dict[str, str], prefix: str = "derived_"):
        self.compiled = {
            field: grok_to_regex(pat) for field, pat in field_patterns.items()
        }
        self.group_names = {
            field: list(re.compile(rx).groupindex)
            for field, rx in self.compiled.items()
        }
        self.prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        for field, rx in self.compiled.items():
            if field not in batch.column_names:
                continue
            col = pc.cast(batch[field], pa.string())
            extracted = pc.extract_regex(col, rx)
            for gname in self.group_names[field]:
                vals = pc.struct_field(extracted, gname)
                batch = batch.append_column(self.prefix + gname, vals)
        return batch


def extract_asset_information(batch: pa.Table, asset_fields: dict[str, str],
                              out_col: str = "assets") -> pa.Table:
    """M15: configured asset columns -> list of "type: value" strings per
    row (utils.py:130-155; [assets] section, defaults/outliers.conf:48-80).
    Vectorized per column; null values skipped."""
    n = batch.num_rows
    parts: list[list[str]] = [[] for _ in range(n)]
    for col_name, asset_type in asset_fields.items():
        if col_name not in batch.column_names:
            continue
        vals = pc.cast(batch[col_name], pa.string()).to_pylist()
        for i, v in enumerate(vals):
            if v is not None and v != "":
                parts[i].append(f"{asset_type}: {v}")
    return batch.append_column(
        out_col, pa.array(parts, type=pa.list_(pa.string())))
