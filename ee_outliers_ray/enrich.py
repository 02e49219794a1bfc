"""Outlier enrichment as derived-dataset columns (never in-place).

Mirrors the reference's document mutation semantics on Arrow columns:

- ``add_outlier_to_document`` (/root/reference/app/helpers/es.py:590-617):
  ``outliers`` is a dict of parallel ARRAYS (type[], reason[], summary[],
  model_name[], model_type[]) plus ``total_outliers``; a second outlier on
  the same doc extends the arrays (skipped if its summary is already
  present) and bumps the counter; ``tags`` gains "outlier" once
  (es.py:635-646).
- summaries are hard-wrapped at 150 chars
  (/root/reference/app/helpers/outlier.py:14-15).
- ``remove_outliers_from_document`` (es.py:620-632) -> drop the struct +
  tag (S6 ``remove_all_outliers``, es.py:358-386).
- ``remove_all_whitelisted_outliers`` (es.py:274-356): re-check every
  outlier entry of tagged docs against the whitelist; rewrite docs whose
  entries thin out; untag docs with none left (S7, the housekeeping job
  as a pure batch pass).

The sink is a new Parquet snapshot (``write_parquet``) — per-partition
atomic files replace the reference's bulk-update retries (S5).
"""

from __future__ import annotations

import textwrap

import pyarrow as pa

from .models.whitelist import Whitelist

OUTLIER_STRUCT = pa.struct([
    ("type", pa.list_(pa.string())),
    ("reason", pa.list_(pa.string())),
    ("summary", pa.list_(pa.string())),
    ("model_name", pa.list_(pa.string())),
    ("model_type", pa.list_(pa.string())),
    # arbitrary per-model config keys, JSON-encoded per entry (the
    # reference copies them verbatim into the outlier document,
    # analyzer.py:125-142); "" when a model has none
    ("extra", pa.list_(pa.string())),
    ("total_outliers", pa.int32()),
])

_ENTRY_KEYS = ("type", "reason", "summary", "model_name", "model_type",
               "extra")


def wrap_summary(s: str) -> str:
    return textwrap.fill(s, width=150)


def _merge_entry(cur: dict | None, entry: dict) -> dict:
    if cur is None:
        return {**{k: [entry.get(k, "")] for k in _ENTRY_KEYS},
                "total_outliers": 1}
    if entry["summary"] in cur["summary"]:
        return cur
    out = {k: list(cur.get(k) or []) for k in _ENTRY_KEYS}
    for k in out:
        out[k].append(entry.get(k, ""))
    out["total_outliers"] = cur["total_outliers"] + 1
    return out


def _merge_table(b: pa.Table, store: dict, id_col: str, tags_col: str,
                 outliers_col: str) -> pa.Table:
    """Merge ``store`` (id -> list of wrapped entry dicts) into one Arrow
    batch: the shared kernel behind the broadcast (`apply_outliers`) and
    sharded (`apply_outliers_sharded`) enrichment paths."""
    import numpy as np
    import pyarrow.compute as pc

    ids = b[id_col].to_numpy(zero_copy_only=False)
    has_prior = outliers_col in b.column_names
    # vectorized sparse fast path: only rows whose id carries a new
    # entry (pc.is_in against the entry-id set) run the Python merge;
    # untouched rows keep their existing enrichment (or nulls) with
    # no per-row work — outliers are sparse relative to the corpus
    key_set = pa.array(np.fromiter(store.keys(), dtype=np.int64,
                                   count=len(store)))
    hit_mask = pc.is_in(pc.cast(b[id_col], pa.int64()),
                        value_set=key_set).to_numpy(zero_copy_only=False)
    hit_idx = np.flatnonzero(hit_mask)

    cur_outliers = (b[outliers_col].to_pylist()
                    if has_prior else [None] * len(ids))
    cur_tags = (b[tags_col].to_pylist()
                if tags_col in b.column_names else [None] * len(ids))
    new_outliers = list(cur_outliers)
    new_tags = [list(t) if t else [] for t in cur_tags] \
        if (tags_col in b.column_names or len(hit_idx)) \
        else [[] for _ in range(len(ids))]
    for i in hit_idx:
        cur = cur_outliers[i]
        for e in store[int(ids[i])]:
            cur = _merge_entry(cur, e)
        new_outliers[i] = cur
        if cur is not None and "outlier" not in new_tags[i]:
            new_tags[i].append("outlier")
    # rows with PRIOR enrichment must keep their tag even off-path
    if has_prior:
        for i in np.flatnonzero(~hit_mask):
            if cur_outliers[i] is not None and \
                    "outlier" not in new_tags[i]:
                new_tags[i].append("outlier")
    cols = {n: b[n] for n in b.column_names
            if n not in (tags_col, outliers_col)}
    cols[tags_col] = pa.array(new_tags, type=pa.list_(pa.string()))
    cols[outliers_col] = pa.array(new_outliers, type=OUTLIER_STRUCT)
    return pa.table(cols)


def apply_outliers(ds, outlier_entries: dict[int, list[dict]],
                   id_col: str = "doc_id", tags_col: str = "tags",
                   outliers_col: str = "outliers"):
    """Derive an enriched dataset: docs in ``outlier_entries`` gain the
    outliers struct + the "outlier" tag; existing enrichment merges.

    ``outlier_entries``: doc_id -> list of {type, reason, summary,
    model_name, model_type} (summaries pre-template-substituted; wrapped
    here).  Broadcast via ray.put (small side: outliers are sparse).
    For corpus-scale outlier volumes use ``apply_outliers_sharded``.
    """
    import ray

    wrapped = {
        d: [dict(e, summary=wrap_summary(e["summary"])) for e in entries]
        for d, entries in outlier_entries.items()
    }
    ref = ray.put(wrapped)

    def f(b: pa.Table) -> pa.Table:
        return _merge_table(b, ray.get(ref), id_col, tags_col, outliers_col)

    return ds.map_batches(f, batch_format="pyarrow")


ENTRY_ROW_FIELDS = ("type", "reason", "summary", "model_name",
                    "model_type", "extra")


def apply_outliers_sharded(ds, entries_ds, id_col: str = "doc_id",
                           tags_col: str = "tags",
                           outliers_col: str = "outliers",
                           num_shards: int = 8):
    """Distributed enrichment for corpus-scale outlier volumes (the
    documented swap for the driver dict, VERDICT r2 item 5).

    ``entries_ds``: a Dataset of entry ROWS — one per (doc, model hit) —
    with columns (id_col, type, reason, summary, model_name, model_type,
    extra).  The rows are pushed hash-sharded into the actor store in
    APPEND mode (map tasks push straight to the owning shards; the
    driver never sees them), then the corpus streams through one
    ``map_batches`` that fetches each batch's ids and merges — no corpus
    shuffle, no driver-side entry state.
    """
    from .lookup import ShardedStore

    def make_kv(b: pa.Table):
        import numpy as np

        ids = pa.compute.cast(b[id_col], pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {k: b[k].to_pylist() for k in ENTRY_ROW_FIELDS}
        seq = (b["seq"].to_pylist() if "seq" in b.column_names
               else [0] * len(ids))
        vals = [{"type": cols["type"][i], "reason": cols["reason"][i],
                 "summary": wrap_summary(cols["summary"][i]),
                 "model_name": cols["model_name"][i],
                 "model_type": cols["model_type"][i],
                 "extra": cols["extra"][i], "seq": seq[i]}
                for i in range(len(ids))]
        return ids, vals

    store = ShardedStore(num_shards).build(entries_ds, make_kv,
                                           append=True)

    def f(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = pa.compute.cast(b[id_col], pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        found = store.get_many(ids)
        # parallel pushers append in arrival order — sort by (seq,
        # summary) so the struct arrays are deterministic across runs
        # (seq = the CLI's model iteration order)
        local = {k: sorted(v, key=lambda e: (e["seq"], e["summary"]))
                 for k, v in found.items() if v}
        return _merge_table(b, local, id_col, tags_col, outliers_col)

    return ds.map_batches(f, batch_format="pyarrow")


def remove_all_outliers(ds, tags_col: str = "tags",
                        outliers_col: str = "outliers"):
    """S6: project away the enrichment; strip the tag (es.py:358-386)."""

    def f(b: pa.Table) -> pa.Table:
        cols = {n: b[n] for n in b.column_names if n != outliers_col}
        if tags_col in cols:
            tags = [[t for t in (row or []) if t != "outlier"]
                    for row in b[tags_col].to_pylist()]
            cols[tags_col] = pa.array(tags, type=pa.list_(pa.string()))
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def remove_whitelisted_outliers(ds, whitelist: Whitelist,
                                tags_col: str = "tags",
                                outliers_col: str = "outliers"):
    """S7 housekeeping: for each tagged doc re-check every outlier entry
    against the whitelist (values set = doc's stringified values + the
    entry's own fields, mirroring Outlier.is_whitelisted_doc); drop
    whitelisted entries, untag docs left with none (es.py:274-356)."""

    def f(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if outliers_col not in b.column_names:
            return b
        # vectorized fast path: batches with no enriched rows pass
        # through untouched (tagged docs are sparse in the corpus)
        n_tagged = pc.sum(pc.is_valid(b[outliers_col])).as_py() or 0
        if n_tagged == 0:
            return b
        outliers = b[outliers_col].to_pylist()
        tags = b[tags_col].to_pylist() if tags_col in b.column_names \
            else [None] * b.num_rows
        other_cols = [n for n in b.column_names
                      if n not in (tags_col, outliers_col)]
        rows_values = None
        new_outliers, new_tags = [], []
        for i, cur in enumerate(outliers):
            if cur is None or not cur.get("summary"):
                new_outliers.append(cur)
                new_tags.append(tags[i])
                continue
            if rows_values is None:
                rows_values = [
                    {str(b[n][j].as_py()).strip() for n in other_cols}
                    for j in range(b.num_rows)
                ]
            keep_idx = []
            for k in range(len(cur["summary"])):
                values = set(rows_values[i]) | {
                    cur["type"][k], cur["reason"][k], cur["summary"][k],
                    cur["model_name"][k], cur["model_type"][k]}
                if not whitelist.matches(values):
                    keep_idx.append(k)
            if len(keep_idx) == len(cur["summary"]):
                new_outliers.append(cur)
                new_tags.append(tags[i])
            elif keep_idx:
                n = len(cur["summary"])
                kept = {key: [(cur.get(key) or [""] * n)[k]
                              for k in keep_idx]
                        for key in _ENTRY_KEYS}
                kept["total_outliers"] = len(keep_idx)
                new_outliers.append(kept)
                new_tags.append(tags[i])
            else:
                new_outliers.append(None)
                new_tags.append([t for t in (tags[i] or [])
                                 if t != "outlier"])
        cols = {n: b[n] for n in other_cols}
        cols[tags_col] = pa.array(
            [t if t is not None else [] for t in new_tags],
            type=pa.list_(pa.string()))
        cols[outliers_col] = pa.array(new_outliers, type=OUTLIER_STRUCT)
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")
