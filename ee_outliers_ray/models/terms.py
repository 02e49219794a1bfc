"""terms analyzer as a Ray Data plan (reference
/root/reference/app/analyzers/terms.py).

Complete-data semantics: the shuffle sees every row of a group, which
equals the reference's final/complete-batch behavior (SURVEY §7.5.4); the
reference's carryover bookkeeping (terms.py:174-177) disappears.

- ``within_aggregator`` (terms.py:312-415): one ``groupby(aggregator)``
  shuffle; per group a whitelist fixpoint loop (terms.py:326-367):
  count targets -> frontier -> flag -> drop whitelisted flagged docs ->
  recompute; outliers from an iteration that removed anything are
  discarded and recomputed.  ``min_target_buckets`` groups yield nothing
  (carried forever in the reference, terms.py:340-343).
- ``across_aggregators`` (terms.py:185-310): distinct-target count per
  aggregator via two cascaded (small) aggregates, GLOBAL frontier over
  the per-aggregator counts, batch-global whitelist fixpoint
  (terms.py:219-227: any removal discards all outliers and recomputes),
  then a broadcast semi-join flags the rows of outlier aggregators.
- ``coeff_of_variation`` (terms.py:383-395): group verdict — cv compared
  against the sensitivity; all docs of a triggering group are flagged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .frontier import get_decision_frontier, is_outlier
from .whitelist import Whitelist

SEP = " - "


def sample_non_outliers(values, group_key: str, k: int = 3) -> str:
    """Deterministic stand-in for the reference's ``random.sample`` of up
    to 3 non-outlier values (terms.py:433-436, metrics.py:276-279):
    seeded per group key so results are stable across runs and
    parallelism levels (the reference samples from a set, which is
    already order-nondeterministic)."""
    import zlib

    vals = sorted(set(values))
    if not vals:
        return ""
    rng = np.random.default_rng(zlib.crc32(str(group_key).encode()))
    k = min(k, len(vals))
    idx = rng.choice(len(vals), size=k, replace=False)
    return ",".join(vals[i] for i in sorted(idx))


def add_key_column(ds, cols: str | list[str], out_name: str,
                   sep: str = SEP):
    """Concat multi-field key with ' - ' (the reference's painless-script
    group key, /root/reference/app/helpers/es.py:796-803), vectorized.
    ``sep`` overrides the joiner (word2vec targets join with the model's
    separator string, reference word2vec.py:228-233)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = [cols] if isinstance(cols, str) else list(cols)

    def _concat(batch: pa.Table) -> pa.Table:
        arrs = [pc.cast(batch[c], pa.string()) for c in cols]
        if len(arrs) == 1:
            key = arrs[0]
        else:
            key = pc.binary_join_element_wise(*arrs, sep)
        return batch.append_column(out_name, key)

    return ds.map_batches(_concat, batch_format="pyarrow")


def _drop_null_keys(ds, names: list[str]):
    import pyarrow as pa
    import pyarrow.compute as pc

    def _f(batch: pa.Table) -> pa.Table:
        mask = None
        for n in names:
            m = pc.is_valid(batch[n])
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask)

    return ds.map_batches(_f, batch_format="pyarrow")


def _within_group_fn(whitelist: Whitelist, trigger_method: str,
                     trigger_sensitivity: float, trigger_on: str,
                     min_target_buckets: int | None):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        agg_value = g["aggregator"].iloc[0]
        alive = g.reset_index(drop=True)
        out = _empty_like(g)
        while True:
            counts = alive["target"].value_counts()
            if min_target_buckets is not None and len(counts) < min_target_buckets:
                return out
            values = counts.to_numpy(dtype=np.float64)
            frontier = get_decision_frontier(trigger_method, values,
                                             trigger_sensitivity, trigger_on)
            per_doc_count = alive["target"].map(counts).to_numpy(dtype=np.float64)
            if trigger_method == "coeff_of_variation":
                flagged = np.full(len(alive), bool(
                    is_outlier(frontier, trigger_sensitivity, trigger_on)))
            else:
                flagged = np.asarray(is_outlier(per_doc_count, frontier, trigger_on))
            if not flagged.any():
                return out
            if not whitelist.empty:
                wl_mask = np.array([
                    flagged[i] and whitelist.matches(
                        {agg_value, alive["target"].iloc[i]})
                    for i in range(len(alive))
                ])
                if wl_mask.any():
                    alive = alive[~wl_mask].reset_index(drop=True)
                    if len(alive) == 0:
                        return out
                    continue  # recompute; this iteration's outliers discarded
            res = alive[flagged].copy()
            res["term_count"] = per_doc_count[flagged]
            res["decision_frontier"] = float(frontier)
            res["non_outlier_values_sample"] = sample_non_outliers(
                alive["target"][~flagged], agg_value)
            return res

    return fn


def _empty_like(g: pd.DataFrame) -> pd.DataFrame:
    e = g.iloc[0:0].copy()
    e["term_count"] = pd.Series(dtype=np.float64)
    e["decision_frontier"] = pd.Series(dtype=np.float64)
    e["non_outlier_values_sample"] = pd.Series(dtype=object)
    return e


def terms_model(ds, aggregator, target, *, target_count_method: str,
                trigger_method: str, trigger_sensitivity: float,
                trigger_on: str, min_target_buckets: int | None = None,
                whitelist: Whitelist | None = None):
    """Returns a Dataset of outlier rows: original columns +
    (aggregator, target, term_count, decision_frontier)."""
    whitelist = whitelist or Whitelist()
    ds = add_key_column(ds, aggregator, "aggregator")
    ds = add_key_column(ds, target, "target")
    ds = _drop_null_keys(ds, ["aggregator", "target"])

    if target_count_method == "within_aggregator":
        return ds.groupby("aggregator").map_groups(
            _within_group_fn(whitelist, trigger_method, trigger_sensitivity,
                             trigger_on, min_target_buckets),
            batch_format="pandas")

    if target_count_method != "across_aggregators":
        raise ValueError(f"unknown target_count_method {target_count_method}")

    # across_aggregators: distinct-count per aggregator = two cascaded
    # DISTRIBUTED aggregates (pair count, then count of pairs per
    # aggregator); only the per-aggregator count table (#aggregators
    # rows) reaches the driver.  The whitelist fixpoint fetches the
    # (aggregator, target) pairs of FLAGGED aggregators only, via a
    # broadcast semi-join on the materialized pair table — the full pair
    # set is never collected (reference terms.py:185-310 evaluates
    # batch-globally; complete-data semantics identical).
    from ray.data.aggregate import Count

    from ..joins import semi_join

    pair_counts = ds.groupby(["aggregator", "target"]).aggregate(
        Count(alias_name="pair_n")).materialize()
    per_agg_pd = pair_counts.groupby("aggregator").aggregate(
        Count(alias_name="n")).to_pandas()
    if per_agg_pd.empty:  # empty input loses its schema through to_pandas
        per_agg_pd = pd.DataFrame(columns=["aggregator", "n"])

    removed_pairs: set[tuple[str, str]] = set()
    removed_per_agg: dict[str, int] = {}
    fetched: dict[str, list[str]] = {}  # flagged agg -> its targets
    base_counts = per_agg_pd.set_index("aggregator")["n"].astype(np.float64)
    while True:
        counts = base_counts
        if removed_per_agg:
            counts = counts.sub(pd.Series(removed_per_agg), fill_value=0)
        counts = counts[counts > 0]
        if len(counts) == 0:
            flagged_aggs = {}
            frontier = float("nan")
            break
        values = counts.to_numpy(dtype=np.float64)
        frontier = get_decision_frontier(trigger_method, values,
                                         trigger_sensitivity, trigger_on)
        flags = is_outlier(values, frontier, trigger_on)
        flagged_aggs = {a: float(c) for a, c, f in
                        zip(counts.index, values, flags) if f}
        if whitelist.empty or not flagged_aggs:
            break
        need = [a for a in flagged_aggs if a not in fetched]
        if need:
            sub = semi_join(pair_counts, set(need), "aggregator") \
                .select_columns(["aggregator", "target"]).to_pandas()
            if not sub.empty:
                for a, g in sub.groupby("aggregator"):
                    fetched[a] = list(g["target"])
            for a in need:
                fetched.setdefault(a, [])
        newly_removed = {
            (a, t) for a in flagged_aggs for t in fetched[a]
            if (a, t) not in removed_pairs and whitelist.matches({a, t})
        }
        if not newly_removed:
            break
        removed_pairs |= newly_removed
        for a, _ in newly_removed:
            removed_per_agg[a] = removed_per_agg.get(a, 0) + 1

    import pyarrow as pa
    import pyarrow.compute as pc

    flagged = flagged_aggs
    removed = removed_pairs
    final_frontier = frontier

    flagged_series = pd.Series(flagged, dtype=np.float64)
    flagged_set = pa.array(list(flagged), type=pa.string())
    removed_keys = pa.array([f"{a}\x1f{t}" for a, t in removed]) \
        if removed else None

    def _flag(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["aggregator"], value_set=flagged_set)
        if removed_keys is not None:
            pair_key = pc.binary_join_element_wise(
                batch["aggregator"], batch["target"], "\x1f")
            mask = pc.and_(mask, pc.invert(
                pc.is_in(pair_key, value_set=removed_keys)))
        sub = batch.filter(mask)
        cnt = flagged_series.reindex(
            sub["aggregator"].to_numpy(zero_copy_only=False)).to_numpy()
        sub = sub.append_column("term_count", pa.array(cnt, type=pa.float64()))
        return sub.append_column(
            "decision_frontier",
            pa.array([final_frontier] * sub.num_rows, type=pa.float64()))

    return ds.map_batches(_flag, batch_format="pyarrow")
