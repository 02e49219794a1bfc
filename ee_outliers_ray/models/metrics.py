"""metrics analyzer as a Ray Data plan (reference
/root/reference/app/analyzers/metrics.py).

Stage 1: vectorized metric kernel over the target column inside
``map_batches`` (metrics.py:363-489 -> functions.calculate_metric); rows
whose metric is None are skipped (metrics.py:104, explicit None check — 0
is a valid metric).

Stage 2: ``groupby(aggregator).map_groups`` — per group the whitelist
fixpoint of metrics.py:171-228: frontier over the group's metric values,
flag rows via is_outlier, drop whitelisted flagged rows and recompute;
outliers of an iteration that removed anything are discarded.  The
MIN_EVALUATE_BATCH=100 gate only applies to non-final batches in the
reference (metrics.py:190-194); complete-data evaluation equals
last-batch semantics, so every group is evaluated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import metric_column_with_observations
from .frontier import get_decision_frontier, is_outlier
from .terms import _drop_null_keys, add_key_column
from .whitelist import Whitelist


def _metrics_group_fn(whitelist: Whitelist, trigger_method: str,
                      trigger_sensitivity: float, trigger_on: str):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        agg_value = g["aggregator"].iloc[0]
        alive = g.reset_index(drop=True)
        empty = g.iloc[0:0].copy()
        empty["decision_frontier"] = pd.Series(dtype=np.float64)
        empty["confidence"] = pd.Series(dtype=np.float64)
        empty["non_outlier_values_sample"] = pd.Series(dtype=object)
        while len(alive):
            values = alive["metric"].to_numpy(dtype=np.float64)
            frontier = get_decision_frontier(trigger_method, values,
                                             trigger_sensitivity, trigger_on)
            flagged = np.asarray(is_outlier(values, frontier, trigger_on))
            if not flagged.any():
                return empty
            if not whitelist.empty:
                wl_mask = np.array([
                    flagged[i] and whitelist.matches(
                        {agg_value, str(alive["target"].iloc[i])})
                    for i in range(len(alive))
                ])
                if wl_mask.any():
                    alive = alive[~wl_mask].reset_index(drop=True)
                    continue
            res = alive[flagged].copy()
            res["decision_frontier"] = float(frontier)
            # confidence = |frontier - metric| (metrics.py:286-288)
            res["confidence"] = np.abs(
                float(frontier) - res["metric"].to_numpy(dtype=np.float64))
            from .terms import sample_non_outliers

            res["non_outlier_values_sample"] = sample_non_outliers(
                alive["target"][~flagged].astype(str), agg_value)
            return res
        return empty

    return fn


def metrics_model(ds, aggregator, target: str, *, metric: str,
                  trigger_method: str, trigger_sensitivity: float,
                  trigger_on: str, whitelist: Whitelist | None = None):
    """Returns a Dataset of outlier rows: original columns +
    (aggregator, target, metric, decision_frontier)."""
    import pyarrow as pa

    whitelist = whitelist or Whitelist()
    ds = add_key_column(ds, aggregator, "aggregator")
    ds = add_key_column(ds, target, "target")
    ds = _drop_null_keys(ds, ["aggregator", "target"])

    metric_name = metric

    def _add_metric(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch["target"].to_pylist(), dtype=object)
        m, obs = metric_column_with_observations(metric_name, vals)
        out = batch.append_column("metric", pa.array(m, type=pa.float64()))
        # observation columns ride along to the outlier output
        # (metrics.py:276-311 attaches them to every outlier document)
        for name, col in obs.items():
            out = out.append_column(name, pa.array(col))
        return out.filter(pa.array(~np.isnan(m)))

    ds = ds.map_batches(_add_metric, batch_format="pyarrow")
    return ds.groupby("aggregator").map_groups(
        _metrics_group_fn(whitelist, trigger_method, trigger_sensitivity,
                          trigger_on),
        batch_format="pandas")
