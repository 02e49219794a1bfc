"""Decision frontiers + outlier predicate — exact semantics mirror of the
reference (/root/reference/app/helpers/utils.py:308-443), numpy-vectorized
where the reference loops.

Replicated subtleties (SURVEY §7.5.5):
- ``percentile`` computes over the DISTINCT values (utils.py:372
  ``np.percentile(list(set(values_array)), ...)``).
- ``mad``/``madpos``: if the MAD frontier equals the median (MAD == 0),
  fall back to the stdev frontier with sensitivity 1 (utils.py:336-338);
  ``madpos`` clamps the result at >= 0.
- ``stdev`` uses population std (``np.std``) around ``np.nanmean``.
- ``coeff_of_variation`` ignores trigger_on/sensitivity and returns
  sigma/mu itself (the caller compares it to the sensitivity).
"""

from __future__ import annotations

import numpy as np


def get_decision_frontier(trigger_method: str, values, trigger_sensitivity: float,
                          trigger_on: str | None = None) -> float:
    values = np.asarray(values, dtype=np.float64)
    if trigger_method == "percentile":
        return float(np.percentile(np.unique(values), trigger_sensitivity))
    if trigger_method == "pct_of_max_value":
        return float(np.float64(values.max() * (trigger_sensitivity / 100)))
    if trigger_method == "pct_of_median_value":
        return float(np.float64(np.median(values) * (trigger_sensitivity / 100)))
    if trigger_method == "pct_of_avg_value":
        return float(np.float64(values.mean() * (trigger_sensitivity / 100)))
    if trigger_method in ("mad", "madpos"):
        frontier = _mad_frontier(values, trigger_sensitivity, trigger_on)
        if frontier == np.nanmedian(values):
            frontier = _stdev_frontier(values, 1, trigger_on)
        if trigger_method == "madpos":
            frontier = float(max(frontier, 0.0))
        return frontier
    if trigger_method == "stdev":
        return _stdev_frontier(values, trigger_sensitivity, trigger_on)
    if trigger_method == "float":
        return float(trigger_sensitivity)
    if trigger_method == "coeff_of_variation":
        return float(np.std(values) / np.mean(values))
    raise ValueError(f"Unexpected trigger method {trigger_method}")


def _stdev_frontier(values: np.ndarray, sensitivity: float, trigger_on: str | None) -> float:
    stdev = np.std(values)
    if trigger_on == "high":
        return float(np.nanmean(values) + sensitivity * stdev)
    if trigger_on == "low":
        return float(np.nanmean(values) - sensitivity * stdev)
    raise ValueError(f"Unexpected trigger condition {trigger_on}")


def _mad_frontier(values: np.ndarray, sensitivity: float, trigger_on: str | None) -> float:
    mad = np.nanmedian(np.absolute(values - np.nanmedian(values, 0)), 0)
    if trigger_on == "high":
        return float(np.nanmedian(values) + sensitivity * mad)
    if trigger_on == "low":
        return float(np.nanmedian(values) - sensitivity * mad)
    raise ValueError(f"Unexpected trigger condition {trigger_on}")


def is_outlier(value, decision_frontier: float, trigger_on: str):
    """Scalar or vectorized outlier predicate (utils.py:429-443)."""
    if trigger_on == "high":
        return value > decision_frontier
    if trigger_on == "low":
        return value < decision_frontier
    raise ValueError(f"Unexpected outlier trigger condition {trigger_on}")
