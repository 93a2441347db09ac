"""Deterministic mergeable quantile sketch — the scale path for per-group
order statistics when a group no longer fits one block (the exact
``event_value_quantiles`` requires co-locating each group).

Design (compaction sampling, the core idea behind GK/KLL-family sketches,
public literature): a sketch is a sorted (values, weights) pair of at most
``m`` entries.  A raw block becomes a sketch by taking ``m`` evenly-spaced
order statistics, each carrying weight n/m; sketches merge by weighted
merge-sort followed by the same even-rank recompression.  Everything is
plain numpy on sorted arrays — deterministic (no RNG), so re-runs and
arbitrary merge trees give reproducible estimates.

Error: one compression step moves any rank by at most W/m (W = total
weight); a depth-d merge tree accumulates ~d·W/m.  With m = 1024 and the
~2-level trees Ray Data produces, observed rank error on the events table
is well under 1% (pinned by tests/test_sketch.py).  The exact operator
remains the default; this is the documented upgrade path noted in
``relational.event_value_quantiles``.
"""

from __future__ import annotations

import numpy as np

DEFAULT_M = 1024


def sketch_from_values(values: np.ndarray, m: int = DEFAULT_M):
    """Build a (values, weights) sketch from raw values."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = len(v)
    if n == 0:
        return np.empty(0, np.float64), np.empty(0, np.float64)
    if n <= m:
        return v, np.ones(n, np.float64)
    pos = ((np.arange(m, dtype=np.float64) + 0.5) * n / m).astype(np.int64)
    return v[np.clip(pos, 0, n - 1)], np.full(m, n / m, np.float64)


def merge_sketches(parts, m: int = DEFAULT_M):
    """Merge [(values, weights), ...] into one sketch of <= m entries."""
    vs = [p[0] for p in parts if len(p[0])]
    ws = [p[1] for p in parts if len(p[0])]
    if not vs:
        return np.empty(0, np.float64), np.empty(0, np.float64)
    v = np.concatenate(vs)
    w = np.concatenate(ws)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    if len(v) <= m:
        return v, w
    total = w.sum()
    cum = np.cumsum(w) - 0.5 * w  # center-of-mass rank of each entry
    targets = (np.arange(m, dtype=np.float64) + 0.5) * total / m
    idx = np.searchsorted(cum, targets, side="left")
    idx = np.clip(idx, 0, len(v) - 1)
    return v[idx], np.full(m, total / m, np.float64)


def sketch_quantile(values: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Weighted inverted-CDF quantile estimate from a sketch."""
    if len(values) == 0:
        return float("nan")
    cum = np.cumsum(weights)
    target = q * cum[-1]
    i = int(np.searchsorted(cum, target, side="left"))
    return float(values[min(i, len(values) - 1)])
