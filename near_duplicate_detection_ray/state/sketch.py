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

import math

import numpy as np

DEFAULT_M = 1024


def sketch_from_values(values: np.ndarray, m: int = DEFAULT_M):
    """Build a (values, weights) sketch from raw values.

    NOTE: the ``event_value_quantiles_sketch`` pipeline operator no longer
    calls this generic API — its SQL-oracled rewrite (round 4) inlines a
    deterministic two-level plan with fixed float-op order in
    ``pipelines/relational.py`` so DuckDB can replay it exactly.  These
    functions remain the generic mergeable-sketch library surface (any
    merge tree, no ordering contract) and keep their own error-bound
    tests."""
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


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al. 2007, public literature)
# — the mergeable scale path for COUNT(DISTINCT) when the exact off-driver
# distinct (state/partitioning.distinct_values_ref) would have to hold the
# full value universe.  Registers merge by elementwise max: associative,
# commutative, idempotent — any merge tree gives the identical register
# array (pinned by tests), so estimates are exactly reproducible.

HLL_P = 12  # 4096 registers -> ~1.04/sqrt(4096) = 1.6% standard error


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (frexp on exact 32-bit halves)."""
    hi = (x >> np.uint64(32)).astype(np.float64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.float64)
    bl_hi = np.frexp(hi)[1]
    bl_lo = np.frexp(lo)[1]
    return np.where(hi > 0, 32 + bl_hi, bl_lo).astype(np.int64)


def hll_registers(hashes: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """uint8 register array from uint64 hashes: register index = top p bits,
    value = max rank (leading zeros of the remaining bits + 1)."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if len(hashes) == 0:
        return regs
    h = np.asarray(hashes, np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    # sentinel bit caps rank at 64 - p + 1 (fits uint8)
    rest = (h << np.uint64(p)) | np.uint64(1 << (p - 1))
    rank = (65 - _bit_length_u64(rest)).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    """Elementwise-max merge of register arrays."""
    out = parts[0].copy()
    for p_ in parts[1:]:
        np.maximum(out, p_, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (large-range correction is irrelevant at 64-bit hashes).

    The harmonic sum ``sum(2^-reg)`` is computed as an EXACT integer scaled
    by 2^64 (every term 2^(64-reg) is integral since the sentinel caps rank
    at 65-p <= 64), so the float result is one IEEE divide away from exact
    arithmetic and an SQL oracle summing the same integers reproduces it
    bit-for-bit (same trick as the CMS/KMV exact replays)."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    counts = np.bincount(regs)
    s_scaled = sum(int(c) << (64 - r) for r, c in enumerate(counts) if c)
    est = alpha * m * m * 2**64 / float(s_scaled)
    zeros = int(counts[0])
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return float(est)


# --- Misra-Gries heavy-hitter summaries (mergeable; Agarwal et al., public
# knowledge).  The summary UNDERCOUNTS by at most N/(k+1) total, so any value
# with true frequency > N/(k+1) is guaranteed present in the merged summary —
# callers use it as a CANDIDATE SCREEN and confirm with one exact counting
# pass, making the final output exact and deterministic regardless of merge
# order (only the candidate superset varies, never the confirmed result).


def mg_reduce(values: np.ndarray, counts: np.ndarray, k: int):
    """Reduce exact (value, count) pairs to a <=k-entry Misra-Gries summary:
    subtract the (k+1)-th largest count from everything, keep positives."""
    if len(values) <= k:
        return values, counts
    thresh = np.partition(counts, -(k + 1))[-(k + 1)]
    keep = counts > thresh
    return values[keep], counts[keep] - thresh


def mg_merge(parts: list[tuple[np.ndarray, np.ndarray]], k: int):
    """Merge MG summaries: concatenate, group-sum by value, reduce to k."""
    vals = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, object)
    cnts = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
    if len(vals) == 0:
        return vals, cnts
    uniq, inv = np.unique(vals, return_inverse=True)
    # integer accumulation: float64 bincount weights lose exactness past
    # 2^53 per-value counts, breaking the summary's exactness claim
    summed = np.zeros(len(uniq), np.int64)
    np.add.at(summed, inv, cnts.astype(np.int64))
    return mg_reduce(uniq, summed, k)


# --- Count-Min sketch (Cormode & Muthukrishnan, public literature) ----------
# Mergeable approximate per-key counts: overestimates only, est <= true +
# eps*N with eps = e/width at probability 1 - (1/e)^depth.  Rows use
# deterministic double hashing of pre-hashed uint64 keys, so partial tables
# built per block merge by plain addition in any order/tree shape.

CMS_W = 2048
CMS_D = 4

_CMS_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_CMS_MIX2 = np.uint64(0xBF58476D1CE4E5B9)


def _cms_rows(keys: np.ndarray, w: int, d: int) -> np.ndarray:
    """(d, n) column indices via double hashing (h1 + r*h2 mod w) of uint64
    keys — splitmix64-style mixing, no RNG, identical across processes."""
    k = keys.astype(np.uint64)
    h1 = (k * _CMS_MIX1) >> np.uint64(33)
    h2 = ((k ^ (k >> np.uint64(29))) * _CMS_MIX2) >> np.uint64(31)
    h2 = h2 | np.uint64(1)  # odd stride: full period mod any w
    r = np.arange(d, dtype=np.uint64)[:, None]
    return ((h1[None, :] + r * h2[None, :]) % np.uint64(w)).astype(np.int64)


def cms_table(keys: np.ndarray, counts: np.ndarray, w: int = CMS_W,
              d: int = CMS_D) -> np.ndarray:
    """Build a (d, w) int64 Count-Min table from uint64 keys + counts."""
    table = np.zeros((d, w), dtype=np.int64)
    if len(keys) == 0:
        return table
    idx = _cms_rows(keys, w, d)
    c = np.asarray(counts, dtype=np.int64)
    for r in range(d):
        np.add.at(table[r], idx[r], c)
    return table


def cms_merge(parts: list[np.ndarray]) -> np.ndarray:
    """Merge = elementwise sum (any order, any tree shape)."""
    out = parts[0].copy()
    for p in parts[1:]:
        out += p
    return out


def cms_query(table: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point estimates: min over rows — never underestimates."""
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64)
    d, w = table.shape
    idx = _cms_rows(keys, w, d)
    ests = np.stack([table[r][idx[r]] for r in range(d)])
    return ests.min(axis=0)
