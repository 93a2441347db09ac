"""HyperLogLog sketch: merge determinism (bit-identical registers under any
split), estimate accuracy vs exact distinct counts, and the query surface."""

import duckdb
import numpy as np
import pytest

from near_duplicate_detection_ray.functions.hashing import splitmix64
from near_duplicate_detection_ray.state.sketch import (
    hll_estimate,
    hll_merge,
    hll_registers,
)

SF = "/root/testdata/sf0.001"


def test_registers_merge_invariant_under_any_split():
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 50_000, size=200_000).astype(np.uint64)
    h = splitmix64(vals)
    whole = hll_registers(h)
    for n_parts in (2, 7, 64):
        parts = [hll_registers(c) for c in np.array_split(h, n_parts)]
        merged = hll_merge(parts)
        assert np.array_equal(merged, whole)
    # idempotent + commutative
    assert np.array_equal(hll_merge([whole, whole]), whole)
    assert np.array_equal(
        hll_merge([hll_registers(h[:1000]), hll_registers(h[1000:])]),
        hll_merge([hll_registers(h[1000:]), hll_registers(h[:1000])]),
    )


@pytest.mark.parametrize("n_distinct", [50, 1_000, 40_000, 300_000])
def test_estimate_error_bound(n_distinct):
    # standard error at p=12 is 1.04/sqrt(4096) = 1.6%; allow ~3 sigma
    h = splitmix64(np.arange(n_distinct, dtype=np.uint64) * np.uint64(2654435761))
    est = hll_estimate(hll_registers(h))
    assert abs(est - n_distinct) / n_distinct <= 0.05


def test_query_matches_exact_within_3pct(ray_session):
    from near_duplicate_detection_ray.pipelines.relational import (
        _HLL_COLS,
        distinct_stats_hll,
    )

    df = distinct_stats_hll(SF).to_pandas()
    got = dict(zip(df["column"], df["approx_distinct"]))
    con = duckdb.connect()
    for table, col in _HLL_COLS:
        exact = con.execute(
            f"SELECT count(DISTINCT {col}) FROM read_parquet('{SF}/{table}.parquet')"
        ).fetchone()[0]
        approx = got[f"{table}.{col}"]
        assert abs(approx - exact) / max(1, exact) <= 0.03, (table, col, approx, exact)
