"""Mergeable compaction quantile sketch (the GENERIC library API in
state/sketch.py — the event_value_quantiles_sketch operator now inlines its
own SQL-replayable two-level plan, tested below against the exact
operator): determinism, merge-tree rank error, and the operator's own
rank-error bound at a scale where both compaction levels fire."""

import numpy as np
import pytest

from near_duplicate_detection_ray.state.sketch import (
    merge_sketches,
    sketch_from_values,
    sketch_quantile,
)

QS = (0.25, 0.5, 0.9, 0.99)


def _rank_error(x: np.ndarray, q: float, est: float) -> float:
    return abs((np.sort(x) <= est).mean() - q)


def test_sketch_exact_when_small():
    x = np.array([5.0, 1.0, 3.0, 2.0, 4.0])
    v, w = sketch_from_values(x, m=1024)
    assert v.tolist() == sorted(x)
    for q in QS:
        assert sketch_quantile(v, w, q) == np.quantile(x, q, method="inverted_cdf")


def test_sketch_rank_error_bound():
    rng = np.random.default_rng(42)
    x = rng.lognormal(0, 2, size=200_000)  # heavy tail
    v, w = sketch_from_values(x, m=1024)
    for q in QS:
        assert _rank_error(x, q, sketch_quantile(v, w, q)) < 0.01, q


def test_merge_tree_rank_error_and_determinism():
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, size=300_000)
    # split into 30 uneven blocks, sketch each, merge as a 2-level tree
    cuts = np.sort(rng.integers(1, len(x) - 1, size=29))
    blocks = np.split(x, cuts)
    parts = [sketch_from_values(b, m=1024) for b in blocks]
    l1 = [merge_sketches(parts[i : i + 8], m=1024) for i in range(0, len(parts), 8)]
    v, w = merge_sketches(l1, m=1024)
    assert abs(w.sum() - len(x)) < 1e-6  # weight conservation
    for q in QS:
        assert _rank_error(x, q, sketch_quantile(v, w, q)) < 0.02, q
    # determinism: same inputs, same tree -> identical arrays
    parts2 = [sketch_from_values(b, m=1024) for b in blocks]
    l12 = [merge_sketches(parts2[i : i + 8], m=1024) for i in range(0, len(parts2), 8)]
    v2, w2 = merge_sketches(l12, m=1024)
    np.testing.assert_array_equal(v, v2)
    np.testing.assert_array_equal(w, w2)


def test_sketch_quantiles_close_to_exact_operator(ray_session):
    from near_duplicate_detection_ray.pipelines.relational import (
        event_value_quantiles,
        event_value_quantiles_sketch,
    )

    sf = "/root/testdata/sf0.001"
    exact = (
        event_value_quantiles(sf).to_pandas().set_index("event_type").sort_index()
    )
    approx = (
        event_value_quantiles_sketch(sf)
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    assert list(exact.index) == list(approx.index)
    assert (exact["n_events"] == approx["n_events"]).all()
    # values per group are ~2k at sf0.001 (< m) -> sketch should be exact
    for col in ("p25", "p50", "p90", "p99"):
        np.testing.assert_allclose(exact[col], approx[col], rtol=0, atol=1e-12)


def test_mg_screen_confirm_exact(ray_session):
    """Misra-Gries screen + exact confirm == plain exact threshold, even when
    k forces heavy candidate truncation (k=34 counters vs 150 users)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from near_duplicate_detection_ray.pipelines.relational import heavy_hitter_users

    sf = "/root/testdata/sf0.001"
    eps = 0.03  # k = 34
    got = (
        heavy_hitter_users(sf, eps=eps)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    ev = pq.read_table(f"{sf}/events.parquet", columns=["user_id"]).to_pandas()
    cnt = ev.groupby("user_id").size().reset_index(name="n_events")
    want = (
        cnt[cnt["n_events"].astype(float) > float(len(ev)) * eps]
        .sort_values("user_id").reset_index(drop=True)
    )
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()


def test_mg_reduce_guarantee():
    """Every value with true count > N/(k+1) survives mg_reduce/mg_merge."""
    import numpy as np

    from near_duplicate_detection_ray.state.sketch import mg_merge, mg_reduce

    rng = np.random.default_rng(5)
    # skewed multinomial: a few heavy values + long tail
    vals = np.concatenate([np.repeat(np.arange(5), 500),
                           rng.integers(100, 5000, size=3000)])
    rng.shuffle(vals)
    k = 20
    n = len(vals)
    # split into 7 chunks, per-chunk exact counts -> reduce -> merge
    parts = []
    for chunk in np.array_split(vals, 7):
        u, c = np.unique(chunk, return_counts=True)
        parts.append(mg_reduce(u, c.astype(np.int64), k))
    mv, _ = mg_merge(parts, k)
    u, c = np.unique(vals, return_counts=True)
    frequent = set(u[c > n / (k + 1)].tolist())
    assert frequent <= set(mv.tolist()), "guaranteed-frequent value dropped"


def test_cms_bounds_and_merge_invariance():
    """CMS never underestimates; with w=2048, eps*N slack is tiny for these
    volumes.  Merging per-chunk tables in any order equals one-shot build."""
    import numpy as np

    from near_duplicate_detection_ray.state.sketch import (
        CMS_W,
        cms_merge,
        cms_query,
        cms_table,
    )

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, size=200, dtype=np.int64).astype(np.uint64)
    counts = rng.integers(1, 50, size=200).astype(np.int64)
    n_total = int(counts.sum())
    one = cms_table(keys, counts)
    # split into 7 chunks, merge in reversed order
    parts = [
        cms_table(keys[i::7], counts[i::7]) for i in range(7)
    ]
    merged = cms_merge(list(reversed(parts)))
    assert (merged == one).all()
    est = cms_query(merged, keys)
    eps = np.e / CMS_W
    assert (est >= counts).all()
    assert (est <= counts + np.ceil(eps * n_total) + 1).all()


def test_cms_query_matches_exact_counts(ray_session):
    """Low-cardinality probe: every event type's estimate >= exact count and
    within the eps*N overcount bound; deterministic across runs."""
    import duckdb
    import numpy as np

    from near_duplicate_detection_ray.pipelines.relational import (
        event_type_counts_cms,
    )
    from near_duplicate_detection_ray.state.sketch import CMS_W

    sf = "/root/testdata/sf0.001"
    got = event_type_counts_cms(sf).to_pandas().set_index("event_type")["est_n"]
    again = event_type_counts_cms(sf).to_pandas().set_index("event_type")["est_n"]
    assert got.equals(again)
    con = duckdb.connect()
    exact = dict(
        con.execute(
            f"SELECT event_type, count(*) FROM read_parquet('{sf}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    n_total = sum(exact.values())
    eps = np.e / CMS_W
    assert set(got.index) == set(exact)
    for t, e in got.items():
        assert e >= exact[t]
        assert e <= exact[t] + int(np.ceil(eps * n_total)) + 1


def test_operator_rank_error_with_compaction(ray_session):
    """The LIVE operator's error bound at sf0.01, where both level-1 and
    level-2 compaction fire (group sizes ~2000 > m would be false; here
    chunk slices ~1000 with some > 1024 and level-2 entries ~1400 > 1024):
    every reported quantile must sit within 1% rank error of the exact
    per-group distribution."""
    import pyarrow.parquet as pq

    from near_duplicate_detection_ray.pipelines.relational import (
        event_value_quantiles_sketch,
    )

    sf = "/root/testdata/sf0.01"
    got = (
        event_value_quantiles_sketch(sf)
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    ev = pq.read_table(
        f"{sf}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    for et, g in ev.groupby("event_type"):
        x = g["value"].to_numpy()
        for q in QS:
            est = got.loc[et, f"p{int(q*100):02d}"]
            assert _rank_error(x, q, est) < 0.01, (et, q)
