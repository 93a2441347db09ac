"""k-core decomposition vs a from-scratch NumPy peeling oracle."""

import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")


def _oracle_kcore(edges):
    """Textbook peeling: repeatedly remove min-degree vertices; core(v) is
    the k at whose peel v leaves."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core = {}
    k = 1
    while adj:
        low = [v for v, ns in adj.items() if len(ns) < k]
        if not low:
            for v in adj:
                core[v] = k
            k += 1
            continue
        for v in low:
            for n in adj.get(v, ()):  # pragma: no branch
                adj[n].discard(v)
            adj.pop(v, None)
    return core


def _run_engine(edges):
    import ray.data as rd

    from near_duplicate_detection_ray.stages.cluster import kcore_decomposition

    tbl = pa.table(
        {
            "a": pa.array([a for a, _ in edges], pa.int64()),
            "b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    out = kcore_decomposition(rd.from_arrow(tbl), max_rounds=500).to_pandas()
    return dict(zip(out["node"], out["core"]))


def test_clique_plus_chain(ray_session):
    # 5-clique (core 4) + a chain hanging off it (core 1)
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    edges = clique + chain
    got = _run_engine(edges)
    want = _oracle_kcore(edges)
    assert got == {int(k): int(v) for k, v in want.items()}
    assert got[0] == 4 and got[12] == 1


def test_random_graph(ray_session):
    rng = np.random.default_rng(3)
    n = 60
    edges = set()
    while len(edges) < 150:
        a, b = sorted(rng.integers(0, n, 2).tolist())
        if a != b:
            edges.add((a, b))
    edges = sorted(edges)
    assert _run_engine(edges) == _oracle_kcore(edges)


def test_empty(ray_session):
    import ray.data as rd

    from near_duplicate_detection_ray.stages.cluster import kcore_decomposition

    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )
    assert kcore_decomposition(rd.from_arrow(empty)).count() == 0
