"""SemDeDup pins: the distributed pipeline must equal a from-scratch NumPy
oracle (same seeded k-means + greedy epsilon-ball prune), and the greedy
invariants must hold (kept rows pairwise below threshold within a cluster;
every dropped row explained by a kept row at/above threshold)."""

import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _load(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _oracle(ids, mat, n_clusters, threshold, seed, iters, train_sample):
    from near_duplicate_detection_ray.pipelines.ann import _kmeans_centroids

    train = mat[ids < train_sample]
    cents = _kmeans_centroids(train, n_clusters, iters, seed)
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    x = mat / n
    sims = x @ cents.T
    cl = np.argmax(sims, axis=1)
    csim = sims[np.arange(len(cl)), cl]
    keep = np.zeros(len(ids), bool)
    for c in np.unique(cl):
        idx = np.flatnonzero(cl == c)
        order = idx[np.lexsort((ids[idx], csim[idx]))]
        kept_rows = []
        for i in order:
            if not kept_rows or max(float(x[j] @ x[i]) for j in kept_rows) < threshold:
                kept_rows.append(i)
                keep[i] = True
    return cl, keep


def test_semdedup_matches_numpy_oracle(ray_session):
    from near_duplicate_detection_ray.pipelines.ann import semdedup_embeddings

    got = (
        semdedup_embeddings(SF, n_clusters=8, threshold=0.85, seed=42)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids, mat = _load(SF)
    cl, keep = _oracle(ids, mat, 8, 0.85, 42, 8, 4096)
    assert got["vec_id"].to_numpy().tolist() == ids.tolist()
    assert got["cluster"].to_numpy().tolist() == cl.tolist()
    assert got["keep"].to_numpy().tolist() == keep.tolist()
    assert 0 < got["keep"].sum() <= len(got)


def test_semdedup_single_cluster_equals_global_greedy(ray_session):
    """n_clusters=1 removes the clustering approximation: the result must be
    the global greedy epsilon-ball prune over the whole corpus."""
    from near_duplicate_detection_ray.pipelines.ann import semdedup_embeddings

    got = (
        semdedup_embeddings(SF, n_clusters=1, threshold=0.8, seed=7)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids, mat = _load(SF)
    _, keep = _oracle(ids, mat, 1, 0.8, 7, 8, 4096)
    assert got["keep"].to_numpy().tolist() == keep.tolist()
    assert (got["cluster"] == 0).all()


def test_semdedup_greedy_invariants(ray_session):
    from near_duplicate_detection_ray.pipelines.ann import semdedup_embeddings

    thr = 0.85
    got = (
        semdedup_embeddings(SF, n_clusters=8, threshold=thr, seed=42)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids, mat = _load(SF)
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    x = mat / n
    pos = {int(v): i for i, v in enumerate(ids)}
    for c, grp in got.groupby("cluster"):
        kept = grp[grp["keep"]]["vec_id"].map(pos).to_numpy()
        dropped = grp[~grp["keep"]]["vec_id"].map(pos).to_numpy()
        if len(kept) > 1:
            sims = x[kept] @ x[kept].T
            np.fill_diagonal(sims, -1.0)
            assert sims.max() < thr, f"cluster {c}: kept pair >= threshold"
        for d in dropped:
            assert (x[kept] @ x[d]).max() >= thr, f"cluster {c}: unexplained drop"


def test_semdedup_salting_cap(ray_session):
    """Skew guard: with a tiny max_cluster_rows the output stays sound
    (every dropped row explained by a kept row >= threshold in its cluster),
    and with a huge cap the result is identical to the unsalted path."""
    from near_duplicate_detection_ray.pipelines.ann import semdedup_embeddings

    thr = 0.85
    base = (
        semdedup_embeddings(SF, n_clusters=4, threshold=thr, seed=42)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    big_cap = (
        semdedup_embeddings(SF, n_clusters=4, threshold=thr, seed=42,
                            max_cluster_rows=10**9)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert big_cap.equals(base), "huge cap must be a no-op"

    salted = (
        semdedup_embeddings(SF, n_clusters=4, threshold=thr, seed=42,
                            max_cluster_rows=16)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert salted["vec_id"].tolist() == base["vec_id"].tolist()
    assert salted["cluster"].tolist() == base["cluster"].tolist()
    ids, mat = _load(SF)
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    x = mat / n
    pos = {int(v): i for i, v in enumerate(ids)}
    # recompute the shard assignment (same sizing rule + SipHash key) so the
    # soundness check runs at SHARD granularity — if salting silently
    # no-opped (cluster-wide greedy), drops explained only by a kept row in
    # a DIFFERENT shard would fail this
    import pandas as pd

    sizes = salted.groupby("cluster").size()
    n_sub = {int(c): max(1, -(-int(s) // 16)) for c, s in sizes.items()}
    assert max(n_sub.values()) > 1, "cap never engaged — test data too small"
    hashed = pd.util.hash_array(
        salted["vec_id"].to_numpy().astype(np.int64),
        hash_key="0123456789123456",
    ).astype(np.int64)
    k = salted["cluster"].map(n_sub).to_numpy()
    salted = salted.assign(shard=hashed % np.maximum(k, 1))
    for (c, sh), grp in salted.groupby(["cluster", "shard"]):
        kept = grp[grp["keep"]]["vec_id"].map(pos).to_numpy()
        for d in grp[~grp["keep"]]["vec_id"].map(pos).to_numpy():
            assert (x[kept] @ x[d]).max() >= thr, \
                f"cluster {c} shard {sh}: unexplained drop"


def test_semdedup_first_init_matches_numpy_oracle(ray_session):
    """The SQL-oracled gate path (init="first", threshold 0.3) must match the
    from-scratch NumPy oracle with the same Forgy-on-first-k init."""
    import numpy as np

    from near_duplicate_detection_ray.pipelines.ann import (
        _kmeans_centroids,
        semdedup_embeddings,
    )

    got = (
        semdedup_embeddings(SF, threshold=0.3, init="first")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids, mat = _load(SF)
    train = mat[ids < 4096]
    cents = _kmeans_centroids(train, 32, 8, 42, init="first")
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    x = mat / n
    sims = x @ cents.T
    cl = np.argmax(sims, axis=1)
    csim = sims[np.arange(len(cl)), cl]
    keep = np.zeros(len(ids), bool)
    for c in np.unique(cl):
        idx = np.flatnonzero(cl == c)
        order = idx[np.lexsort((ids[idx], csim[idx]))]
        kept_rows = []
        for i in order:
            if not kept_rows or max(
                float(x[j] @ x[i]) for j in kept_rows
            ) < 0.3:
                kept_rows.append(i)
                keep[i] = True
    assert got["cluster"].to_numpy().tolist() == cl.tolist()
    assert got["keep"].to_numpy().tolist() == keep.tolist()
    # the prune must actually fire at this threshold (the gate row would be
    # vacuous otherwise)
    assert 0 < got["keep"].sum() < len(got)
