"""IVF-Flat ANN: correctness pin (full probe == exact brute force), recall on
planted near-dup clusters at bounded nprobe, and quantizer determinism."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def ivf_emb_dir(ray_session, tmp_path_factory):
    """300 embeddings: 250 background + 50 perturbed copies of the first 50
    (cosine ~0.97 to their source)."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal((250, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dups = base[:50] + 0.03 * rng.standard_normal((50, 64))
    mat = np.concatenate([base, dups]).astype(np.float32)
    d = str(tmp_path_factory.mktemp("ivf_emb"))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(range(len(mat))), pa.int64()),
                "embedding": pa.array([row.tolist() for row in mat],
                                      pa.list_(pa.float32())),
                "label": pa.array([0] * len(mat), pa.int32()),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    return d


def test_ivf_full_probe_equals_exact(ivf_emb_dir):
    """nprobe >= n_centroids probes every cell: the IVF plumbing (assignment,
    masking, partial top-k, merge) must reproduce exact cosine_topk
    row-for-row."""
    from near_duplicate_detection_ray.pipelines.ann import ann_ivf_topk, cosine_topk

    exact = cosine_topk(ivf_emb_dir, n_queries=10, k=5).to_pandas()
    ivf = ann_ivf_topk(
        ivf_emb_dir, n_queries=10, k=5, n_centroids=16, nprobe=16
    ).to_pandas()
    assert exact.values.tolist() == ivf.values.tolist()


def test_ivf_bounded_nprobe_recall(ivf_emb_dir):
    """With nprobe=8 of 16 cells, the planted near-duplicate (cos ~0.97, rank-1
    neighbor) must be recalled for >= 90% of queries — near-identical vectors
    land in the same k-means cell, the property IVF exploits."""
    from near_duplicate_detection_ray.pipelines.ann import ann_ivf_topk

    got = ann_ivf_topk(
        ivf_emb_dir, n_queries=50, k=5, n_centroids=16, nprobe=8
    ).to_pandas()
    hit = 0
    for q in range(50):
        neigh = set(got.loc[got["query_id"] == q, "neighbor_id"])
        hit += int(250 + q in neigh)  # planted dup of query q
    assert hit >= 45, f"planted-dup recall {hit}/50 below 0.9"


def test_kmeans_deterministic_and_normalized():
    from near_duplicate_detection_ray.pipelines.ann import _kmeans_centroids

    rng = np.random.default_rng(0)
    mat = rng.standard_normal((500, 32))
    c1 = _kmeans_centroids(mat, 8, 5, seed=7)
    c2 = _kmeans_centroids(mat, 8, 5, seed=7)
    assert np.array_equal(c1, c2)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-12)


def test_ann_filtered_topk_respects_labels(ray_session):
    """Every neighbor shares its query's label, and the result matches the
    DuckDB oracle at sf0.001."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.ann import ann_filtered_topk

    sf = "/root/testdata/sf0.001"
    got = (
        ann_filtered_topk(sf)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["ann_filtered_topk"])
        .df()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    labels = con.execute("SELECT vec_id, label FROM embeddings").df().set_index("vec_id")["label"]
    assert (labels.loc[got["query_id"]].to_numpy()
            == labels.loc[got["neighbor_id"]].to_numpy()).all()


def test_quantize_embeddings_matches_oracle(ray_session):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.ann import quantize_embeddings

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    want = con.execute(entrymod.oracle_sql()["quantize_embeddings"]).df()
    got = quantize_embeddings(sf).to_pandas()
    got = got.sort_values("vec_id").reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values("vec_id").reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # int8 range: codes clamp within [-127, 127] by the symmetric scale
    assert got["max_code"].max() <= 127 and got["min_code"].min() >= -127
    assert (got["max_code"] == 127).any() or (got["min_code"] == -127).any()


def test_label_quality_join_matches_oracle(ray_session):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.ann import label_quality_join

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("embeddings", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = con.execute(entrymod.oracle_sql()["label_quality_join"]).df()
    got = label_quality_join(sf).to_pandas()
    got = got.sort_values("label").reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values("label").reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pq_full_refine_equals_exact(ray_session):
    """refine >= corpus size exactly-scores every row: PQ output must equal
    the exact scan regardless of codebook quality."""
    import pandas as pd

    from near_duplicate_detection_ray.pipelines.ann import ann_pq_topk, cosine_topk

    sf = "/root/testdata/sf0.001"
    exact = cosine_topk(sf).to_pandas().reset_index(drop=True)
    pq_full = ann_pq_topk(sf, refine=10**9).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(pq_full, exact)


def test_pq_bounded_refine_recall(ray_session):
    """Bounded refine stays approximate but must keep high recall vs exact
    on this corpus, and be deterministic across runs."""
    from near_duplicate_detection_ray.pipelines.ann import ann_pq_topk, cosine_topk

    sf = "/root/testdata/sf0.001"
    exact = cosine_topk(sf).to_pandas()
    got = ann_pq_topk(sf, refine=64).to_pandas()
    again = ann_pq_topk(sf, refine=64).to_pandas()
    assert got.equals(again)
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    g = set(zip(got["query_id"], got["neighbor_id"]))
    recall = len(e & g) / len(e)
    assert recall >= 0.8, f"PQ recall {recall} too low"
