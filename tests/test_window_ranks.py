"""Property pins for the SHARED vectorized window-rank kernel
(relational.window_rank_block, the math behind supplier_balance_rank):
rank / dense_rank / percent_rank against pandas on randomized, tie-heavy
groups, plus SQL-NTILE bucket-size laws."""

import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from near_duplicate_detection_ray.pipelines.relational import window_rank_block


def test_rank_kernel_matches_pandas_on_random_ties():
    rng = np.random.default_rng(17)
    for trial in range(5):
        m = int(rng.integers(1, 400))
        df = pd.DataFrame(
            {
                "s_suppkey": np.arange(m),
                "s_nationkey": rng.integers(0, 6, m),
                # coarse balances force heavy ties
                "s_acctbal": rng.integers(0, 5, m).astype(float),
            }
        )
        got = window_rank_block(df)
        g = got.groupby("s_nationkey")
        want_rank = g["bal_c"].rank(method="min", ascending=False).astype(int)
        want_dense = g["bal_c"].rank(method="dense", ascending=False).astype(int)
        assert (got["bal_rank"].to_numpy() == want_rank.to_numpy()).all(), trial
        assert (got["bal_dense_rank"].to_numpy() == want_dense.to_numpy()).all(), trial
        sizes = g["bal_c"].transform("size").to_numpy()
        expect_pct = np.where(
            sizes > 1,
            (got["bal_rank"].to_numpy() - 1) / np.maximum(sizes - 1, 1),
            0.0,
        )
        assert np.array_equal(got["bal_pct_rank"].to_numpy(), expect_pct), trial


def test_ntile_bucket_size_laws():
    rng = np.random.default_rng(23)
    m = 500
    df = pd.DataFrame(
        {
            "s_suppkey": np.arange(m),
            "s_nationkey": rng.integers(0, 7, m),
            "s_acctbal": rng.random(m) * 100,
        }
    )
    got = window_rank_block(df)
    for _, grp in got.groupby("s_nationkey"):
        counts = grp["bal_ntile4"].value_counts().sort_index()
        n, k = len(grp), 4
        assert counts.index.min() == 1 and counts.index.max() == min(k, n)
        # bucket sizes differ by at most one; earlier buckets are the larger
        assert counts.max() - counts.min() <= 1
        assert (counts.sort_index().diff().dropna() <= 0).all()
