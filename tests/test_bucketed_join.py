"""Bucketed layouts: shuffle-free bucket-local join equals the Dataset hash
join, and mismatched layouts are refused."""

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _norm(df, cols):
    df = df[cols].copy()
    return df.sort_values(cols, kind="mergesort").reset_index(drop=True)


def test_bucketed_join_equals_hash_join(ray_session, tmp_path):
    from near_duplicate_detection_ray.sources.io import (
        bucketed_join,
        read_parquet_clean,
        write_bucketed,
    )

    orders = read_parquet_clean(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda t: t.rename_columns(["okey", "o_totalprice"]),
        batch_format="pyarrow",
    )
    li = read_parquet_clean(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(
        lambda t: t.rename_columns(["okey", "l_quantity"]), batch_format="pyarrow"
    )

    mo = write_bucketed(orders, "okey", str(tmp_path / "orders_b"), n_buckets=8)
    ml = write_bucketed(li, "okey", str(tmp_path / "li_b"), n_buckets=8)
    assert mo["n_buckets"] == 8 and sum(mo["buckets"].values()) == mo["rows"]

    got = bucketed_join(
        str(tmp_path / "orders_b"), str(tmp_path / "li_b"), "okey"
    ).to_pandas()

    import ray.data as rd

    want = (
        read_parquet_clean(f"{SF}/orders.parquet",
                           columns=["o_orderkey", "o_totalprice"])
        .join(
            read_parquet_clean(f"{SF}/lineitem.parquet",
                               columns=["l_orderkey", "l_quantity"]),
            join_type="inner", num_partitions=4,
            on=("o_orderkey",), right_on=("l_orderkey",),
        )
        .to_pandas()
    )
    cols = ["okey", "o_totalprice", "l_quantity"]
    want = want.rename(columns={"o_orderkey": "okey"})
    pd.testing.assert_frame_equal(_norm(got, cols), _norm(want, cols))


def test_layout_mismatch_refused(ray_session, tmp_path):
    from near_duplicate_detection_ray.sources.io import (
        bucketed_join,
        read_parquet_clean,
        write_bucketed,
    )

    orders = read_parquet_clean(f"{SF}/orders.parquet",
                                columns=["o_orderkey"])
    write_bucketed(orders, "o_orderkey", str(tmp_path / "a"), n_buckets=4)
    write_bucketed(orders, "o_orderkey", str(tmp_path / "b"), n_buckets=8)
    with pytest.raises(ValueError, match="disagree"):
        bucketed_join(str(tmp_path / "a"), str(tmp_path / "b"), "o_orderkey")
