"""Skew-salted join: identical output to a plain hash join on a corpus with
one pathologically hot key, and hot-key detection finds exactly that key."""

import sys

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")


def _tables():
    rng = np.random.default_rng(7)
    # fact: 5000 rows, key 1 holds 60% (the straggler partition)
    keys = np.where(rng.random(5000) < 0.6, 1, rng.integers(2, 50, 5000))
    fact = pa.table(
        {
            "k": pa.array(keys, pa.int64()),
            "x": pa.array(rng.integers(0, 1000, 5000), pa.int64()),
        }
    )
    build = pa.table(
        {
            "bk": pa.array(np.arange(1, 50), pa.int64()),
            "label": pa.array([f"lab{v}" for v in range(1, 50)], pa.string()),
        }
    )
    return fact, build


def _norm(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


def test_hot_key_detection(ray_session):
    import ray.data as rd

    from near_duplicate_detection_ray.stages.skewjoin import hot_keys

    fact, _ = _tables()
    ds = rd.from_arrow(fact)
    assert hot_keys(ds, "k", threshold=1000) == [1]
    assert hot_keys(ds, "k", threshold=10_000) == []


def test_salted_join_equals_plain_join(ray_session):
    import ray.data as rd

    from near_duplicate_detection_ray.stages.skewjoin import salted_join

    fact, build = _tables()
    got = salted_join(
        rd.from_arrow(fact), rd.from_arrow(build), "k", right_key="bk",
        hot_threshold=1000, n_salt=4, num_partitions=4,
    ).to_pandas()

    want = (
        rd.from_arrow(fact)
        .join(
            rd.from_arrow(build), join_type="inner", num_partitions=4,
            on=("k",), right_on=("bk",),
        )
        .to_pandas()
    )
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_no_hot_keys_is_plain_join(ray_session):
    import ray.data as rd

    from near_duplicate_detection_ray.stages.skewjoin import salted_join

    fact, build = _tables()
    got = salted_join(
        rd.from_arrow(fact), rd.from_arrow(build), "k", right_key="bk",
        hot_threshold=10_000, n_salt=4, num_partitions=4,
    ).to_pandas()
    assert len(got) == 5000  # every fact key 1..49 matches build


def test_table_diff_randomized(ray_session):
    """table_diff vs a pandas-computed expectation over random versions."""
    import ray.data as rd

    from near_duplicate_detection_ray.pipelines.curate import table_diff

    rng = np.random.default_rng(11)
    base_keys = np.arange(0, 400)
    removed = set(rng.choice(base_keys, 40, replace=False).tolist())
    changed = set(
        rng.choice([k for k in base_keys if k not in removed], 60,
                   replace=False).tolist()
    )
    added = set(range(1000, 1030))

    a = pa.table(
        {
            "id": pa.array(base_keys, pa.int64()),
            "v": pa.array(base_keys * 10, pa.int64()),
        }
    )
    b_keys = [k for k in base_keys if k not in removed] + sorted(added)
    b_vals = [k * 10 + (7 if k in changed else 0) for k in b_keys]
    b = pa.table(
        {
            "id": pa.array(b_keys, pa.int64()),
            "v": pa.array(b_vals, pa.int64()),
        }
    )
    out = (
        table_diff(rd.from_arrow(a), rd.from_arrow(b), "id", "v",
                   num_partitions=4)
        .to_pandas()
        .set_index("key")["change_type"]
    )
    for k in base_keys:
        want = ("removed" if k in removed
                else "changed" if k in changed else "unchanged")
        assert out[k] == want, (k, out[k], want)
    for k in added:
        assert out[k] == "added"
    assert len(out) == len(base_keys) + len(added)


def test_salted_join_string_keys(ray_session):
    """string keys (the 'boilerplate fingerprint' case) work end to end."""
    import ray.data as rd

    from near_duplicate_detection_ray.stages.skewjoin import salted_join

    rng = np.random.default_rng(5)
    keys = np.where(rng.random(2000) < 0.7, "HOT", rng.integers(0, 9, 2000).astype(str))
    fact = pa.table({"k": pa.array(keys.tolist(), pa.string()),
                     "x": pa.array(np.arange(2000), pa.int64())})
    build = pa.table({"bk": pa.array(["HOT"] + [str(i) for i in range(9)], pa.string()),
                      "label": pa.array([f"l{i}" for i in range(10)], pa.string())})
    got = salted_join(
        rd.from_arrow(fact), rd.from_arrow(build), "k", right_key="bk",
        hot_threshold=500, n_salt=4, num_partitions=4,
    ).to_pandas()
    want = (
        rd.from_arrow(fact)
        .join(rd.from_arrow(build), join_type="inner", num_partitions=4,
              on=("k",), right_on=("bk",))
        .to_pandas()
    )
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_table_diff_rejects_duplicate_keys(ray_session):
    import pytest
    import ray.data as rd

    from near_duplicate_detection_ray.pipelines.curate import table_diff

    a = pa.table({"id": pa.array([1, 1, 2], pa.int64()),
                  "v": pa.array([10, 11, 20], pa.int64())})
    b = pa.table({"id": pa.array([2], pa.int64()),
                  "v": pa.array([20], pa.int64())})
    with pytest.raises(Exception, match="unique keys"):
        table_diff(rd.from_arrow(a), rd.from_arrow(b), "id", "v",
                   num_partitions=2).to_pandas()
