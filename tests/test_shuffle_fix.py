"""Regression tests for the Ray 2.49 hash-shuffle schema-broadcast race
(state/partitioning._shuffle_block_schema_safe).

Upstream bug: the shuffle operator marks a join input's schema as broadcast
when it SUBMITS the first shuffle task, but the task body early-returns on a
zero-row block BEFORE the schema fan-out — so a join whose first-submitted
left block is empty leaves empty partitions schemaless and Acero fails with
"No match or multiple matches for key field reference FieldRef.Name(a)".
Unpatched repro fails 10/10 with the construction below (zero-row typed
blocks ahead of the data block); the shim fixes it engine-wide.
"""

import pyarrow as pa
import ray.data as rd


def _left_with_empty_first_blocks():
    schema = pa.schema([("a", pa.string()), ("x", pa.int64())])
    rows = pa.table({"a": ["k1", "k2"], "x": [1, 2]})
    return rd.from_arrow([schema.empty_table()] * 8 + [rows])


def test_shim_installed(ray_session):
    from ray.data._internal.execution.operators import hash_shuffle as hs

    from near_duplicate_detection_ray.state import partitioning as p

    # a Ray upgrade that moves the internals must fail LOUDLY here, not
    # silently revert the engine to the flaky unpatched path
    assert p._ORIG_SHUFFLE_BLOCK_FN is not None
    assert hs._shuffle_block._function is p._shuffle_block_schema_safe


def test_join_with_leading_empty_left_blocks(ray_session):
    left = _left_with_empty_first_blocks()
    right = rd.from_arrow(pa.table({"a": ["k1", "k2"], "y": [10, 20]}))
    for _ in range(3):
        j = left.join(right, join_type="inner", num_partitions=8, on=("a",))
        out = j.take_all()
        assert sorted((r["a"], r["x"], r["y"]) for r in out) == [
            ("k1", 1, 10),
            ("k2", 2, 20),
        ]


def test_join_with_leading_empty_right_blocks(ray_session):
    left = rd.from_arrow(pa.table({"a": ["k1", "k2"], "y": [10, 20]}))
    right = _left_with_empty_first_blocks()
    j = left.join(right, join_type="inner", num_partitions=8, on=("a",))
    assert j.count() == 2


def test_join_fully_empty_side_still_works(ray_session):
    schema = pa.schema([("a", pa.string()), ("x", pa.int64())])
    left = rd.from_arrow([schema.empty_table()] * 4)
    right = rd.from_arrow(pa.table({"a": ["k1"], "y": [10]}))
    j = left.join(right, join_type="inner", num_partitions=4, on=("a",))
    assert j.count() == 0
