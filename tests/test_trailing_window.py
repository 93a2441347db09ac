"""Trailing sliding-window aggregate: oracle equality incl. tie/boundary
semantics (ts == ts_i - window excluded, equal-ts ties included)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tie_events_dir(ray_session, tmp_path_factory):
    """Hand-built boundary cases: exact-window-edge event (excluded), equal-ts
    ties (included regardless of sort position), multi-user interleaving."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(60, "s")
    rows = [
        # user 1: t=0, t=30m, t=60m (t=0 is EXACTLY 1h before t=60m -> excluded)
        (0, base + 0 * m, 1, 1.00),
        (1, base + 30 * m, 1, 2.00),
        (2, base + 60 * m, 1, 4.00),
        # user 2: three events at the SAME ts -> all count each other
        (3, base + 10 * m, 2, 1.50),
        (4, base + 10 * m, 2, 2.50),
        (5, base + 10 * m, 2, 3.50),
        # user 3: lone event
        (6, base + 5 * m, 3, 9.99),
    ]
    d = str(tmp_path_factory.mktemp("tie_events"))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["x"] * len(rows), pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        f"{d}/events.parquet",
    )
    return d


def test_trailing_window_boundary_semantics(tie_events_dir):
    from near_duplicate_detection_ray.pipelines.relational import events_trailing_1h

    got = (
        events_trailing_1h(tie_events_dir)
        .to_pandas()
        .sort_values("event_id")
        .set_index("event_id")
    )
    # event 2 at t=60m: window (0m, 60m] -> events 1,2 only (event 0 at edge excluded)
    assert got.loc[2, "n_trailing"] == 2 and got.loc[2, "sum_cents"] == 600
    # equal-ts ties all see each other
    for e in (3, 4, 5):
        assert got.loc[e, "n_trailing"] == 3 and got.loc[e, "sum_cents"] == 750
    assert got.loc[6, "n_trailing"] == 1 and got.loc[6, "sum_cents"] == 999


def test_trailing_window_matches_duckdb(tie_events_dir):
    import duckdb

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import events_trailing_1h

    got = (
        events_trailing_1h("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["events_trailing_1h"])
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_dtype=False
    )
