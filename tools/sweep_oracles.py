"""Full driver-gate rehearsal: run EVERY queries() entry at a given sf_dir and
compare rows/schema/values against oracle_sql() via DuckDB, mirroring the
driver's normalization (sort columns by name, sort rows, value-hash).

Usage: python tools/sweep_oracles.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return (
        df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    )


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")

    import __ray_entry__ as em

    qs, oracles = em.queries(), em.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    n_pass = n_rows_only = n_fail = 0
    failures: list[str] = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = qs[name](sf)
            got = got.to_pandas() if hasattr(got, "to_pandas") else got
            if not isinstance(got, pd.DataFrame):
                got = got.to_pandas()
            if name not in oracles:
                n_rows_only += 1
                print(f"ROWSONLY {name}: {len(got)} rows "
                      f"({time.time()-t0:.1f}s)", flush=True)
                continue
            want = con.execute(oracles[name]).df()
            pd.testing.assert_frame_equal(
                _norm(got), _norm(want), check_dtype=False
            )
            n_pass += 1
            print(f"PASS     {name}: {len(got)} rows "
                  f"({time.time()-t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL     {name}: {type(e).__name__}: "
                  f"{str(e)[:300]} ({time.time()-t0:.1f}s)", flush=True)
            traceback.print_exc(limit=3)

    print(f"\nTOTAL pass={n_pass} rows_only={n_rows_only} fail={n_fail}")
    if failures:
        print("FAILURES:", " ".join(failures))
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
