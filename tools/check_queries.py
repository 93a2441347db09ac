"""Local mimic of the driver's correctness gate: run every ``queries()`` entry
at a given sf_dir and compare against ``oracle_sql()`` via DuckDB —
row count, column names, and order-insensitive value hash.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def normalize_df(df):
    import pandas as pd

    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df) -> str:
    import hashlib

    return hashlib.md5(df.to_csv(index=False, float_format="%.9g").encode()).hexdigest()


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    import os

    if not ray.is_initialized():
        # RAY_GRAFT_CPUS override: sweeping at DIFFERENT widths (4 vs 32)
        # changes Ray's block splits/merge order, so a pass at two widths
        # evidences block-order-robust output (DuckDB is the fixed side).
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = normalize_df(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append(name)
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(mine)} rows, cols={list(mine.columns)} ({dt:.1f}s)")
            continue
        try:
            theirs = normalize_df(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            failures.append(name)
            print(f"[FAIL] {name}: oracle SQL raised {e}")
            continue
        problems = []
        if len(mine) != len(theirs):
            problems.append(f"rows {len(mine)} != {len(theirs)}")
        if list(mine.columns) != list(theirs.columns):
            problems.append(f"cols {list(mine.columns)} != {list(theirs.columns)}")
        if not problems:
            # The driver's value hash is dtype-sensitive (int64 12345 vs
            # float64 12345.0 differ there even though CSV text matches) —
            # mimic it with a post-normalization dtype equality assertion.
            bad = [
                f"{c}: {mine[c].dtype} != {theirs[c].dtype}"
                for c in mine.columns
                if str(mine[c].dtype) != str(theirs[c].dtype)
            ]
            if bad:
                problems.append(f"dtype mismatch [{'; '.join(bad)}]")
        if not problems and value_hash(mine) != value_hash(theirs):
            problems.append("value hash mismatch")
            merged = mine.compare(theirs) if mine.shape == theirs.shape else None
            if merged is not None and len(merged):
                print(merged.head(10))
        if problems:
            failures.append(name)
            print(f"[FAIL] {name}: {'; '.join(problems)} ({dt:.1f}s)")
        else:
            print(f"[OK]   {name}: {len(mine)} rows match ({dt:.1f}s)")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
