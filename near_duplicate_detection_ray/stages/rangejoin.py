"""General keyed interval join (SURVEY §2 J1): match point rows to interval
rows of the same key whose [lo, hi] (or [lo, hi)) contains the point.

Reference analogue: the frame->shot containment join
(``ndd/server_ndd.py:217-220``) — a frame timestamp matched into its shot's
[start, end] span.  There the reference walks a sorted python list; here the
same semantics run as ONE keyed hash-shuffle + vectorized block-local
matching, the general reusable form.

Execution shape (join-free, like stages/cluster.propagate_labels): both sides
are tagged, unioned into a superset schema, hash-partitioned by key (each key
lands wholly in one block), and matched inside the block with numpy
searchsorted.  PARTITIONING ASSUMPTION: one key's points+intervals fit in one
block (same assumption every keyed stage in this engine makes); candidate
lookup is bounded via the per-key maximum interval LENGTH — for each point
only intervals with lo in (p - max_len, p] are examined, so runtime is
O((P + I) log I + matches) per key unless a single key mixes wildly different
interval lengths (document your key choice accordingly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.partitioning import key_partitioned


def interval_join(
    points,
    intervals,
    key: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    closed: str = "both",
    num_partitions: int | None = None,
):
    """Inner interval join: every (point row, interval row) pair with equal
    ``key`` and ``lo <= point <= hi`` (``closed='both'``) or
    ``lo <= point < hi`` (``closed='left'``).

    Returns a Dataset with the point columns plus the interval's non-key
    columns.  Intervals may overlap; a point matches every containing
    interval.
    """
    if closed not in ("both", "left"):
        raise ValueError(f"closed must be 'both' or 'left', got {closed!r}")

    def _arrow_schema(ds) -> pa.Schema:
        s = ds.schema()
        base = getattr(s, "base_schema", None)
        if isinstance(base, pa.Schema):
            return base
        fields = []
        for n, t in zip(s.names, s.types):
            if not isinstance(t, pa.DataType):
                t = pa.from_numpy_dtype(t)  # pandas-backed blocks
            fields.append(pa.field(n, t))
        return pa.schema(fields)

    p_schema = _arrow_schema(points)
    i_schema = _arrow_schema(intervals)
    p_cols = [c for c in p_schema.names]
    i_extra = [c for c in i_schema.names if c not in key]
    overlap = set(p_cols) & set(i_extra)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    out_cols = p_cols + i_extra

    def tag_points(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in p_cols}
        n = t.num_rows
        for c in i_extra:
            cols[c] = pa.nulls(n, i_schema.field(c).type)
        cols["__side"] = pa.array(np.zeros(n, dtype=np.int8), pa.int8())
        return pa.table(cols)

    def tag_intervals(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for c in p_cols:
            if c in key:
                cols[c] = t[c]
            else:
                cols[c] = pa.nulls(n, p_schema.field(c).type)
        for c in i_extra:
            cols[c] = t[c]
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8), pa.int8())
        return pa.table(cols)

    tagged = points.map_batches(tag_points, batch_format="pyarrow").union(
        intervals.map_batches(tag_intervals, batch_format="pyarrow")
    )

    def match_block(df: pd.DataFrame) -> pa.Table:
        empty_schema = pa.schema(
            [p_schema.field(c) for c in p_cols]
            + [i_schema.field(c) for c in i_extra]
        )
        if df.empty:
            return pa.Table.from_pylist([], schema=empty_schema)
        pts = df[df["__side"] == 0]
        ivs = df[df["__side"] == 1]
        if pts.empty or ivs.empty:
            return pa.Table.from_pylist([], schema=empty_schema)
        out_point_rows: list[np.ndarray] = []
        out_iv_rows: list[np.ndarray] = []
        iv_groups = dict(iter(ivs.groupby(key, sort=False)))
        for kval, p_grp in pts.groupby(key, sort=False):
            i_grp = iv_groups.get(kval)
            if i_grp is None or i_grp.empty:
                continue
            lo = i_grp[lo_col].to_numpy()
            hi = i_grp[hi_col].to_numpy()
            order = np.argsort(lo, kind="stable")
            lo_s, hi_s = lo[order], hi[order]
            iv_idx = i_grp.index.to_numpy()[order]
            max_len = (hi_s - lo_s).max()
            p = p_grp[point_col].to_numpy()
            # candidates: lo in (p - max_len - eps, p]
            hi_bound = np.searchsorted(lo_s, p, side="right")
            lo_bound = np.searchsorted(lo_s, p - max_len, side="left")
            counts = hi_bound - lo_bound
            if counts.sum() == 0:
                continue
            prow = np.repeat(p_grp.index.to_numpy(), counts)
            cand = np.concatenate(
                [np.arange(l, h) for l, h in zip(lo_bound, hi_bound) if h > l]
            )
            pvals = np.repeat(p, counts)
            ok = (pvals >= lo_s[cand]) & (
                (pvals <= hi_s[cand]) if closed == "both" else (pvals < hi_s[cand])
            )
            out_point_rows.append(prow[ok])
            out_iv_rows.append(iv_idx[cand[ok]])
        if not out_point_rows:
            return pa.Table.from_pylist([], schema=empty_schema)
        pi = np.concatenate(out_point_rows)
        ii = np.concatenate(out_iv_rows)
        left = pts.loc[pi, p_cols].reset_index(drop=True)
        right = ivs.loc[ii, i_extra].reset_index(drop=True)
        merged = pd.concat([left, right], axis=1)
        return pa.Table.from_pandas(merged, schema=empty_schema, preserve_index=False)

    return key_partitioned(tagged, key, num_partitions).map_batches(
        match_block, batch_format="pandas", batch_size=None
    )
