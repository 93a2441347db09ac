"""Skew-salted hash join.

A plain hash join sends every row of a key to ONE partition; a hot key
(power-law user, boilerplate fingerprint, null-ish default) turns that
partition into the straggler that serializes the whole stage — the classic
skew failure mode the north_rule requires handling explicitly (SURVEY §4).
``salted_join`` detects hot keys cheaply, splits the FACT side's hot rows
across ``n_salt`` sub-partitions, replicates only the (small) matching
build-side rows across those sub-partitions, and joins on the composite
(key, salt) — identical output, bounded partition width.

Cost model: detection is one map-side count partial + tiny merge (no extra
shuffle of the data); replication multiplies ONLY the build rows of hot keys
(|hot| * n_salt rows — bounded by the detection threshold); everything else
joins exactly as before.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def hot_keys(ds, key: str, threshold: int) -> list:
    """Keys whose total row count exceeds ``threshold`` — EXACT: per-block
    count partials (map-side combine, <= distinct-keys-per-block rows each),
    then ONE keyed combine over the partials and a filter; only the
    surviving hot keys (a handful by construction) reach the driver.  The
    partial shuffle is skew-proof: a hot key contributes at most one row
    per block to its combine partition.  Key values keep their native
    Arrow type (ints, strings, binaries all work)."""
    from ..functions.groupagg import highcard_groupagg

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return None
        g = t.select([key]).group_by([key]).aggregate([([], "count_all")])
        return g.rename_columns([key, "n"])

    def partial_or_empty(t: pa.Table) -> pa.Table:
        out = partial(t)
        if out is None:
            return pa.table(
                {key: pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        return out

    counts = highcard_groupagg(
        ds.map_batches(partial_or_empty, batch_format="pyarrow"),
        [key], [("n", "sum")], {"n_sum": "n"},
    )
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], threshold)), batch_format="pyarrow"
    ).to_pandas()
    return sorted(hot[key].tolist()) if not hot.empty else []


def salted_join(fact, build, key: str, right_key: str | None = None,
                hot_threshold: int = 100_000, n_salt: int = 16,
                num_partitions: int | None = None, right_suffix: str = "_r"):
    """Inner join ``fact`` x ``build`` on ``key`` with hot-key salting.

    ``fact`` is the large/skewed side (hot keys get split across ``n_salt``
    salts via a per-row hash); ``build`` is the side whose hot rows are
    replicated (cheap when hot keys are few — the usual case: one hot user,
    one boilerplate fingerprint).  Output equals a plain inner join (column
    set: fact columns + build columns, overlaps suffixed) — pinned by
    tests/test_skew_join.py."""
    import ray

    from ..functions.hashing import splitmix64
    from ..state.partitioning import default_partitions, materialize_clean

    if num_partitions is None:
        num_partitions = default_partitions()
    if right_key is None:
        right_key = key

    fact = materialize_clean(fact)
    hot = hot_keys(fact, key, hot_threshold)
    hot_ref = ray.put(hot)

    def _hot_set(t: pa.Table, col: str):
        vals = ray.get(hot_ref)
        if not vals:
            return None
        return pa.array(vals, type=t[col].type)

    def salt_fact(t: pa.Table) -> pa.Table:
        hs = _hot_set(t, key)
        if hs is None:
            salt = np.zeros(t.num_rows, dtype=np.int64)
            return t.append_column("__salt", pa.array(salt, pa.int64()))
        is_hot = pc.is_in(t[key], value_set=hs).to_numpy(zero_copy_only=False)
        # per-row deterministic spread: row position hashed so hot rows fan
        # out uniformly regardless of key type; cold rows keep salt 0
        rowpos = np.arange(t.num_rows, dtype=np.uint64)
        salt = (splitmix64(rowpos) % np.uint64(n_salt)).astype(np.int64)
        salt[~is_hot] = 0
        return t.append_column("__salt", pa.array(salt, pa.int64()))

    def replicate_build(t: pa.Table) -> pa.Table:
        hs = _hot_set(t, right_key)
        if hs is None:
            return t.append_column(
                "__salt", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            )
        is_hot = pc.is_in(t[right_key], value_set=hs).to_numpy(
            zero_copy_only=False
        )
        cold = t.filter(pa.array(~is_hot)).append_column(
            "__salt", pa.array(np.zeros(int((~is_hot).sum()), np.int64), pa.int64())
        )
        hot_rows = t.filter(pa.array(is_hot))
        if hot_rows.num_rows == 0:
            return cold
        reps = []
        for s in range(n_salt):
            reps.append(
                hot_rows.append_column(
                    "__salt",
                    pa.array(np.full(hot_rows.num_rows, s, np.int64), pa.int64()),
                )
            )
        return pa.concat_tables([cold] + reps)

    left = fact.map_batches(salt_fact, batch_format="pyarrow")
    right = materialize_clean(build.map_batches(replicate_build,
                                                batch_format="pyarrow"))
    joined = left.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=(key, "__salt"),
        right_on=(right_key, "__salt"),
        right_suffix=right_suffix,
    )
    def strip_salt(t: pa.Table) -> pa.Table:
        keep = [c for c in t.column_names if not c.startswith("__salt")]
        return t.select(keep)

    return joined.map_batches(strip_salt, batch_format="pyarrow")
