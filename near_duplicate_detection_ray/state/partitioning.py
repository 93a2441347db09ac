"""Keyed hash-partitioning helpers.

``groupby().map_groups`` calls a Python function once per group — ruinous when
groups are numerous and mostly singletons (every LSH band bucket, every
conversation).  The scalable pattern used throughout this engine instead:

    ds.repartition(P, keys=[...])      # ONE hash shuffle; each key lands
                                       # wholly in one block (verified)
      .map_batches(fn, batch_size=None)  # vectorized block-local group logic

which costs one exchange and zero per-singleton Python calls.  Requires
``DataContext.shuffle_strategy = HASH_SHUFFLE`` (Ray's sort-based default
rejects keyed repartition).
"""

from __future__ import annotations


class _EmptySchemaWarningFilter:
    """Drop ONLY the benign zero-column variant of Ray 2.49's schema-divergence
    warning.

    The hash-shuffle operator emits ZERO-COLUMN blocks for empty partitions
    (repro in ``materialize_clean``'s docstring); ``map_batches`` skips empty
    blocks without calling the UDF, so the untyped empties coast to the sink
    and the streaming executor logs "RefBundle with a different schema ...
    new schema: ." for every one.  Those empties are harmless at sinks —
    every Acero-join input in this engine is explicitly scrubbed
    (``materialize_clean`` barriers at all join sites) — so the warning is
    pure noise here.  The filter matches the exact empty-``pa.schema([])``
    rendering, which a REAL typed-vs-typed divergence (the warning's useful
    case — it caught a genuine mixed-schema union bug in round 1) can never
    produce, so real divergences still log.
    """

    def filter(self, record) -> bool:  # logging.Filter protocol
        msg = record.getMessage()
        return "new schema: . This may lead" not in msg


_SCHEMA_WARN_FILTER_INSTALLED = False


def _install_empty_schema_warning_filter() -> None:
    global _SCHEMA_WARN_FILTER_INSTALLED
    if _SCHEMA_WARN_FILTER_INSTALLED:
        return
    import logging

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySchemaWarningFilter())
    _SCHEMA_WARN_FILTER_INSTALLED = True


# --- Ray 2.49 hash-shuffle schema-broadcast fix -----------------------------
#
# The original ``_shuffle_block`` body, captured at import time BEFORE any
# patching (on every fresh process — driver or worker — ``hash_shuffle``
# starts unpatched, so this always binds the true upstream implementation;
# the name check makes a re-import after patching a no-op instead of a
# self-reference).
try:  # pragma: no cover - exercised via the shuffle path
    from ray.data._internal.execution.operators import hash_shuffle as _hs_mod

    _ORIG_SHUFFLE_BLOCK_FN = (
        _hs_mod._shuffle_block._function
        if getattr(_hs_mod._shuffle_block, "_function", None) is not None
        and _hs_mod._shuffle_block._function.__name__ == "_shuffle_block"
        else None
    )
except Exception:  # pragma: no cover - ray internals moved
    _ORIG_SHUFFLE_BLOCK_FN = None


def _shuffle_block_schema_safe(
    block,
    input_index,
    key_columns,
    pool,
    block_transformer=None,
    send_empty_blocks=False,
    override_partition_id=None,
):
    """Drop-in replacement for Ray 2.49's ``_shuffle_block`` remote task that
    fixes an upstream schema-broadcast race.

    The bug (ray/data/_internal/execution/operators/hash_shuffle.py:223-225
    vs 548-589 and join.py:104-118): the operator marks an input sequence's
    schema as broadcast when it SUBMITS the first shuffle task with
    ``send_empty_blocks=True`` — but the task body early-returns on a
    ZERO-ROW block before the fan-out loop that would have delivered typed
    empty shards to every aggregator.  When the first-submitted block of a
    join input happens to be empty (a filter that emptied a block, a sparse
    checkpoint read — submission order is racy), NO aggregator ever receives
    that side's schema; every partition that then gets no real rows builds a
    zero-COLUMN table in ``finalize`` and Acero fails the join with "No match
    or multiple matches for key field reference FieldRef.Name(...)".

    Fix: when the zero-row block IS the designated schema carrier, fan its
    typed empty schema out to every aggregator (exactly what the original
    does for hash-empty partitions of a non-empty block), then return the
    same metadata tuple.  Non-empty blocks delegate to the captured original
    unchanged (transformer already applied, so passed as None).
    """
    import ray
    from ray.data._internal.arrow_ops.transform_pyarrow import _create_empty_table
    from ray.data._internal.table_block import TableBlockAccessor
    from ray.data.block import BlockAccessor, BlockExecStats, BlockType

    stats = BlockExecStats.builder()
    if block_transformer is not None:
        block = block_transformer(block)
    block = TableBlockAccessor.try_convert_block_type(
        block, block_type=BlockType.ARROW
    )
    if block.num_rows == 0:
        meta = BlockAccessor.for_block(block).get_metadata(exec_stats=stats.build())
        if send_empty_blocks and len(block.schema) > 0:
            shard_ref = ray.put(_create_empty_table(block.schema))
            waits = [
                pool.get_aggregator_for_partition(pid).submit.remote(
                    input_index, pid, shard_ref
                )
                for pid in range(pool.num_partitions)
            ]
            ray.wait(waits, num_returns=len(waits))
        return (meta, {})
    return _ORIG_SHUFFLE_BLOCK_FN(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks=send_empty_blocks,
        override_partition_id=override_partition_id,
    )


_SHUFFLE_FIX_INSTALLED = False


def _install_hash_shuffle_schema_fix() -> None:
    """Replace ``hash_shuffle._shuffle_block`` with the schema-safe shim (the
    operator resolves the name at submission time, so rebinding the module
    attribute is sufficient).  Idempotent; skipped when the original could
    not be captured (future Ray versions — the upstream fix makes this moot).
    """
    global _SHUFFLE_FIX_INSTALLED
    if _SHUFFLE_FIX_INSTALLED or _ORIG_SHUFFLE_BLOCK_FN is None:
        return
    import ray
    from ray.data._internal.execution.operators import hash_shuffle as hs

    if getattr(hs._shuffle_block, "_function", None) is not _shuffle_block_schema_safe:
        hs._shuffle_block = ray.remote(_shuffle_block_schema_safe)
    _SHUFFLE_FIX_INSTALLED = True


def enable_hash_shuffle() -> None:
    import ray
    import ray.data as rd
    from ray.data.context import ShuffleStrategy

    _install_empty_schema_warning_filter()
    _install_hash_shuffle_schema_fix()
    ctx = rd.DataContext.get_current()
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Each hash-shuffle operator spawns one ACTOR (a fresh worker process) per
    # aggregator, up to this cap, PER EXECUTION — with the default of 64 the
    # process-spawn cost dominates small/medium runs (measured: 38 s for a
    # 2-shuffle graph over a few MB).  Cap aggregators well below the
    # partition count; each aggregator then serves multiple partitions.
    import os

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    override = os.environ.get("NDD_SHUFFLE_AGGS")
    ctx.max_hash_shuffle_aggregators = (
        int(override) if override else max(2, cpus // 2)
    )


def default_partitions(scale: int = 1, floor: int = 4) -> int:
    """Default = one partition per CPU.  On a real multi-node cluster size
    partitions by data volume (target ~128 MiB-1 GiB per partition) via the
    explicit ``num_partitions`` arguments instead; locally, more partitions
    than CPUs only adds per-partition finalize overhead."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(floor, cpus * scale)


def resolve_partitions(num_partitions: int | None) -> int:
    """``num_partitions or default_partitions()`` as one shared helper —
    operator signatures default to ``None`` so shuffle width follows the
    cluster instead of a hardcoded constant."""
    return num_partitions or default_partitions()


def _strip_schema_metadata(t):
    """Drop table-level schema metadata.  Pandas-format stages attach a
    ``pandas`` metadata DICT to the converted Arrow schema; Ray 2.49's
    hash-shuffle aggregators then fail to hash block schemas for dedup and
    flood the log with ``Failed to hash the schemas ... unhashable type:
    'dict'`` (and lose the dedup fast path).  This map fuses with the
    upstream stage, so the strip is free."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def key_partitioned(ds, keys: list[str], num_partitions: int | None = None):
    """Hash-partition ``ds`` so every distinct key tuple lands in exactly one
    block; follow with ``map_batches(fn, batch_size=None)`` for vectorized
    per-key logic."""
    enable_hash_shuffle()
    ds = ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")
    return ds.repartition(num_partitions or default_partitions(), keys=keys)


def distinct_values_ref(ds, cols: list[str], max_values: int | None = None):
    """Distinct values across the given columns of ``ds``, computed OFF-DRIVER.

    The scalable semi-join building block: per-block ``pc.unique`` inside map
    tasks, then a tree of remote merge tasks (fan-in 64) — the driver never
    iterates values, it only learns the final count and holds an ObjectRef to
    the deduped Arrow array (zero-copy shared from the object store by every
    task that applies the ``pc.is_in`` mask).

    Returns ``(ids_ref, count)``; ``ids_ref`` is None when ``max_values`` is
    given and exceeded (callers fall back to a plain shuffle join — a Bloom
    filter is the next step at that scale).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    def block_unique(t: pa.Table) -> pa.Table:
        arrs = [t[c].combine_chunks() for c in cols]
        return pa.table({"v": pc.unique(pa.concat_arrays(arrs))})

    # materialize THEN take refs: to_arrow_refs() on a lazy dataset triggers a
    # second full execution of the upstream graph for its schema probe (a
    # limit-1 run that a shuffle upstream makes as expensive as the real one,
    # observed in ds.stats); on a MaterializedDataset both are free
    refs = ds.select_columns(cols).map_batches(
        block_unique, batch_format="pyarrow"
    ).materialize().to_arrow_refs()

    @ray.remote
    def merge(*tables):
        arrs = [
            t["v"].combine_chunks() for t in tables if t.num_rows and t.num_columns
        ]
        if not arrs:
            return pa.table({"v": pa.array([], pa.string())})
        return pa.table({"v": pc.unique(pa.concat_arrays(arrs))})

    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 64]) for i in range(0, len(refs), 64)]

    @ray.remote(num_returns=2)
    def finalize(t):
        vals = t["v"].combine_chunks() if t.num_rows and t.num_columns else pa.array([], pa.string())
        if not isinstance(vals, pa.Array):
            vals = pa.array([], pa.string())
        return vals, len(vals)

    ids_ref, n_ref = finalize.remote(refs[0])
    n = int(ray.get(n_ref))
    if max_values is not None and n > max_values:
        return None, n
    return ids_ref, n


def endpoint_stats(ds, cols: list[str], max_values: int | None = None):
    """ONE off-driver pass over ``ds`` returning
    ``(ids_ref, n_ids, per_col_counts)``: the deduped union of the columns'
    values as an object-store ref (None if over ``max_values``), its size,
    and each column's distinct count.  Fuses ``distinct_values_ref`` +
    ``distinct_counts`` so the verify path pays one execution, not two."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    def block_unique(t: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            u = pc.unique(t[c].combine_chunks())
            vals.append(u)
            names.append(pa.array([c] * len(u), pa.string()))
        return pa.table({"c": pa.concat_arrays(names), "v": pa.concat_arrays(vals)})

    refs = ds.select_columns(cols).map_batches(
        block_unique, batch_format="pyarrow"
    ).materialize().to_arrow_refs()  # see distinct_values_ref: avoid double exec

    @ray.remote
    def merge(*tables):
        live = [t for t in tables if t.num_rows and t.num_columns]
        if not live:
            return pa.table({"c": pa.array([], pa.string()),
                             "v": pa.array([], pa.string())})
        return pa.concat_tables(live).group_by(["c", "v"]).aggregate([])

    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 64]) for i in range(0, len(refs), 64)]

    @ray.remote(num_returns=2)
    def finalize(t):
        if not t.num_rows:
            return pa.array([], pa.string()), {}
        agg = t.group_by(["c"]).aggregate([([], "count_all")])
        counts = dict(zip(agg["c"].to_pylist(), agg["count_all"].to_pylist()))
        ids = pc.unique(t["v"].combine_chunks())
        return ids, counts

    ids_ref, meta_ref = finalize.remote(refs[0])
    counts = {c: int(v) for c, v in ray.get(meta_ref).items()}
    counts = {c: counts.get(c, 0) for c in cols}
    n_ids = 0
    # n_ids <= sum of per-col counts; exact size needs the array length —
    # fetch it via a tiny remote len() so the driver never pulls the values
    @ray.remote
    def arr_len(a):
        return len(a)

    n_ids = int(ray.get(arr_len.remote(ids_ref)))
    if max_values is not None and n_ids > max_values:
        return None, n_ids, counts
    return ids_ref, n_ids, counts


def distinct_counts(ds, cols: list[str]) -> dict[str, int]:
    """Per-column distinct-value counts, computed off-driver in one pass
    (per-block unique tagged by column -> remote tree merge -> counts).  Used
    to decide whether a join's hash partitions can be empty (the Acero
    empty-block hazard) without shipping any values to the driver."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    def block_unique(t: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            u = pc.unique(t[c].combine_chunks())
            vals.append(u)
            names.append(pa.array([c] * len(u), pa.string()))
        return pa.table(
            {"c": pa.concat_arrays(names), "v": pa.concat_arrays(vals)}
        )

    refs = ds.select_columns(cols).map_batches(
        block_unique, batch_format="pyarrow"
    ).materialize().to_arrow_refs()  # see distinct_values_ref: avoid double exec

    @ray.remote
    def merge(*tables):
        live = [t for t in tables if t.num_rows and t.num_columns]
        if not live:
            return pa.table({"c": pa.array([], pa.string()),
                             "v": pa.array([], pa.string())})
        return pa.concat_tables(live).group_by(["c", "v"]).aggregate([])

    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 64]) for i in range(0, len(refs), 64)]

    @ray.remote
    def counts(t):
        if not t.num_rows:
            return {}
        agg = t.group_by(["c"]).aggregate([([], "count_all")])
        return dict(zip(agg["c"].to_pylist(), agg["count_all"].to_pylist()))

    out = ray.get(counts.remote(refs[0]))
    return {c: int(out.get(c, 0)) for c in cols}


def semi_filter(ds, col: str, ids_ref):
    """Keep only rows whose ``col`` value is in the broadcast id array —
    ``pc.is_in`` with an object-store value_set; no per-row Python."""
    import pyarrow.compute as pc
    import ray

    def keep(t):
        ids = ray.get(ids_ref)
        return t.filter(pc.is_in(t[col], value_set=ids))

    return ds.map_batches(keep, batch_format="pyarrow")


def materialize_clean(ds):
    """``materialize()`` that also drops 0-row blocks.

    Ray 2.49's hash-shuffle repartition emits ZERO-COLUMN blocks for empty
    partitions, and map_batches skips empty blocks without calling the UDF —
    so schema-less empties survive every downstream map stage and then crash
    Acero hash joins ("No match or multiple matches for key field").  Verified
    by minimal repro; scrubbing at materialize boundaries (which the pipeline
    needs anyway for multi-consumer stages) removes them."""
    import ray.data as rd

    mat = ds.materialize()
    try:
        refs = [
            ref
            for bundle in mat.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks
            if meta.num_rows
        ]
    except AttributeError:  # developer API moved — degrade to plain materialize
        return mat
    if not refs:
        return mat  # fully empty; callers' empty-count guards take over
    return rd.from_arrow_refs(refs)
