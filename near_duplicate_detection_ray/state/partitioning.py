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


def enable_hash_shuffle() -> None:
    import ray
    import ray.data as rd
    from ray.data.context import ShuffleStrategy

    ctx = rd.DataContext.get_current()
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Each hash-shuffle operator spawns one ACTOR (a fresh worker process) per
    # aggregator, up to this cap, PER EXECUTION — with the default of 64 the
    # process-spawn cost dominates small/medium runs (measured: 38 s for a
    # 2-shuffle graph over a few MB).  Cap aggregators well below the
    # partition count; each aggregator then serves multiple partitions.
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    ctx.max_hash_shuffle_aggregators = max(2, cpus // 2)


def default_partitions(scale: int = 1, floor: int = 4) -> int:
    """Default = one partition per CPU.  On a real multi-node cluster size
    partitions by data volume (target ~128 MiB-1 GiB per partition) via the
    explicit ``num_partitions`` arguments instead; locally, more partitions
    than CPUs only adds per-partition finalize overhead."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(floor, cpus * scale)


def key_partitioned(ds, keys: list[str], num_partitions: int | None = None):
    """Hash-partition ``ds`` so every distinct key tuple lands in exactly one
    block; follow with ``map_batches(fn, batch_size=None)`` for vectorized
    per-key logic."""
    enable_hash_shuffle()
    return ds.repartition(num_partitions or default_partitions(), keys=keys)


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
