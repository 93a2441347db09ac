"""Verify stage: candidate pairs -> confirmed duplicate pairs.

Stateful actor-pool confirmation (north_star requirement): exact Jaccard over
the stored shingle-hash sets plus a SimHash Hamming check, the thresholded
analogue of the reference's ranked distance output
(``ndd/server_ndd.py:108-117``; SURVEY §2 D2 — the reference ranks, we
threshold at tau).

Pair -> signature attachment is two hash joins on conv_id (``Dataset.join``,
hash-partitioned) — the explicit-key replacement of the reference's forbidden
positional zip (``ndd/server_ndd.py:199-215``, SURVEY §2 J2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import NDDConfig
from ..functions.hashing import hamming_distance
from ..functions.similarity import batch_jaccard_containment_arrow

DUP_PAIRS_SCHEMA = pa.schema(
    [
        ("a", pa.string()),
        ("b", pa.string()),
        ("jaccard", pa.float64()),
        ("hamming", pa.int32()),
        ("containment", pa.float64()),
        ("method", pa.string()),
    ]
)


class Verifier:
    """Actor-pool callable over joined pair batches with columns
    a, b, shingles, simhash (A side — unsuffixed, see attach_signatures),
    shingles_b, simhash_b."""

    def __init__(self, cfg: NDDConfig | None = None) -> None:
        self.cfg = cfg or NDDConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return pa.Table.from_pylist([], schema=DUP_PAIRS_SCHEMA)
        # shingle sets travel as packed uint64 binary blobs (join-safe);
        # jaccard/containment for the whole batch come from ONE lexsort over
        # a zero-copy view of the Arrow binary buffers — no per-row bytes
        # objects and no per-pair loop (functions/similarity)
        sim_a = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sim_b = batch["simhash_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hamming = hamming_distance(sim_a, sim_b).astype(np.int32)
        jac, cont = batch_jaccard_containment_arrow(
            batch["shingles"], batch["shingles_b"]
        )
        # unified confirmation: jaccard-dups (method=minhash) AND
        # substring CANDIDATES (high containment, below-tau jaccard) in one
        # pass — the fused pipeline unions band- and anchor-buckets so a
        # single verify stage serves both (the substring candidates still
        # need the exact-text confirm downstream)
        dup = jac >= cfg.tau
        subc = (~dup) & (cont >= cfg.containment_tau)
        method = np.where(dup, "minhash", np.where(subc, "substring", ""))
        out = pa.table(
            {
                "a": batch["a"],
                "b": batch["b"],
                "jaccard": pa.array(jac, pa.float64()),
                "hamming": pa.array(hamming, pa.int32()),
                "containment": pa.array(cont, pa.float64()),
                "method": pa.array(method.tolist(), pa.string()),
            },
            schema=DUP_PAIRS_SCHEMA,
        )
        return out.filter(pa.array(dup | subc))


def attach_signatures(pairs, signatures, num_partitions: int | None = None,
                      semi_filter_max_ids: int = 5_000_000,
                      columns: list[str] | None = None):
    """Join (a, b) pairs to both endpoints' signature payloads (``columns``,
    default shingle sets + simhash) via two hash-partitioned joins.  Output
    columns: the A endpoint's payload keeps the signature table's own names
    (unsuffixed — no rename Project runs after the joins, see the inline
    note), the B endpoint's gets the ``_b`` suffix.

    SEMI-JOIN REDUCTION first: candidate pairs touch only a fraction of the
    corpus, but a plain join would shuffle every signature row (wide shingle
    blobs) twice.  The distinct endpoint ids are computed OFF-DRIVER (per-block
    unique -> remote tree merge, ``state/partitioning.distinct_values_ref``) and
    applied as a vectorized ``pc.is_in`` mask — the driver never iterates the
    pairs and no per-row Python runs.  Above ``semi_filter_max_ids`` endpoints
    the value_set itself gets heavy, so the reduction switches to a distributed
    BLOOM FILTER (``state/bloom``): same off-driver build, fixed-size bit
    array, vectorized probes; false positives are dropped by the inner join.
    """
    from ..state.bloom import bloom_filter, build_bloom
    from ..state.partitioning import default_partitions, endpoint_stats, semi_filter

    auto_partitions = num_partitions is None
    if num_partitions is None:
        # one partition per cluster CPU, never the single-box constant a
        # 256-node cluster would serialize on
        num_partitions = default_partitions()
    side = signatures.select_columns(["conv_id"] + (columns or ["shingles", "simhash"]))
    ids_ref, n_ids, key_counts = endpoint_stats(
        pairs, ["a", "b"], max_values=semi_filter_max_ids
    )
    if auto_partitions and ids_ref is not None:
        # adaptive exchange width: the endpoint count is already known
        # off-driver, and a candidate set touching few endpoints makes both
        # joins tiny — full-width partitions of a kilobyte join are pure
        # fixed cost (measured: the two Join ops dominated the whole
        # ngram-join tail at sf0.1 with ~240 ms/partition of overhead).
        # Keep >= ~2048 endpoint rows per partition, never above the
        # cluster default (large joins keep full width).  Floor 8 (capped
        # by the default — a floor ABOVE the cluster width spawns more
        # join aggregator actors than CPUs and starves the pool on small
        # sessions): the PAIRS side can be much larger than its endpoint
        # set (rare-gram blocking emits many candidates over few docs —
        # tf_cosine regressed 10.6 -> 14 s at floor 2), so the shrink
        # trims fixed per-partition cost without ever serializing a wide
        # pair side.
        floor = min(8, num_partitions)
        num_partitions = max(floor, min(num_partitions, -(-n_ids // 2048)))
    if ids_ref is not None:
        side = semi_filter(side, "conv_id", ids_ref)
    else:
        words_ref, n_bits, k = build_bloom(pairs, ["a", "b"], n_ids)
        side = bloom_filter(side, "conv_id", words_ref, n_bits, k)
    # RIGHT-side empty-block scrub: zero-column empties (upstream shuffle
    # remnants) SKIP map_batches UDFs, so the semi/bloom filter never touches
    # them and they reach the join's right-side shuffle, crashing Acero with
    # "No match ... FieldRef.Name(conv_id) on right side".  Same sparse-regime
    # gate as the left-side barrier below: only plausible (and only cheap)
    # when the surviving side is small relative to the partition count.
    if n_ids < 64 * num_partitions:
        from ..state.partitioning import materialize_clean

        side = materialize_clean(side)
    j = pairs.join(
        side,
        join_type="inner",
        num_partitions=num_partitions,
        on=("a",),
        right_on=("conv_id",),
        right_suffix="_a",
    )
    # NO rename Project after the joins: a zero-row join partition's block
    # SKIPS every map operator (including rename_columns' projection), so a
    # rename here leaves stale pre-rename schemas on the empties and floods
    # the log with typed schema-divergence warnings.  Instead the A-side
    # payload keeps the signature table's own names (shingles / simhash) and
    # the SECOND join's collision suffix names the B side (shingles_b /
    # simhash_b) — the join operator stamps ONE schema on every output
    # bundle, empties included.
    # Empty-block scrub between the two joins: when distinct join keys are few
    # relative to num_partitions, join #1 emits zero-column blocks for its
    # empty partitions, which crash join #2 inside Acero ("No match or
    # multiple matches for key field FieldRef.Name(b)") — the Ray 2.49 failure
    # state/partitioning.materialize_clean documents.  The barrier costs one
    # extra shuffle-bearing execution (aggregator-actor spawn), so it runs
    # ONLY in the sparse regime where empties are plausible: with >= 64
    # distinct values of BOTH join keys per partition, P[any empty partition]
    # <= 2 * P * e^-64 ~ 0 (keys hash independently) and the barrier is
    # skipped.  Per-column counts matter — a capped hot bucket can emit a
    # star whose 'a' column has few distinct values even when endpoints are
    # many.
    if min(key_counts.values()) < 64 * num_partitions:
        from ..state.partitioning import materialize_clean

        j = materialize_clean(j)
    return j.join(
        side,
        join_type="inner",
        num_partitions=num_partitions,
        on=("b",),
        right_on=("conv_id",),
        right_suffix="_b",
    )


def verify_pairs(pairs, signatures, cfg: NDDConfig | None = None, concurrency=None,
                 num_partitions: int | None = None):
    """candidate pairs + signatures -> dup_pairs Dataset (jaccard >= tau).

    Autoscaling (1, N) actor pool — min=1 so the stage can always make
    progress next to the join's aggregator actors on small clusters.
    """
    # num_partitions=None flows through to attach_signatures, whose
    # endpoint-count adaptive width then applies; explicit values are
    # respected verbatim
    if concurrency is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (max(1, cpus // 4), max(2, cpus // 2))
    # Guard: empty/zero-column blocks break the downstream hash join ("No
    # match for FieldRef.Name(a)").  The candidate set is bounded
    # (post-distinct) so materializing it here is safe.
    from ..state.partitioning import materialize_clean

    pairs = materialize_clean(pairs)
    if pairs.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.Table.from_pylist([], schema=DUP_PAIRS_SCHEMA))
    joined = attach_signatures(pairs, signatures, num_partitions=num_partitions)
    return joined.map_batches(
        Verifier,
        fn_constructor_kwargs={"cfg": cfg or NDDConfig()},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency,
        num_cpus=1,
    )
