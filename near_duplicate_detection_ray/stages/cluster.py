"""Clustering stage: duplicate-pair edges -> connected-component cluster ids.

Two implementations:

- ``cluster_driver_unionfind`` (default): stream the EDGES (small relative to
  the corpus — only confirmed dup pairs plus exact-rep links) to the driver,
  run union-find, broadcast the resulting component map via ``ray.put`` and
  label all conversations in a single ``map_batches`` — no extra shuffle.
- ``propagate_labels``: scale path for adversarial edge volumes — iterative
  min-label propagation expressed as groupby-aggregate rounds (edge-count
  bounded; converges in O(component diameter) rounds; cf. BTS ICDE'24 in
  PAPERS.md for the balanced-tree refinement).

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


def propagate_labels(conversations, edge_datasets, max_rounds: int = 50):
    """Distributed min-label propagation (scale path, no driver state):

    labels(v) = min over rounds of (own label, labels of neighbors).  Each
    round is one groupby-aggregate over the (node -> candidate label) edge
    expansion; terminates when no label changes.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    edges = None
    for ds in edge_datasets:
        part = ds.select_columns(["a", "b"])
        edges = part if edges is None else edges.union(part)
    nodes = conversations.select_columns(["conv_id"])
    if edges is None:
        return nodes.map_batches(
            lambda t: t.append_column("cluster_id", t["conv_id"]),
            batch_format="pyarrow",
        )

    # label table: conv_id -> label (init: itself)
    labels = nodes.map_batches(
        lambda t: pa.table(
            {"conv_id": t["conv_id"], "label": t["conv_id"]}
        ),
        batch_format="pyarrow",
    )
    edges = edges.materialize()  # reused every round; edge set is the small side

    for _ in range(max_rounds):
        # candidate labels flowing across edges in both directions
        def expand(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "conv_id": pa.concat_arrays(
                        [t["a"].combine_chunks(), t["b"].combine_chunks()]
                    ),
                    "other": pa.concat_arrays(
                        [t["b"].combine_chunks(), t["a"].combine_chunks()]
                    ),
                }
            )

        flow = edges.map_batches(expand, batch_format="pyarrow").join(
            labels.rename_columns({"conv_id": "other", "label": "other_label"}),
            join_type="inner",
            num_partitions=16,
            on=("other",),
        ).select_columns(["conv_id", "other_label"]).rename_columns(
            {"other_label": "cand"}
        )
        own = labels.rename_columns({"label": "cand"})
        new_labels = (
            flow.union(own)
            .groupby("conv_id")
            .aggregate(Min("cand", alias_name="label"))
            .materialize()
        )
        # convergence check: total label "order" stabilizes
        changed = new_labels.join(
            labels.rename_columns({"label": "old_label"}),
            join_type="inner",
            num_partitions=16,
            on=("conv_id",),
        ).map_batches(
            lambda t: t.filter(
                pa.compute.not_equal(t["label"], t["old_label"])
            ).select(["conv_id"]),
            batch_format="pyarrow",
        )
        labels = new_labels
        if changed.count() == 0:
            break
    return labels.rename_columns({"label": "cluster_id"})
