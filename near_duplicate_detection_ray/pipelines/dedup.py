"""The flagship near-duplicate pipeline (north_star):

    transcripts
      -> assemble (groupby conv_id shuffle)                 [stages/assemble]
      -> exact-fingerprint pre-dedup (groupby fingerprint)  [stages/exact]
      -> MinHash/SimHash signatures (actor pool)            [stages/signatures]
      -> LSH band explode -> groupby(band) -> cand pairs    [stages/lsh]
      -> exact-Jaccard / Hamming verify (actor pool, joins) [stages/verify]
      -> anchor-shingle substring pass (optional)           [stages/substring]
      -> union-find clustering                              [stages/cluster]

Only fingerprint REPRESENTATIVES flow through signatures/LSH/verify — exact
copies (including all degenerate docs) are collapsed first, which is both the
skew guard and the dominant cost saving at scale (SURVEY §4).

End-to-end semantics are pinned by the NumPy oracle
(``near_duplicate_detection_ray.oracle``): dup-pair recall >= 0.99 at identical
config, asserted in tests/test_pipeline_e2e.py.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import NDDConfig
from ..stages.assemble import assemble_conversations
from ..stages.cluster import cluster_driver_unionfind
from ..stages.exact import exact_rep_map, representatives
from ..stages.lsh import candidate_pairs, explode_bands
from ..stages.signatures import sign_conversations
from ..stages.substring import substring_pairs
from ..stages.verify import verify_pairs
from ..state.partitioning import materialize_clean


def exact_edges(rep_map):
    """(conv_id, rep_id) -> (a, b) union-find edges for non-representatives."""
    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["conv_id"], t["rep_id"]))
        return pa.table({"a": t["rep_id"], "b": t["conv_id"]})

    return rep_map.map_batches(fn, batch_format="pyarrow")


def near_dup_pipeline(
    transcripts,
    cfg: NDDConfig | None = None,
    include_substring: bool = True,
    concurrency=None,
    num_partitions: int = 8,
):
    """Run the full pipeline; returns a dict of Datasets:

    ``conversations`` (all convs), ``rep_map``, ``signatures`` (reps only),
    ``dup_pairs`` (rep domain, jaccard >= tau), ``substring_pairs`` (optional),
    ``clusters`` (every conv_id -> cluster_id).

    ``conversations``/``signatures`` are materialized because multiple
    downstream stages consume them (checkpointed runs write Parquet instead —
    see stages/checkpoint.py); everything else streams.
    """
    cfg = cfg or NDDConfig()
    conversations = materialize_clean(assemble_conversations(transcripts))
    rep_map = materialize_clean(exact_rep_map(conversations))
    reps = representatives(conversations, rep_map, num_partitions=num_partitions)
    signatures = materialize_clean(sign_conversations(reps, cfg, concurrency=concurrency))
    bands = explode_bands(signatures, cfg)
    cand = candidate_pairs(bands, cfg)
    dup_pairs = verify_pairs(
        cand, signatures, cfg, concurrency=concurrency, num_partitions=num_partitions
    ).materialize()

    edge_sets = [exact_edges(rep_map), dup_pairs]
    sub_pairs = None
    if include_substring:
        sub_pairs = substring_pairs(
            signatures, conversations, cfg,
            concurrency=concurrency, num_partitions=num_partitions,
        ).materialize()
        edge_sets.append(sub_pairs)

    clusters = cluster_driver_unionfind(conversations, edge_sets)

    out = {
        "conversations": conversations,
        "rep_map": rep_map,
        "signatures": signatures,
        "dup_pairs": dup_pairs,
        "clusters": clusters,
    }
    if sub_pairs is not None:
        out["substring_pairs"] = sub_pairs
    return out
