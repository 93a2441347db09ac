"""Substring-duplicate pass: finds long exact-substring containment dups that
plain Jaccard misses (a short conversation embedded verbatim in a long one has
LOW Jaccard but HIGH containment).

Scalable formulation (north_rule's "suffix-array substring pass" re-expressed
for Ray Data): instead of a monolithic suffix array, ANCHOR shingles — the
deterministic subset of shingle hashes with ``hash % anchor_mod == 0``
(winnowing-style sampling) — are exploded and grouped, so two documents sharing
any long run of text collide on the anchors inside that run.  Candidates are
confirmed in two steps: shingle-set containment >= containment_tau (cheap,
vectorized), then an exact normalized-substring check after joining the two
doc_texts (only for the few survivors).

The interval analogue in the reference is the frame->shot range join
(``ndd/server_ndd.py:217-220``, SURVEY §2 J1): match offsets -> containing
spans; here anchors -> containing documents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import NDDConfig
from ..state.partitioning import key_partitioned
from .lsh import _distinct_pairs_block, _pairs_in_block
from .verify import attach_signatures

# anchors reuse the lsh bucket-pair machinery: column named "bucket"
ANCHORS_SCHEMA = pa.schema([("bucket", pa.uint64()), ("conv_id", pa.string())])

SUBSTRING_PAIRS_SCHEMA = pa.schema(
    [
        ("a", pa.string()),
        ("b", pa.string()),
        ("jaccard", pa.float64()),
        ("hamming", pa.int32()),
        ("containment", pa.float64()),
        ("method", pa.string()),
    ]
)


class AnchorExploder:
    def __init__(self, cfg: NDDConfig | None = None) -> None:
        self.cfg = cfg or NDDConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.invert(batch["is_degenerate"]))
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"bucket": pa.array([], pa.uint64()),
                 "conv_id": pa.array([], pa.string())},
                schema=ANCHORS_SCHEMA,
            )
        from ..functions.similarity import _binary_column_view

        # zero-copy flatten of the packed shingle sets, one vectorized
        # modulus over every value at once (no per-row loop)
        vals, lens = _binary_column_view(batch["shingles"])
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        mod = np.uint64(self.cfg.anchor_mod)
        sel = vals % mod == np.uint64(0)
        flat = vals[sel]
        idx = row_idx[sel]
        return pa.table(
            {
                "bucket": pa.array(flat, pa.uint64()),
                "conv_id": batch["conv_id"].take(pa.array(idx)),
            },
            schema=ANCHORS_SCHEMA,
        )


class ContainmentVerifier:
    """Shingle-containment filter over joined candidate batches (columns as in
    verify.attach_signatures output)."""

    def __init__(self, cfg: NDDConfig | None = None) -> None:
        self.cfg = cfg or NDDConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import hamming_distance
        from ..functions.similarity import batch_jaccard_containment_arrow

        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return pa.Table.from_pylist([], schema=SUBSTRING_PAIRS_SCHEMA)
        sim_a = batch["simhash_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sim_b = batch["simhash_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ham = hamming_distance(sim_a, sim_b).astype(np.int32)
        jac, cont = batch_jaccard_containment_arrow(
            batch["shingles_a"], batch["shingles_b"]
        )
        # only pairs that are NOT already jaccard-dups but have high containment
        keep = (cont >= cfg.containment_tau) & (jac < cfg.tau)
        return pa.table(
            {
                "a": batch["a"],
                "b": batch["b"],
                "jaccard": pa.array(jac, pa.float64()),
                "hamming": pa.array(ham, pa.int32()),
                "containment": pa.array(cont, pa.float64()),
                "method": pa.array(["substring"] * n, pa.string()),
            },
            schema=SUBSTRING_PAIRS_SCHEMA,
        ).filter(pa.array(keep))


def anchor_buckets(signatures, cfg: NDDConfig | None = None):
    """(bucket, conv_id) rows from anchor shingles — same schema as the LSH
    band table, so the fused pipeline can UNION the two and run ONE
    repartition/pair-gen/distinct/verify chain for both dup kinds."""
    return signatures.select_columns(
        ["conv_id", "shingles", "is_degenerate"]
    ).map_batches(AnchorExploder(cfg), batch_format="pyarrow")


def _candidate_text_map_ref(candidates, conversations):
    """id -> normalized doc_text map for the candidate endpoints, as an
    object-store ref (None when there are no candidates).

    The endpoint-id set is computed OFF-DRIVER (``distinct_values_ref``) and
    applied with a vectorized ``pc.is_in`` semi-filter; only the surviving
    (conv_id, doc_text) rows — bounded by the confirmed-candidate count, tiny
    by construction — are pulled to the driver to build the broadcast map.
    """
    import ray

    from ..state.partitioning import distinct_values_ref, semi_filter

    ids_ref, n_ids = distinct_values_ref(candidates, ["a", "b"])
    if n_ids == 0:
        return None
    texts = semi_filter(
        conversations.select_columns(["conv_id", "doc_text"]), "conv_id", ids_ref
    )
    texts_tbl = pa.concat_tables(
        [
            b
            for b in texts.iter_batches(batch_size=65536, batch_format="pyarrow")
            if b.num_columns
        ]
    )
    text_map = dict(
        zip(texts_tbl["conv_id"].to_pylist(), texts_tbl["doc_text"].to_pylist())
    )
    return ray.put(text_map)


def confirm_substring(candidates, conversations):
    """Exact-text confirm for substring CANDIDATE pairs (method='substring'
    rows from the unified verifier): broadcast the needed id->text map
    (ray.put; the candidate set is tiny by construction) and keep only pairs
    where the shorter normalized text occurs verbatim in the longer."""
    import ray

    text_ref = _candidate_text_map_ref(candidates, conversations)
    if text_ref is None:
        return candidates

    def exact_confirm(batch: pa.Table) -> pa.Table:
        """Exact substring check plus suffix-array evidence: for confirmed
        pairs, ``lcs_tokens`` is the longest common token run computed via a
        generalized suffix array over the two token-hash sequences
        (functions/suffix.py) — the per-pair form of the north-star
        "suffix-array substring pass"."""
        from ..functions.hashing import TokenHasher
        from ..functions.suffix import longest_common_substring
        from ..functions.text import tokenize

        tm = ray.get(text_ref)
        hasher = TokenHasher()
        keep, lcs = [], []
        for x, y in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            ta, tb = tm.get(x, ""), tm.get(y, "")
            small, large = (ta, tb) if len(ta) <= len(tb) else (tb, ta)
            ok = bool(small) and small in large
            keep.append(ok)
            if ok:
                lcs.append(
                    longest_common_substring(
                        hasher.hash_tokens(tokenize(small)),
                        hasher.hash_tokens(tokenize(large)),
                    )
                )
        out = batch.filter(pa.array(keep))
        return out.append_column("lcs_tokens", pa.array(lcs, pa.int64()))

    return candidates.map_batches(exact_confirm, batch_format="pyarrow")


def substring_pairs(
    signatures,
    conversations,
    cfg: NDDConfig | None = None,
    concurrency=None,
    num_partitions: int | None = None,
):
    """signatures + conversations -> confirmed substring dup pairs.

    Execution shape: ONE streaming graph for anchors -> bucket pair-gen ->
    distinct -> signature joins -> containment filter (same 2-join/2-groupby
    shape as the verify stage), then the few survivors are confirmed against
    the actual doc_texts via a BROADCAST semi-join (``ray.put`` the id->text
    map, filter conversations streaming) instead of two more hash joins —
    chaining 4 joins in one graph over-subscribes aggregator actors on small
    clusters, and the survivor set is tiny by construction.
    """
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray

    cfg = cfg or NDDConfig()
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (max(1, cpus // 4), max(2, cpus // 2))
    anchors = signatures.select_columns(
        ["conv_id", "shingles", "is_degenerate"]
    ).map_batches(AnchorExploder(cfg), batch_format="pyarrow")
    pairs = key_partitioned(anchors, ["bucket"], num_partitions).map_batches(
        lambda t: _pairs_in_block(t, cfg.bucket_cap),
        batch_format="pyarrow",
        batch_size=None,
    )
    distinct = key_partitioned(pairs, ["a", "b"], num_partitions).map_batches(
        _distinct_pairs_block, batch_format="pyarrow", batch_size=None
    )
    # empty/zero-column-block guard (would break the downstream join schema)
    from ..state.partitioning import materialize_clean

    distinct = materialize_clean(distinct)
    if distinct.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.Table.from_pylist([], schema=SUBSTRING_PAIRS_SCHEMA))
    joined = attach_signatures(distinct, signatures, num_partitions=num_partitions)
    contained = joined.map_batches(
        ContainmentVerifier,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency,
        num_cpus=1,
    ).materialize()

    # --- exact-text confirm on the survivors (broadcast, no shuffle) ---
    text_ref = _candidate_text_map_ref(contained, conversations)
    if text_ref is None:
        return contained

    def exact_confirm(batch: pa.Table) -> pa.Table:
        tm = ray.get(text_ref)
        keep = []
        for x, y in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            ta, tb = tm.get(x, ""), tm.get(y, "")
            small, large = (ta, tb) if len(ta) <= len(tb) else (tb, ta)
            keep.append(bool(small) and small in large)
        return batch.filter(pa.array(keep))

    return contained.map_batches(exact_confirm, batch_format="pyarrow")
