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
        sim_a = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sim_b = batch["simhash_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ham = hamming_distance(sim_a, sim_b).astype(np.int32)
        jac, cont = batch_jaccard_containment_arrow(
            batch["shingles"], batch["shingles_b"]
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


def _attach_texts(candidates, conversations, num_partitions: int | None = None):
    """Attach both endpoints' normalized doc_text (``doc_text``/``doc_text_b``) via
    two conv_id-keyed hash joins — NO driver-side id->text dict anywhere on
    the path (round-2 verdict item #4; the old ``iter_batches``->dict
    broadcast was the last flagship driver materialization).

    The conversations side is first reduced OFF-DRIVER to candidate endpoints
    (``distinct_values_ref`` -> ``pc.is_in`` semi-filter), so the joins only
    shuffle the tiny survivor slice of the corpus.  Returns None when there
    are no candidates.
    """
    from ..state.partitioning import (
        distinct_values_ref,
        materialize_clean,
        resolve_partitions,
        semi_filter,
    )

    num_partitions = resolve_partitions(num_partitions)
    ids_ref, n_ids = distinct_values_ref(candidates, ["a", "b"])
    if n_ids == 0:
        return None
    texts = semi_filter(
        conversations.select_columns(["conv_id", "doc_text"]), "conv_id", ids_ref
    )
    # candidate endpoint sets are tiny -> the semi-filtered right side is
    # sparse by construction; scrub zero-column empties (which skip
    # map_batches UDFs and would crash the Acero join's right side) before
    # both joins read it
    texts = materialize_clean(texts)
    # No rename Project after either join: zero-row join partitions SKIP map
    # operators, so a rename would leave stale pre-rename schemas on the
    # empties (typed schema-divergence warnings at the sink).  The A text
    # keeps the conversations table's own name (``doc_text``); the second
    # join's collision suffix names the B text ``doc_text_b`` — the join
    # stamps ONE schema on every bundle, empties included.
    j = candidates.join(
        texts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("a",),
        right_on=("conv_id",),
        right_suffix="_a",
    )
    # candidate sets are tiny by construction -> empty join partitions are
    # plausible; scrub zero-column blocks before the second Acero join (the
    # Ray 2.49 failure state/partitioning.materialize_clean documents)
    j = materialize_clean(j)
    return j.join(
        texts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("b",),
        right_on=("conv_id",),
        right_suffix="_b",
    )


def _exact_confirm_batch(batch: pa.Table, with_lcs: bool) -> pa.Table:
    """Vectorized exact-containment confirm over a joined batch with aligned
    ``doc_text`` (A endpoint) / ``doc_text_b`` (B endpoint) columns: rows are
    grouped by their SHORTER text so
    each unique pattern runs ONE ``pc.match_substring`` kernel over the
    aligned longer texts (the adversarial many-containment case — one short
    doc embedded in many long ones — collapses to a single vectorized scan).
    ``lcs_tokens`` (generalized-suffix-array longest common token run,
    functions/suffix.py) is computed only for CONFIRMED pairs."""
    drop = ["doc_text", "doc_text_b"]
    n = batch.num_rows
    if n == 0:
        out = batch.drop_columns(drop)
        if with_lcs:
            out = out.append_column("lcs_tokens", pa.array([], pa.int64()))
        return out
    ta = pc.fill_null(batch["doc_text"], "")
    tb = pc.fill_null(batch["doc_text_b"], "")
    la = pc.utf8_length(ta).to_numpy(zero_copy_only=False)
    lb = pc.utf8_length(tb).to_numpy(zero_copy_only=False)
    a_small = la <= lb
    ta_np = ta.to_numpy(zero_copy_only=False)
    tb_np = tb.to_numpy(zero_copy_only=False)
    small = np.where(a_small, ta_np, tb_np)
    large = np.where(a_small, tb_np, ta_np)
    keep = np.zeros(n, dtype=bool)
    order = np.argsort(small, kind="stable")
    sorted_small = small[order]
    starts = np.flatnonzero(
        np.r_[True, sorted_small[1:] != sorted_small[:-1]]
    )
    bounds = np.r_[starts, n]
    for s, e in zip(bounds[:-1], bounds[1:]):
        pat = sorted_small[s]
        if not pat:
            continue
        idx = order[s:e]
        m = pc.match_substring(pa.array(large[idx], pa.string()), pattern=pat)
        keep[idx] = m.to_numpy(zero_copy_only=False)
    out = batch.filter(pa.array(keep)).drop_columns(drop)
    if with_lcs:
        from ..functions.hashing import TokenHasher
        from ..functions.suffix import longest_common_substring
        from ..functions.text import tokenize

        hasher = TokenHasher()
        lcs = [
            longest_common_substring(
                hasher.hash_tokens(tokenize(s)), hasher.hash_tokens(tokenize(g))
            )
            for s, g in zip(small[keep], large[keep])
        ]
        out = out.append_column("lcs_tokens", pa.array(lcs, pa.int64()))
    return out


def confirm_substring(candidates, conversations, num_partitions: int | None = None):
    """Exact-text confirm for substring CANDIDATE pairs (method='substring'
    rows from the unified verifier): attach both endpoint texts via keyed
    hash joins, keep only pairs where the shorter normalized text occurs
    verbatim in the longer, and append suffix-array ``lcs_tokens`` evidence
    for the confirmed pairs.  Fully streaming — no driver materialization."""
    joined = _attach_texts(candidates, conversations, num_partitions)
    if joined is None:
        return candidates

    return joined.map_batches(
        lambda b: _exact_confirm_batch(b, with_lcs=True), batch_format="pyarrow"
    )


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
    the actual doc_texts via two more conv_id-keyed hash joins over the
    semi-filtered (tiny) conversation slice — the survivors are materialized
    first so the two join graphs never chain 4 joins in one execution
    (aggregator-actor over-subscription on small clusters).
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

    # --- exact-text confirm on the survivors (keyed joins, no driver map) ---
    joined = _attach_texts(contained, conversations, num_partitions)
    if joined is None:
        return contained
    return joined.map_batches(
        lambda b: _exact_confirm_batch(b, with_lcs=False), batch_format="pyarrow"
    )
