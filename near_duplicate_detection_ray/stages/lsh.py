"""LSH stage: band explode -> keyed hash-partition shuffle -> candidate pairs.

This replaces the reference's brute-force O(N * 1536) distance scan over an
in-memory matrix (``ndd/server_ndd.py:108-117``) with the scalable LSH band
table: the ONE wide shuffle of the pipeline (north_star: "LSH band hashing with
a groupby-aggregate shuffle into candidate buckets").

Execution shape (see state/partitioning.py): the band table is hash-partitioned
by ``bucket`` (each bucket lands wholly in one block), then pair generation is
VECTORIZED block-locally — numpy group-boundary detection; Python touches only
buckets with >= 2 members, never the singleton majority.  Distinct-ness of the
resulting pairs is another keyed repartition + block-local Arrow ``group_by``.

Skew handling (SURVEY §4): buckets larger than ``cfg.bucket_cap`` would emit
O(n^2) pairs (boilerplate/degenerate content collides massively).  Oversized
buckets switch to SPANNING-EDGE emission — a star + chain over the sorted
members (2(n-1) edges) — preserving connectivity for clustering while bounding
pair volume; the ``capped`` flag is carried for metrics.  Degenerate docs never
enter banding (their sentinel MinHash would collide trivially); they are
deduped by exact fingerprint upstream (SURVEY §2 M13).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import NDDConfig
from ..functions.hashing import band_hashes
from ..state.partitioning import key_partitioned

BANDS_SCHEMA = pa.schema([("bucket", pa.uint64()), ("conv_id", pa.string())])

PAIRS_SCHEMA = pa.schema(
    [("a", pa.string()), ("b", pa.string()), ("capped", pa.bool_())]
)


class BandExploder:
    """map_batches fn: signatures -> (bucket, conv_id) rows, one per band.
    ``bucket`` is the per-band-seeded hash, so band identity is already mixed
    into the key (cross-band collisions only add verifier-filtered candidates)."""

    def __init__(self, cfg: NDDConfig | None = None) -> None:
        self.cfg = cfg or NDDConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        batch = batch.filter(pc.invert(batch["is_degenerate"]))
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"bucket": pa.array([], pa.uint64()),
                 "conv_id": pa.array([], pa.string())},
                schema=BANDS_SCHEMA,
            )
        mh = np.asarray(
            batch["minhash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(n, cfg.num_perm)
        bh = band_hashes(mh, cfg.bands, cfg.rows_per_band, cfg.seed)  # (n, bands)
        idx = np.repeat(np.arange(n, dtype=np.int64), cfg.bands)
        return pa.table(
            {
                "bucket": pa.array(bh.reshape(-1), pa.uint64()),
                "conv_id": batch["conv_id"].take(pa.array(idx)),
            },
            schema=BANDS_SCHEMA,
        )


def explode_bands(signatures, cfg: NDDConfig | None = None):
    return signatures.select_columns(["conv_id", "minhash", "is_degenerate"]).map_batches(
        BandExploder(cfg), batch_format="pyarrow"
    )


def _pairs_in_block(batch: pa.Table, cap: int) -> pa.Table:
    """Vectorized pair generation over one hash-partition block.

    One (bucket, conv) lexsort dedups members and segments buckets; pairs are
    then emitted per GROUP-SIZE CLASS — for every distinct bucket size m, all
    buckets of that size produce their triu pairs in one (n_groups x P) index
    operation.  Bucket sizes are tiny and Zipfian, so this replaces the former
    per-bucket Python loop (one np.unique + triu per bucket — measured 3.1 s
    per 375 k-row partition) with a handful of size-class iterations (0.27 s,
    identical output).  Over-cap buckets keep the spanning-edge semantics
    (star from first + chain; capped=True) and are rare enough to loop."""
    n = batch.num_rows
    if n == 0:
        return pa.Table.from_pylist([], schema=PAIRS_SCHEMA)
    bucket = batch["bucket"].to_numpy(zero_copy_only=False)
    # Dictionary-encode conv ids once: all sorting/dedup below runs on int64
    # RANKS (rank order == string order via the sorted-vocab permutation);
    # strings are touched again only to materialize the OUTPUT pairs — output
    # volume is orders of magnitude below input row volume.
    col = batch["conv_id"].combine_chunks()
    enc = col.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    sort_idx = pc.array_sort_indices(vocab).to_numpy(zero_copy_only=False).astype(np.int64)
    rank = np.empty(len(vocab), dtype=np.int64)
    rank[sort_idx] = np.arange(len(vocab), dtype=np.int64)
    r = rank[codes]
    order = np.lexsort((r, bucket))
    bs = bucket[order]
    rs = r[order]
    keep = np.concatenate(([True], (bs[1:] != bs[:-1]) | (rs[1:] != rs[:-1])))
    bs = bs[keep]
    rs = rs[keep]
    starts = np.flatnonzero(np.concatenate(([True], bs[1:] != bs[:-1])))
    counts = np.diff(np.append(starts, len(bs)))
    g2 = np.flatnonzero(counts >= 2)
    if len(g2) == 0:
        return pa.Table.from_pylist([], schema=PAIRS_SCHEMA)
    # segment groups by SIZE via one argsort (a per-size boolean mask over
    # all groups re-scanned the group table once per distinct size)
    c2 = counts[g2]
    s2 = starts[g2]
    o = np.argsort(c2, kind="stable")
    c2 = c2[o]
    s2 = s2[o]
    seg = np.flatnonzero(np.concatenate(([True], c2[1:] != c2[:-1])))
    seg_end = np.append(seg[1:], len(c2))
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_capped: list[np.ndarray] = []
    for si, ei in zip(seg, seg_end):
        m = int(c2[si])
        sel = s2[si:ei]
        if m <= cap:
            ai, bi = np.triu_indices(m, k=1)
            out_a.append(rs[(sel[:, None] + ai[None, :]).ravel()])
            out_b.append(rs[(sel[:, None] + bi[None, :]).ravel()])
            out_capped.append(np.zeros(len(sel) * len(ai), dtype=bool))
        else:
            # spanning edges: star from first + chain through sorted order
            for s in sel:
                members = rs[s : s + m]
                a = np.concatenate([np.repeat(members[:1], m - 1), members[1:-1]])
                b = np.concatenate([members[1:], members[2:]])
                out_a.append(a)
                out_b.append(b)
                out_capped.append(np.ones(len(a), dtype=bool))
    sorted_vocab = vocab.take(pa.array(sort_idx))
    ra = np.concatenate(out_a)
    rb = np.concatenate(out_b)
    capped = np.concatenate(out_capped)
    # MAP-SIDE pre-distinct (combiner): a true dup pair collides in many bands,
    # so several of its band-buckets usually land in this same hash partition
    # and emit the identical (a, b) row.  Dedup on int ranks BEFORE
    # materializing strings — shrinks both the string-take cost here and the
    # (a, b) exchange volume; the post-shuffle _distinct_pairs_block stays the
    # global authority (capped folds with max/any on both levels).
    key = ra * np.int64(len(vocab)) + rb
    order2 = np.argsort(key, kind="stable")
    key_s = key[order2]
    first = np.concatenate(([True], key_s[1:] != key_s[:-1]))
    seg_starts = np.flatnonzero(first)
    cap_any = np.add.reduceat(capped[order2].astype(np.int64), seg_starts) > 0
    uniq = order2[first]
    return pa.table(
        {
            "a": sorted_vocab.take(pa.array(ra[uniq])).cast(pa.string()),
            "b": sorted_vocab.take(pa.array(rb[uniq])).cast(pa.string()),
            "capped": pa.array(cap_any),
        },
        schema=PAIRS_SCHEMA,
    )


def _distinct_pairs_block(batch: pa.Table) -> pa.Table:
    """Block-local distinct on (a, b) via Arrow's native group_by (pairs are
    co-located by the keyed repartition).  capped = any occurrence capped."""
    if batch.num_rows == 0:
        return batch
    agg = batch.group_by(["a", "b"]).aggregate([("capped", "max")])
    return agg.rename_columns(["a", "b", "capped"]).cast(PAIRS_SCHEMA)


def candidate_pairs(bands, cfg: NDDConfig | None = None, num_partitions: int | None = None):
    """bands Dataset -> distinct candidate (a, b) pairs, a < b.

    Two keyed-repartition shuffles: by ``bucket`` for pair-gen, by ``(a, b)``
    for distinct-ness (the same pair typically collides in many bands —
    SURVEY §2.5 A6 / §2.7 D1)."""
    cfg = cfg or NDDConfig()
    parts = key_partitioned(bands, ["bucket"], num_partitions)
    pairs = parts.map_batches(
        lambda t: _pairs_in_block(t, cfg.bucket_cap),
        batch_format="pyarrow",
        batch_size=None,
    )
    return key_partitioned(pairs, ["a", "b"], num_partitions).map_batches(
        _distinct_pairs_block, batch_format="pyarrow", batch_size=None
    )
