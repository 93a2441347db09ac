"""LSH stage: band explode -> groupby(band) shuffle -> candidate pairs.

This replaces the reference's brute-force O(N * 1536) distance scan over an
in-memory matrix (``ndd/server_ndd.py:108-117``) with the scalable LSH band
table: the ONE wide shuffle of the pipeline (north_star: "LSH band hashing with
a groupby-aggregate shuffle into candidate buckets").

Skew handling (SURVEY §4): buckets larger than ``cfg.bucket_cap`` would emit
O(n^2) pairs (boilerplate/degenerate content collides massively).  Oversized
buckets switch to SPANNING-EDGE emission — a star + chain over the sorted
members (2(n-1) edges) — which preserves connectivity for clustering while
bounding pair volume; the ``capped`` flag is carried so metrics can report how
often it fired.  Degenerate docs never enter banding (their all-sentinel
MinHash would collide trivially); they are deduped by exact fingerprint
upstream (SURVEY §2 M13).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import NDDConfig
from ..functions.hashing import band_hashes

BANDS_SCHEMA = pa.schema(
    [
        ("band_id", pa.int32()),
        ("band_hash", pa.uint64()),
        ("conv_id", pa.string()),
    ]
)

PAIRS_SCHEMA = pa.schema(
    [("a", pa.string()), ("b", pa.string()), ("capped", pa.bool_())]
)


class BandExploder:
    """Stateless-math map_batches fn: signatures -> (band_id, band_hash, conv_id)
    rows, ``bands`` rows per non-degenerate signature."""

    def __init__(self, cfg: NDDConfig | None = None) -> None:
        self.cfg = cfg or NDDConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        batch = batch.filter(pc.invert(batch["is_degenerate"]))
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"band_id": pa.array([], pa.int32()),
                 "band_hash": pa.array([], pa.uint64()),
                 "conv_id": pa.array([], pa.string())},
                schema=BANDS_SCHEMA,
            )
        mh = np.asarray(
            batch["minhash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(n, cfg.num_perm)
        bh = band_hashes(mh, cfg.bands, cfg.rows_per_band, cfg.seed)  # (n, bands)
        conv_ids = batch["conv_id"]
        band_ids = np.tile(np.arange(cfg.bands, dtype=np.int32), n)
        # row-major flatten of (n, bands) pairs each conv_id with its band hashes
        idx = np.repeat(np.arange(n, dtype=np.int64), cfg.bands)
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
                "conv_id": conv_ids.take(pa.array(idx)),
            },
            schema=BANDS_SCHEMA,
        )


def explode_bands(signatures, cfg: NDDConfig | None = None):
    return signatures.select_columns(["conv_id", "minhash", "is_degenerate"]).map_batches(
        BandExploder(cfg), batch_format="pyarrow"
    )


def _pairs_for_group(group: pa.Table, cap: int) -> pa.Table:
    cids = sorted(set(group["conv_id"].to_pylist()))
    n = len(cids)
    if n < 2:
        return pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
             "capped": pa.array([], pa.bool_())},
            schema=PAIRS_SCHEMA,
        )
    if n <= cap:
        a_idx, b_idx = np.triu_indices(n, k=1)
        a = [cids[i] for i in a_idx]
        b = [cids[j] for j in b_idx]
        capped = False
    else:
        # spanning edges: star from first member + chain through sorted order
        a = [cids[0]] * (n - 1) + cids[1:-1]
        b = cids[1:] + cids[2:]
        capped = True
    return pa.table(
        {
            "a": pa.array(a, pa.string()),
            "b": pa.array(b, pa.string()),
            "capped": pa.array([capped] * len(a)),
        },
        schema=PAIRS_SCHEMA,
    )


def candidate_pairs(bands, cfg: NDDConfig | None = None):
    """bands Dataset -> distinct candidate (a, b) pairs, a < b.

    Two shuffles: groupby (band_id, band_hash) for bucket pair-gen, then
    groupby (a, b) for distinct-ness (the same pair typically collides in many
    bands — A6/D1 semantics in SURVEY §2.5/§2.7).
    """
    cfg = cfg or NDDConfig()
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: _pairs_for_group(g, cfg.bucket_cap), batch_format="pyarrow"
    )
    # distinct on (a, b): keep one row per pair (capped = OR over occurrences,
    # via max since bool max == any)
    from ray.data.aggregate import Max

    distinct = pairs.groupby(["a", "b"]).aggregate(Max("capped", alias_name="capped"))
    return distinct
