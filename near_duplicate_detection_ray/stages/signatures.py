"""Signature stage: conversations -> MinHash + SimHash + shingle-set signatures.

This is the engine's analogue of the reference's stateful CNN feature stage
(``ndd/extract_features.py:26-38``): an expensive-setup, load-once model applied
per unit.  Here the "model" is the seeded MinHash permutation matrix + the
token-hash cache, built ONCE per actor in ``__init__`` and applied to whole
Arrow batches in ``__call__`` — run it with
``map_batches(Signer, concurrency=N, batch_format='pyarrow')``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import NDDConfig
from ..functions.hashing import (
    TokenHasher,
    apply_edge_exclusion,
    hash_token,
    minhash_batch,
    minhash_params,
    shingle_hashes,
    simhash_batch,
)

SIGNATURES_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("minhash", pa.list_(pa.uint64())),   # fixed length num_perm
        ("simhash", pa.uint64()),
        ("n_shingles", pa.int32()),
        # sorted unique shingle-hash set, packed as little-endian uint64 bytes:
        # binary payload survives Acero hash joins (list<uint64> does not)
        ("shingles", pa.binary()),
        ("fingerprint", pa.string()),
        ("is_degenerate", pa.bool_()),
    ]
)


class Signer:
    """Actor-pool callable: Arrow batch of conversations in, signatures out.

    All math is row-local and seeded, so output is invariant to how Ray Data
    splits blocks/batches (asserted by tests/test_stages.py).
    """

    def __init__(self, cfg: NDDConfig | None = None) -> None:
        self.cfg = cfg or NDDConfig()
        self.a, self.b = minhash_params(self.cfg.num_perm, self.cfg.seed)
        self.hasher = TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n_rows = batch.num_rows
        # Vectorized tokenize: doc_text is already normalized (single spaces,
        # no leading/trailing), so Arrow's whitespace split yields exactly the
        # tokens `functions.text.tokenize` would (asserted vs the oracle in
        # tests).  Tokens are hashed ONCE per unique value per batch (Zipfian
        # vocab => large win over the old per-token loop: ~400us -> ~40us/doc).
        import pyarrow.compute as pc

        col = batch["doc_text"].combine_chunks() if n_rows else pa.array([], pa.string())
        toks_list = pc.utf8_split_whitespace(col)
        offsets = toks_list.offsets.to_numpy(zero_copy_only=False)
        flat = toks_list.flatten()
        uniq = pc.unique(flat)
        # zero-copy buffer-sliced blake2b with batched digest decode — no
        # Python str objects or per-token int.from_bytes (bit-identical to
        # hash_token; the dict stays as the cross-batch warm start)
        uniq_hashes = self.hasher.hash_token_array(uniq)
        idx = pc.index_in(flat, value_set=uniq).to_numpy(zero_copy_only=False)
        flat_hashes = uniq_hashes[idx] if len(idx) else np.empty(0, dtype=np.uint64)

        # normalized "" may split to a single empty token; mask those as empty
        is_blank = (
            pc.equal(pc.utf8_length(col), 0).to_numpy(zero_copy_only=False)
            if n_rows
            else np.zeros(0, dtype=bool)
        )
        shingle_sets: list[np.ndarray] = []
        degenerate = np.zeros(n_rows, dtype=bool)
        for i in range(n_rows):
            th = flat_hashes[offsets[i] : offsets[i + 1]]
            n_tok = 0 if is_blank[i] else len(th)
            if n_tok < cfg.min_tokens:
                degenerate[i] = True
                shingle_sets.append(np.empty(0, dtype=np.uint64))
            else:
                th = apply_edge_exclusion(th, cfg.edge_exclude_tokens)
                shingle_sets.append(shingle_hashes(th, cfg.shingle_w))
        mh = minhash_batch(shingle_sets, self.a, self.b)  # (n, k)
        sh = simhash_batch(shingle_sets)

        n = n_rows
        mh_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(mh.reshape(-1), pa.uint64()), cfg.num_perm
        ).cast(pa.list_(pa.uint64()))
        lengths = np.fromiter((len(s) for s in shingle_sets), dtype=np.int64, count=n)
        sh_arr = pa.array([s.tobytes() for s in shingle_sets], pa.binary())
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "minhash": mh_arr,
                "simhash": pa.array(sh, pa.uint64()),
                "n_shingles": pa.array(lengths.astype(np.int32), pa.int32()),
                "shingles": sh_arr,
                "fingerprint": batch["fingerprint"],
                "is_degenerate": pa.array(degenerate),
            },
            schema=SIGNATURES_SCHEMA,
        )


def sign_conversations(conversations, cfg: NDDConfig | None = None, concurrency=None,
                       batch_size: int = 1024):
    """conversations Dataset -> signatures Dataset via a Signer actor pool.

    ``concurrency`` defaults to an AUTOSCALING pool (1, ~half the cluster CPUs):
    min=1 guarantees progress on small clusters (a fixed-size pool can deadlock
    against other stages' reservations), max bounds it so the pool doesn't
    starve the shuffle stages.
    """
    if concurrency is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
        # min = cpus//4 so the pool starts wide immediately (Ray's autoscaler
        # ramps too slowly for short stages: measured 13s vs 8s on 324k docs).
        # max ~ all CPUs minus driver/store headroom: the sign execution runs
        # BETWEEN materialize barriers (pure actor map, no shuffle aggregators
        # to starve), so capping at cpus//2 left half the cluster idle for the
        # pipeline's dominant compute stage
        concurrency = (max(1, cpus // 4), max(2, cpus - 2))
    return conversations.map_batches(
        Signer,
        fn_constructor_kwargs={"cfg": cfg or NDDConfig()},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
