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
    minhash_batch,
    minhash_params,
    shingle_hashes,
    simhash_batch,
)
from ..functions.text import tokenize

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
        texts = batch["doc_text"].to_pylist()
        shingle_sets: list[np.ndarray] = []
        degenerate = np.zeros(len(texts), dtype=bool)
        for i, text in enumerate(texts):
            toks = tokenize(text)  # doc_text is already normalized by assemble
            if len(toks) < cfg.min_tokens:
                degenerate[i] = True
                shingle_sets.append(np.empty(0, dtype=np.uint64))
            else:
                shingle_sets.append(
                    shingle_hashes(self.hasher.hash_tokens(toks), cfg.shingle_w)
                )
        mh = minhash_batch(shingle_sets, self.a, self.b)  # (n, k)
        sh = simhash_batch(shingle_sets)

        n = len(texts)
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
        # ramps too slowly for short stages: measured 13s vs 8s on 324k docs),
        # max = cpus//2 so shuffle/aggregator actors keep headroom
        concurrency = (max(1, cpus // 4), max(2, cpus // 2))
    return conversations.map_batches(
        Signer,
        fn_constructor_kwargs={"cfg": cfg or NDDConfig()},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
