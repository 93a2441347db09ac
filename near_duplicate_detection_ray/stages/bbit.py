"""b-bit minwise hashing candidate prefilter (Li & Koenig, WWW 2010).

At 100-TB scale the expensive part of verification is not the Jaccard
arithmetic — it is SHIPPING each candidate pair's full shingle-hash sets
(kilobytes per side for a long conversation) through the object store to the
verify actors.  LSH banding is intentionally recall-first (32 bands x 4 rows
collides plenty of sub-tau pairs, and capped hot buckets add spanning-edge
candidates that are mostly garbage), so a large fraction of that exchange is
spent on pairs the verifier immediately rejects.

b-bit minwise hashing compresses each document's ALREADY-COMPUTED MinHash
signature (``num_perm`` x uint64) to the lowest ``b`` bits per permutation —
16 bytes per document at num_perm=128, b=1 — and estimates Jaccard from the
fraction ``c`` of matching bit positions:

    E[c] = J + (1 - J) / 2**b        =>        J_hat = (c - 2**-b) / (1 - 2**-b)

(for b=1: ``J_hat = 2c - 1``).  The prefilter attaches only these 16-byte
payloads to candidate pairs (same semi-filtered two-join plan as the full
attach), drops pairs whose estimate sits more than ``z`` standard errors
BELOW tau, and hands the survivors to the unchanged exact verifier — so the
operator's OUTPUT is decided by exact Jaccard, never by the estimate.

Safety: sd(c) <= 0.5 / sqrt(num_perm), so
sd(J_hat) <= 1 / (2 * sqrt(num_perm) * (1 - 2**-b)); at num_perm=128,
b=1, z=6 the keep threshold is tau - 0.53, i.e. a TRUE tau-pair is dropped
only on a 6-sigma estimate deviation (P < 1e-9 per pair under the fixed
seeded permutations) while boilerplate-band collisions at J ~ 0.2-0.35 are
rejected before their kilobyte shingle blobs ever travel.  The same
probabilistic-recall argument already underwrites the LSH banding itself
(P[miss at tau] < 5e-8): both stages are deterministic functions of the
seeded signature config, and the exact verifier confirms every survivor.

Reference analogue: the reference ships full CNN feature vectors to its
distance loop (``ndd/server_ndd.py:108-117``); this stage is the
signature-compression refinement its architecture has no room for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import NDDConfig

_POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.uint8)


def bbit_pack_batch(mh: np.ndarray) -> np.ndarray:
    """(n, k) uint64 MinHash matrix -> (n, k // 8) packed lowest-bit bytes
    (b = 1).  Vectorized: one mask + one packbits per batch."""
    bits = (mh & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits, axis=1)


def bbit_columns(signatures, num_perm: int):
    """Project a signatures Dataset to (conv_id, bbit) where ``bbit`` is the
    fixed-size packed b=1 sketch — the 16-byte-per-doc payload the prefilter
    joins instead of the full shingle blobs."""
    nbytes = num_perm // 8
    schema = pa.schema(
        [("conv_id", pa.string()), ("bbit", pa.binary(nbytes))]
    )

    def pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.Table.from_pylist([], schema=schema)
        mh = np.asarray(t["minhash"].combine_chunks().flatten(), dtype=np.uint64)
        mh = mh.reshape(t.num_rows, num_perm)
        packed = bbit_pack_batch(mh)
        sketch = pa.Array.from_buffers(
            pa.binary(nbytes), t.num_rows,
            [None, pa.py_buffer(packed.tobytes())],
        )
        return pa.table({"conv_id": t["conv_id"], "bbit": sketch}, schema=schema)

    return signatures.select_columns(["conv_id", "minhash"]).map_batches(
        pack, batch_format="pyarrow"
    )


def bbit_estimate(x: np.ndarray, y: np.ndarray, num_perm: int) -> np.ndarray:
    """Row-wise b=1 Jaccard estimate from packed sketches: J_hat = 2c - 1
    where c is the fraction of AGREEING bit positions (popcount of XNOR)."""
    diff = _POPCNT[np.bitwise_xor(x, y)].sum(axis=1).astype(np.float64)
    c = 1.0 - diff / float(num_perm)
    return 2.0 * c - 1.0


def prefilter_candidates(pairs, signatures, cfg: NDDConfig | None = None,
                         z: float = 6.0,
                         num_partitions: int | None = None):
    """Candidate (a, b) pairs -> surviving (a, b) pairs whose b-bit Jaccard
    estimate could still reach ``cfg.tau`` (keep iff
    ``J_hat >= tau - z * sd``).  Joins 16-byte sketches, never shingles."""
    from .verify import attach_signatures

    cfg = cfg or NDDConfig()
    num_perm = cfg.num_perm
    sd = 1.0 / np.sqrt(num_perm)  # sd(J_hat) = 2 * sd(c) <= 2 / (2 sqrt(k))
    keep_at = cfg.tau - z * sd

    sketches = bbit_columns(signatures, num_perm)
    joined = attach_signatures(
        pairs, sketches, num_partitions=num_partitions, columns=["bbit"]
    )
    nbytes = num_perm // 8
    out_schema = pa.schema([("a", pa.string()), ("b", pa.string())])

    def _rows(col: pa.ChunkedArray, n: int) -> np.ndarray:
        # zero-copy view of the fixed-size binary data buffer
        arr = col.combine_chunks()
        buf = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
        start = arr.offset * nbytes
        return buf[start : start + n * nbytes].reshape(n, nbytes)

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        x = _rows(t["bbit"], t.num_rows)
        y = _rows(t["bbit_b"], t.num_rows)
        j_hat = bbit_estimate(x, y, num_perm)
        mask = pa.array(j_hat >= keep_at)
        return pa.table(
            {"a": t["a"], "b": t["b"]}, schema=out_schema
        ).filter(mask)

    return joined.map_batches(keep, batch_format="pyarrow")
