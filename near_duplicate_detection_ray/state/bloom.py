"""Distributed Bloom filter for semi-join reduction beyond the exact-id regime.

``stages/verify.attach_signatures`` reduces its two signature joins with an
exact distinct-endpoint-id set while that set is small
(``state/partitioning.endpoint_stats``).  Past ``semi_filter_max_ids`` the
value_set itself becomes the bottleneck (every filter task probes a hash set
of tens of millions of strings), so this module provides the documented next
step: a fixed-size bit-array Bloom filter

  - BUILT off-driver: per-block partial bit arrays (one vectorized pass over
    the block's ids), OR-merged through a remote tree — the driver never sees
    an id, only the final ObjectRef of the uint64 bit array;
  - APPLIED as a vectorized mask: k probe positions per id via double hashing
    (Kirsch-Mitzenmacher: pos_i = h1 + i*h2 mod m), all-bits-set test in
    numpy; no per-row Python.

False POSITIVES only pass extra rows into the downstream INNER join, which
drops them — the filter is a pure bandwidth optimization and cannot change
results.  False negatives are impossible by construction.

Hashes come from ``pandas.util.hash_array`` (public, deterministic SipHash
with an explicit key — no PYTHONHASHSEED dependence), one call per batch over
the whole id column.

Sizing: ``bits_for(n, fp_rate)`` gives the standard m = -n ln p / (ln 2)^2,
rounded up to a power of two so probe positions reduce with a mask instead of
a modulo.  At the 5 M-id handoff point and 1% target FPR this is a 8 MiB bit
array — ``ray.put`` once, zero-copy-read by every filter task; at 500 M ids
it is ~766 MiB, still one object-store entry per node rather than a shuffled
join side.
"""

from __future__ import annotations

import math

import numpy as np

_HASH_KEY_1 = "0123456789123456"  # 16-byte SipHash keys (fixed, documented)
_HASH_KEY_2 = "6543210987654321"


def bits_for(n_ids: int, fp_rate: float = 0.01) -> int:
    """Bloom size in bits for ``n_ids`` keys at ``fp_rate``, next power of two
    (min 2**13 so tiny inputs still get a real array)."""
    n_ids = max(1, n_ids)
    m = -n_ids * math.log(fp_rate) / (math.log(2) ** 2)
    return 1 << max(13, math.ceil(math.log2(m)))


def hashes_for(n_bits: int, n_ids: int) -> int:
    """Optimal k = (m/n) ln 2, clamped to [1, 16]."""
    k = round(n_bits / max(1, n_ids) * math.log(2))
    return int(min(16, max(1, k)))


def _probe_positions(values, n_bits: int, k: int) -> np.ndarray:
    """(len(values), k) int64 probe positions via double hashing."""
    import pandas as pd

    vals = np.asarray(values, dtype=object)
    h1 = pd.util.hash_array(vals, hash_key=_HASH_KEY_1).astype(np.uint64)
    h2 = pd.util.hash_array(vals, hash_key=_HASH_KEY_2).astype(np.uint64)
    # force h2 odd so probe strides cycle the full power-of-two table
    h2 |= np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    pos = h1[:, None] + i[None, :] * h2[:, None]  # wraps mod 2**64
    return (pos & np.uint64(n_bits - 1)).astype(np.int64)


def _set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(
        words, flat >> 6, np.uint64(1) << (flat.astype(np.uint64) & np.uint64(63))
    )


def _test_bits(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Boolean mask: for each row, ALL k probe bits set."""
    w = words[pos >> 6]
    bit = np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
    return ((w & bit) != 0).all(axis=1)


def build_bloom(ds, cols: list[str], n_ids: int, fp_rate: float = 0.01):
    """Build a Bloom filter of the union of ``cols`` values of ``ds`` entirely
    off-driver.  Returns ``(words_ref, n_bits, k)`` where ``words_ref`` is an
    ObjectRef to the uint64[n_bits/64] bit array."""
    import pyarrow as pa
    import ray

    n_bits = bits_for(n_ids, fp_rate)
    k = hashes_for(n_bits, n_ids)

    def block_bloom(t: pa.Table) -> pa.Table:
        words = np.zeros(n_bits >> 6, dtype=np.uint64)
        for c in cols:
            vals = t[c].to_numpy(zero_copy_only=False)
            if len(vals):
                _set_bits(words, _probe_positions(vals, n_bits, k))
        # ship the partial as a single fixed-size binary cell
        return pa.table({"bloom": pa.array([words.tobytes()], pa.large_binary())})

    # materialize first: to_arrow_refs() on a lazy dataset re-executes the
    # upstream graph once more for its schema probe (state/partitioning.py)
    refs = ds.select_columns(cols).map_batches(
        block_bloom, batch_format="pyarrow"
    ).materialize().to_arrow_refs()

    @ray.remote
    def merge(*tables):
        words = np.zeros(n_bits >> 6, dtype=np.uint64)
        for t in tables:
            if t.num_rows and t.num_columns:
                for blob in t["bloom"].to_pylist():
                    words |= np.frombuffer(blob, dtype=np.uint64)
        return pa.table({"bloom": pa.array([words.tobytes()], pa.large_binary())})

    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 64]) for i in range(0, len(refs), 64)]

    @ray.remote
    def finalize(t):
        return np.frombuffer(t["bloom"][0].as_py(), dtype=np.uint64).copy()

    return finalize.remote(refs[0]), n_bits, k


def bloom_filter(ds, col: str, words_ref, n_bits: int, k: int):
    """Keep rows whose ``col`` value MAY be in the Bloom filter (vectorized
    probe; superset of the exact semi-join — pair with a downstream inner
    join)."""
    import pyarrow as pa
    import ray

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        words = ray.get(words_ref)
        vals = t[col].to_numpy(zero_copy_only=False)
        mask = _test_bits(words, _probe_positions(vals, n_bits, k))
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
