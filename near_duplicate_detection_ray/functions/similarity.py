"""Similarity kernels: exact Jaccard over sorted uint64 sets, shingle
containment, cosine similarity blocks.

The exact-Jaccard verify is the analogue of the reference's brute-force
squared-L2 ranking over L2-normalized CNN features (``ndd/server_ndd.py:108-110``),
but thresholded instead of ranked (SURVEY §2 D2).
"""

from __future__ import annotations

import numpy as np


def jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two SORTED unique uint64 arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def containment_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """|A ∩ B| / min(|A|, |B|) over sorted unique uint64 arrays — high when the
    smaller document is (nearly) contained in the larger one, even when plain
    Jaccard is low.  Drives the exact-substring dup pass (north_rule)."""
    if len(a) == 0 or len(b) == 0:
        return 0.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / min(len(a), len(b))


def batch_set_stats(
    blobs_a: list[bytes], blobs_b: list[bytes]
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-pair set statistics over PACKED uint64 blobs, fully vectorized.

    Each blob is a sorted-unique uint64 set packed as little-endian bytes (the
    join-safe shingle representation).  Returns ``(inter, na, nb)`` int64
    arrays for all pairs at once: one ``np.lexsort`` over the concatenated
    ``(pair_idx, value)`` rows replaces the former per-pair Python
    ``np.intersect1d`` loop — a value common to both sides of a pair appears
    exactly twice adjacently after the sort (each side is unique), so the
    intersection size is a bincount of adjacent duplicates.
    """
    n = len(blobs_a)
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z.copy(), z.copy()
    na = np.fromiter((len(x) >> 3 for x in blobs_a), np.int64, n)
    nb = np.fromiter((len(x) >> 3 for x in blobs_b), np.int64, n)
    total = int(na.sum() + nb.sum())
    if total == 0:
        return np.zeros(n, np.int64), na, nb
    parts = [np.frombuffer(x, np.uint64) for x in blobs_a]
    parts += [np.frombuffer(x, np.uint64) for x in blobs_b]
    val = np.concatenate(parts)
    idx = np.concatenate([np.repeat(np.arange(n, dtype=np.int64), na),
                          np.repeat(np.arange(n, dtype=np.int64), nb)])
    order = np.lexsort((val, idx))
    iv = idx[order]
    vv = val[order]
    dup = (iv[1:] == iv[:-1]) & (vv[1:] == vv[:-1])
    inter = np.bincount(iv[1:][dup], minlength=n).astype(np.int64)
    return inter, na, nb


def _binary_column_view(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (values, lengths) view of an Arrow binary column of packed
    uint64 sets: values = every blob's uint64s concatenated in row order,
    lengths = per-row set sizes.  Reads the offsets/data buffers directly —
    no per-row ``bytes`` objects (the ``to_pylist`` path copies each blob).

    Falls back to one defensive copy only when the first blob starts at a
    non-8-aligned byte offset (cannot happen for arrays Arrow allocated
    itself, since every blob length is a multiple of 8)."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = arr.cast(pa.large_binary())
    offs = np.frombuffer(arr.buffers()[1], np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    lens = (np.diff(offs) >> 3).astype(np.int64)
    data = arr.buffers()[2]
    if data is None:
        return np.empty(0, np.uint64), lens
    flat = np.frombuffer(data, np.uint8)[offs[0] : offs[-1]]
    if offs[0] % 8 == 0:
        vals = flat.view(np.uint64)
    else:  # pragma: no cover - misaligned slice of a foreign buffer
        vals = np.frombuffer(flat.tobytes(), np.uint64)
    return vals, lens


def batch_set_stats_arrow(col_a, col_b) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``batch_set_stats`` over Arrow binary columns directly (zero-copy:
    buffer views instead of per-row Python ``bytes``)."""
    va, na = _binary_column_view(col_a)
    vb, nb = _binary_column_view(col_b)
    n = len(na)
    if n == 0 or (len(va) + len(vb)) == 0:
        return np.zeros(n, np.int64), na, nb
    val = np.concatenate([va, vb])
    idx = np.concatenate(
        [
            np.repeat(np.arange(n, dtype=np.int64), na),
            np.repeat(np.arange(n, dtype=np.int64), nb),
        ]
    )
    order = np.lexsort((val, idx))
    iv = idx[order]
    vv = val[order]
    dup = (iv[1:] == iv[:-1]) & (vv[1:] == vv[:-1])
    inter = np.bincount(iv[1:][dup], minlength=n).astype(np.int64)
    return inter, na, nb


def _stats_to_jaccard_containment(inter, na, nb) -> tuple[np.ndarray, np.ndarray]:
    union = na + nb - inter
    jac = np.where(
        union > 0,
        inter / np.maximum(union, 1),
        np.where((na == 0) & (nb == 0), 1.0, 0.0),
    )
    mn = np.minimum(na, nb)
    cont = np.where(mn > 0, inter / np.maximum(mn, 1), 0.0)
    return jac, cont


def batch_jaccard_containment_arrow(col_a, col_b) -> tuple[np.ndarray, np.ndarray]:
    """Jaccard + containment for all pairs straight from Arrow binary columns
    (the Verifier hot path — no per-row blob materialization)."""
    return _stats_to_jaccard_containment(*batch_set_stats_arrow(col_a, col_b))


def batch_jaccard_containment(
    blobs_a: list[bytes], blobs_b: list[bytes]
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized exact Jaccard + containment for packed-set pairs, with the
    same empty-set conventions as ``jaccard_sorted``/``containment_sorted``
    (both empty -> jaccard 1.0; any empty -> containment 0.0)."""
    return _stats_to_jaccard_containment(*batch_set_stats(blobs_a, blobs_b))


def cosine_topk_block(
    queries: np.ndarray, corpus: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Brute-force cosine top-k of ``queries`` (q, d) against one corpus block
    (n, d).  Returns (scores (q, k'), indices (q, k')) with k' = min(k, n),
    sorted descending by score, ties broken by ascending corpus index.

    Per-batch building block for the ANN baseline: each map_batches task calls
    this against its block and emits partial top-k rows which a final tiny
    reduce merges (no full materialization of the corpus on the driver).
    """
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    cn = corpus / np.maximum(np.linalg.norm(corpus, axis=1, keepdims=True), 1e-12)
    sims = qn @ cn.T  # (q, n)
    kk = min(k, sims.shape[1])
    # argsort on (-sim, index) for deterministic ties
    order = np.lexsort((np.arange(sims.shape[1])[None, :].repeat(len(sims), 0), -sims), axis=1)
    idx = order[:, :kk]
    rows = np.arange(len(sims))[:, None]
    return sims[rows, idx], idx


def levenshtein_batch(strs_a: list[str], strs_b: list[str],
                      max_bytes: int = 512) -> np.ndarray:
    """Vectorized BATCH Levenshtein distance over UTF-8 BYTES (matching
    DuckDB's byte-based ``levenshtein``): P pairs are advanced together, one
    DP row per iteration, with the sequential insertion dependency
    ``cur[j] = min(m[j], cur[j-1]+1)`` solved in closed form by the min-plus
    slope-1 trick ``cummin(row[k] - k) + j`` — no per-pair Python loop, no
    per-cell loop; O(Lmax) numpy steps over (P, L) lanes.

    Verify-stage kernel for edit-distance dup confirmation (the reference's
    near-dup confirmation analogue, ``server_ndd.py:108-110``, re-expressed
    for text): callers block candidates first so P stays bounded."""
    P = len(strs_a)
    if P == 0:
        return np.zeros(0, np.int64)
    ab = [s.encode("utf-8")[:max_bytes] for s in strs_a]
    bb = [s.encode("utf-8")[:max_bytes] for s in strs_b]
    la = np.fromiter((len(x) for x in ab), np.int64, P)
    lb = np.fromiter((len(x) for x in bb), np.int64, P)
    La, Lb = int(la.max()), int(lb.max())
    A = np.zeros((P, La), np.uint8)
    B = np.zeros((P, Lb), np.uint8)
    for i, x in enumerate(ab):
        A[i, : len(x)] = np.frombuffer(x, np.uint8)
    for i, x in enumerate(bb):
        B[i, : len(x)] = np.frombuffer(x, np.uint8)
    js = np.arange(Lb + 1, dtype=np.int32)
    prev = np.tile(js, (P, 1))
    res = np.empty(P, np.int64)
    res[la == 0] = lb[la == 0]
    rows = np.arange(P)
    for i in range(1, La + 1):
        cost = (B != A[:, i - 1 : i]).astype(np.int32)  # (P, Lb)
        m = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        row = np.concatenate(
            [np.full((P, 1), i, np.int32), m], axis=1
        )  # row[0] = dp[i][0] = i
        prev = np.minimum.accumulate(row - js, axis=1) + js
        hit = la == i
        if hit.any():
            res[hit] = prev[rows[hit], lb[hit]]
    return res
