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
