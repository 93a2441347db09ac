"""Suffix-array machinery for exact-substring analysis.

The pipeline's SCALABLE substring-dup detection is the anchor-shingle pass
(stages/substring.py) — a distributed reframing of "build a suffix array over
the corpus": anchors land candidate pairs, and the per-pair verification here
answers the precise questions a suffix array answers (is A a substring of B?
how long is their longest common substring?).

Implementation: prefix-doubling suffix array (O(n log^2 n), numpy-vectorized
ranks) + Kasai's LCP in O(n), over token-hash sequences (token-level, matching
the shingle domain) or raw character sequences.
"""

from __future__ import annotations

import numpy as np


def suffix_array(seq: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence via prefix doubling (numpy ranks).

    Returns ``sa`` with ``sa[i]`` = start of the i-th smallest suffix.
    """
    n = len(seq)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # initial ranks from element values
    order = np.argsort(seq, kind="stable")
    rank = np.empty(n, dtype=np.int64)
    vals = seq[order]
    rank[order] = np.cumsum(np.concatenate(([0], (vals[1:] != vals[:-1]).astype(np.int64))))
    k = 1
    idx = np.arange(n, dtype=np.int64)
    while True:
        # sort key: (rank[i], rank[i+k] or -1)
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        key = np.stack([rank[order], second[order]], axis=1)
        newrank = np.empty(n, dtype=np.int64)
        changed = np.concatenate(([0], np.any(key[1:] != key[:-1], axis=1).astype(np.int64)))
        newrank[order] = np.cumsum(changed)
        rank = newrank
        if rank[order[-1]] == n - 1:
            return order
        k *= 2
        if k >= n:
            return np.argsort(rank, kind="stable")
    return idx


def lcp_array(seq: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai's LCP: ``lcp[i]`` = longest common prefix of suffixes sa[i-1], sa[i]
    (``lcp[0]`` = 0)."""
    n = len(seq)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and seq[i + h] == seq[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring(a: np.ndarray, b: np.ndarray) -> int:
    """Length (in elements) of the longest common substring of two integer
    sequences, via a generalized suffix array over their separated concat."""
    if len(a) == 0 or len(b) == 0:
        return 0
    # separators outside the value range (sequences are hashes/ords >= 0)
    sep = np.int64(-1)
    seq = np.concatenate(
        [a.astype(np.int64), np.array([sep]), b.astype(np.int64)]
    )
    sa = suffix_array(seq)
    lcp = lcp_array(seq, sa)
    boundary = len(a)  # position of the separator
    best = 0
    for i in range(1, len(seq)):
        p, q = sa[i - 1], sa[i]
        if (p < boundary) != (q < boundary):  # suffixes from different sides
            best = max(best, int(lcp[i]))
    return best


def is_substring(small: np.ndarray, large: np.ndarray) -> bool:
    """True iff ``small`` occurs contiguously inside ``large``."""
    if len(small) == 0:
        return True
    if len(small) > len(large):
        return False
    return longest_common_substring(small, large) >= len(small)
