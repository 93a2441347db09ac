"""Pure NumPy/Python oracle: reference-faithful near-duplicate semantics with
NO Ray — brute-force all-pairs exact Jaccard at small N, plus the same seeded
MinHash/SimHash/LSH math as the engine, and union-find clustering.

This stands in for the reference's ground truth (the reference itself has zero
tests — SURVEY §5); the engine's distributed pipeline must reproduce these
cluster assignments with dup-pair recall >= 0.99 at identical config
(BASELINE.json north_rule).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from .config import NDDConfig
from .functions.hashing import (
    TokenHasher,
    apply_edge_exclusion,
    minhash_batch,
    minhash_params,
    shingle_hashes,
    simhash_batch,
)
from .functions.similarity import containment_sorted, jaccard_sorted
from .functions.text import normalize_text, tokenize
from .functions.unionfind import UnionFind


@dataclass
class OracleDoc:
    conv_id: str
    normalized: str
    shingles: np.ndarray  # sorted unique uint64
    fingerprint: str      # md5 hex of normalized text


def oracle_strip_boilerplate(docs: dict[str, str], cfg: NDDConfig) -> dict[str, str]:
    """Driver-side mirror of ``stages/boilerplate.strip_boilerplate`` (M7):
    group normalized docs by first-k-token prefix fingerprint; for groups of
    >= boilerplate_min_count members remove the token-level longest common
    prefix (computed from the lexicographic min/max), never dropping a doc
    below boilerplate_residual_tokens tokens."""
    from .stages.boilerplate import strip_tokens, token_lcp

    k = cfg.boilerplate_prefix_tokens
    normed = {cid: normalize_text(t) for cid, t in docs.items()}
    groups: dict[str, list[str]] = {}
    for cid, t in normed.items():
        toks = t.split(" ") if t else []
        groups.setdefault(" ".join(toks[:k]), []).append(cid)
    out = dict(normed)
    for _, members in groups.items():
        texts = [normed[c] for c in members]
        if len(members) < cfg.boilerplate_min_count or not texts[0]:
            continue
        lcp = token_lcp(min(texts).split(" "), max(texts).split(" "))
        if lcp == 0:
            continue
        for c in members:
            toks = normed[c].split(" ") if normed[c] else []
            out[c] = " ".join(strip_tokens(toks, lcp, cfg.boilerplate_residual_tokens))
    return out


def oracle_docs(docs: dict[str, str], cfg: NDDConfig) -> list[OracleDoc]:
    """Normalize + shingle every document with the shared config."""
    hasher = TokenHasher()
    out = []
    for conv_id in sorted(docs):
        norm = normalize_text(docs[conv_id])
        toks = tokenize(norm)
        if len(toks) < cfg.min_tokens:
            sh = np.empty(0, dtype=np.uint64)
        else:
            th = apply_edge_exclusion(hasher.hash_tokens(toks), cfg.edge_exclude_tokens)
            sh = shingle_hashes(th, cfg.shingle_w)
        out.append(
            OracleDoc(
                conv_id=conv_id,
                normalized=norm,
                shingles=sh,
                fingerprint=hashlib.md5(norm.encode("utf-8")).hexdigest(),
            )
        )
    return out


def oracle_dup_pairs(docs: dict[str, str], cfg: NDDConfig) -> set[tuple[str, str]]:
    """ALL-PAIRS exact Jaccard >= tau (plus exact-fingerprint equality, which
    covers degenerate/empty docs).  (a, b) with a < b lexicographically."""
    od = oracle_docs(docs, cfg)
    pairs: set[tuple[str, str]] = set()
    for i in range(len(od)):
        for j in range(i + 1, len(od)):
            a, b = od[i], od[j]
            key = (min(a.conv_id, b.conv_id), max(a.conv_id, b.conv_id))
            if a.fingerprint == b.fingerprint:
                pairs.add(key)
            elif jaccard_sorted(a.shingles, b.shingles) >= cfg.tau:
                pairs.add(key)
    return pairs


def oracle_substring_pairs(docs: dict[str, str], cfg: NDDConfig) -> set[tuple[str, str]]:
    """All-pairs shingle-containment >= containment_tau AND true normalized
    substring relation — the target of the suffix-array/anchor pass."""
    od = oracle_docs(docs, cfg)
    pairs: set[tuple[str, str]] = set()
    for i in range(len(od)):
        for j in range(i + 1, len(od)):
            a, b = od[i], od[j]
            if len(a.shingles) == 0 or len(b.shingles) == 0:
                continue
            if containment_sorted(a.shingles, b.shingles) >= cfg.containment_tau:
                small, large = (a, b) if len(a.normalized) <= len(b.normalized) else (b, a)
                if small.normalized and small.normalized in large.normalized:
                    pairs.add((min(a.conv_id, b.conv_id), max(a.conv_id, b.conv_id)))
    return pairs


def oracle_clusters(docs: dict[str, str], cfg: NDDConfig, include_substring: bool = False) -> dict[str, str]:
    """conv_id -> cluster label (min member id) from union-find over oracle dup
    pairs.  Singletons map to themselves."""
    uf = UnionFind()
    for conv_id in docs:
        uf.find(conv_id)
    pairs = oracle_dup_pairs(docs, cfg)
    if include_substring:
        pairs = pairs | oracle_substring_pairs(docs, cfg)
    for a, b in pairs:
        uf.union(a, b)
    return uf.components()


def oracle_signatures(docs: dict[str, str], cfg: NDDConfig) -> dict[str, dict]:
    """Per-doc MinHash/SimHash via the same seeded math the engine uses —
    used to assert the engine's signature stage is bit-identical regardless of
    batch boundaries."""
    od = oracle_docs(docs, cfg)
    a, b = minhash_params(cfg.num_perm, cfg.seed)
    sets = [d.shingles for d in od]
    mh = minhash_batch(sets, a, b)
    sh = simhash_batch(sets)
    return {
        d.conv_id: {"minhash": mh[i], "simhash": int(sh[i]), "fingerprint": d.fingerprint,
                    "n_shingles": len(d.shingles)}
        for i, d in enumerate(od)
    }
