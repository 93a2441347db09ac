"""Query path: given a NEW conversation, find its ranked near-duplicates in an
indexed corpus — parity with the reference's query flow (E3):

    upload image -> CNN feature -> brute-force distance -> argsort ->
    first-hit-per-(shot, video) dedup -> top-k     (``ndd/server_ndd.py:97-156``)

re-expressed: probe text -> same signature stages -> probe the LSH band table
-> exact-Jaccard rank over the (few) candidates -> one hit per exact-dup
family (grouped dedup, O2/D1 semantics WITHOUT the reference's off-by-one that
drops the final element, ``server_ndd.py:127-142`` — see SURVEY §2.6) -> top-k.

``NearDupIndex`` is the in-memory index (reference analogue: the server's
``video_index``/``features`` matrix, ``server_ndd.py:244-265``) but holds only
band-hash -> conv_ids and per-conv shingle blobs; ``IndexActor`` wraps it as a
Ray actor for serving (T2).  At corpus scales beyond one machine, shard the
index by ``hash(band) % n_actors`` and fan the probe out to all shards.
"""

from __future__ import annotations

import numpy as np

import ray

from ..config import NDDConfig
from ..functions.hashing import (
    TokenHasher,
    band_hashes,
    minhash_batch,
    minhash_params,
    shingle_hashes,
)
from ..functions.similarity import jaccard_sorted
from ..functions.text import normalize_text, tokenize


class NearDupIndex:
    """Driver-side LSH index over a signatures Dataset (+ optional rep_map for
    grouped dedup of exact-copy families)."""

    def __init__(self, signatures, cfg: NDDConfig | None = None, rep_map=None) -> None:
        self.cfg = cfg or NDDConfig()
        self.a, self.b = minhash_params(self.cfg.num_perm, self.cfg.seed)
        self.hasher = TokenHasher()
        self.buckets: dict[int, list[str]] = {}
        self.anchors: dict[int, list[str]] = {}  # anchor shingle -> convs (containment probe)
        self.shingles: dict[str, bytes] = {}
        self.rep_of: dict[str, str] = {}
        self.ingest(signatures)
        if rep_map is not None:
            for batch in rep_map.iter_batches(batch_size=65536, batch_format="pyarrow"):
                self.rep_of.update(
                    zip(batch["conv_id"].to_pylist(), batch["rep_id"].to_pylist())
                )

    def ingest(self, signatures) -> int:
        """Insert (or refresh) signature rows — the incremental half of the
        reference's ``update_index`` (``ndd/server_ndd.py:227-239``): only the
        NEW/CHANGED rows are fed here (e.g. the changed buckets from
        ``stages/incremental.IncrementalSignatureStore``), existing entries
        stay untouched.  Returns the number of rows ingested."""
        mod = np.uint64(self.cfg.anchor_mod)
        total = 0
        for batch in signatures.select_columns(
            ["conv_id", "minhash", "shingles", "is_degenerate"]
        ).iter_batches(batch_size=8192, batch_format="pyarrow"):
            ids = batch["conv_id"].to_pylist()
            blobs = batch["shingles"].to_pylist()
            degen = batch["is_degenerate"].to_pylist()
            n = len(ids)
            if n == 0:
                continue
            mh = np.asarray(
                batch["minhash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            ).reshape(n, self.cfg.num_perm)
            bh = band_hashes(mh, self.cfg.bands, self.cfg.rows_per_band, self.cfg.seed)
            for i in range(n):
                self.shingles[ids[i]] = blobs[i]
                total += 1
                if degen[i]:
                    continue
                for h in bh[i]:
                    self.buckets.setdefault(int(h), []).append(ids[i])
                vals = np.frombuffer(blobs[i], dtype=np.uint64)
                for a in vals[vals % mod == 0]:
                    self.anchors.setdefault(int(a), []).append(ids[i])
        return total

    def evict(self, conv_ids) -> int:
        """Drop vanished conversations — the eviction half of ``update_index``
        (``ndd/server_ndd.py:246-261``).  Inverted lists keep stale entries
        (bounded by churn) and ``query_text`` filters on ``self.shingles``
        membership, so eviction is O(removed), not O(index)."""
        n = 0
        for cid in conv_ids:
            if self.shingles.pop(cid, None) is not None:
                n += 1
            self.rep_of.pop(cid, None)
        return n

    def query_text(self, text: str, k: int = 30) -> list[dict]:
        """Ranked near-dup candidates for a raw conversation text — including
        PARTIAL text (a snippet of an indexed conversation): candidates come
        from both the LSH band buckets (whole-text Jaccard matches) and the
        anchor buckets (containment matches, so a truncated probe still finds
        the conversations that contain it).

        Returns up to ``k`` dicts (conv_id, jaccard, containment, rank),
        ranked by max(jaccard, containment) descending, ties by conv_id
        ascending, at most one hit per exact-dup family (grouped dedup D1:
        FIRST = best hit wins, like the reference's shot_hits set — but
        including the final element, see SURVEY §2.6 O2)."""
        from ..functions.similarity import containment_sorted

        norm = normalize_text(text)
        toks = tokenize(norm)
        if len(toks) < self.cfg.min_tokens:
            return []
        from ..functions.hashing import apply_edge_exclusion

        th = apply_edge_exclusion(self.hasher.hash_tokens(toks), self.cfg.edge_exclude_tokens)
        sh = shingle_hashes(th, self.cfg.shingle_w)
        mh = minhash_batch([sh], self.a, self.b)
        bh = band_hashes(mh, self.cfg.bands, self.cfg.rows_per_band, self.cfg.seed)[0]
        cands: set[str] = set()
        for h in bh:
            cands.update(self.buckets.get(int(h), ()))
        mod = np.uint64(self.cfg.anchor_mod)
        for a in sh[sh % mod == 0]:
            cands.update(self.anchors.get(int(a), ()))
        scored = []
        for cid in cands:
            blob = self.shingles.get(cid)
            if blob is None:
                continue  # evicted after indexing; stale inverted-list entry
            other = np.frombuffer(blob, dtype=np.uint64)
            jac = jaccard_sorted(sh, other)
            cont = containment_sorted(sh, other)
            scored.append((cid, jac, cont))
        scored.sort(key=lambda t: (-max(t[1], t[2]), t[0]))
        out = []
        seen_groups: set[str] = set()
        for cid, jac, cont in scored:
            group = self.rep_of.get(cid, cid)
            if group in seen_groups:
                continue  # grouped dedup: first (best) hit per family wins
            seen_groups.add(group)
            out.append(
                {
                    "conv_id": cid,
                    "jaccard": float(jac),
                    "containment": float(cont),
                    "rank": len(out) + 1,
                }
            )
            if len(out) >= k:
                break
        return out


@ray.remote
class IndexActor:
    """Serving actor holding a NearDupIndex (reference analogue: the Flask
    server's resident index, ``ndd/server_ndd.py:77-95``).  Build from a
    signatures checkpoint path so restarts re-load from Parquet."""

    def __init__(self, signatures_path: str, cfg_kwargs: dict | None = None,
                 rep_map_path: str | None = None) -> None:
        import ray.data as rd

        cfg = NDDConfig(**(cfg_kwargs or {}))
        sigs = rd.read_parquet(signatures_path)
        rep_map = rd.read_parquet(rep_map_path) if rep_map_path else None
        self.index = NearDupIndex(sigs, cfg, rep_map)

    def query(self, text: str, k: int = 30) -> list[dict]:
        return self.index.query_text(text, k)

    def ingest(self, signatures_path: str) -> int:
        """Incremental refresh from a parquet path of NEW/CHANGED signature
        rows (e.g. the changed buckets of an IncrementalSignatureStore)."""
        import ray.data as rd

        return self.index.ingest(rd.read_parquet(signatures_path))

    def evict(self, conv_ids: list[str]) -> int:
        return self.index.evict(conv_ids)

    def size(self) -> int:
        return len(self.index.shingles)
