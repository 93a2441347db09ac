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
Ray actor for serving (T2).

``ShardedNearDupIndex`` is the beyond-one-machine path (round-4 verdict item
#6): N ``IndexShardActor``s, each holding ONLY the conversations with
``md5_low64(conv_id) % n_shards == shard_id`` (documents, not bands, are the
shard key — conv-sharding keeps every shingle blob on exactly one shard,
where band-sharding would replicate blobs to every shard a band lands on).
The router computes the probe signature ONCE, fans it out, each shard probes
its local band/anchor tables and scores its own candidates (disjoint by
construction), and the merge re-ranks + grouped-dedups — bit-identical to
the single-index path (pytest-pinned) with per-actor memory ~1/N.
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
        total = 0
        for batch in signatures.select_columns(
            ["conv_id", "minhash", "shingles", "is_degenerate"]
        ).iter_batches(batch_size=8192, batch_format="pyarrow"):
            total += self.ingest_batch(batch)
        return total

    def ingest_batch(self, batch) -> int:
        """Insert one Arrow batch of signature rows (the unit
        ``ShardedNearDupIndex`` ships to shard actors)."""
        mod = np.uint64(self.cfg.anchor_mod)
        ids = batch["conv_id"].to_pylist()
        blobs = batch["shingles"].to_pylist()
        degen = batch["is_degenerate"].to_pylist()
        n = len(ids)
        if n == 0:
            return 0
        mh = np.asarray(
            batch["minhash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(n, self.cfg.num_perm)
        bh = band_hashes(mh, self.cfg.bands, self.cfg.rows_per_band, self.cfg.seed)
        for i in range(n):
            self.shingles[ids[i]] = blobs[i]
            if degen[i]:
                continue
            for h in bh[i]:
                self.buckets.setdefault(int(h), []).append(ids[i])
            vals = np.frombuffer(blobs[i], dtype=np.uint64)
            for a in vals[vals % mod == 0]:
                self.anchors.setdefault(int(a), []).append(ids[i])
        return n

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
        sh = self.probe_shingles(text)
        if sh is None:
            return []
        return rank_grouped(self.scored_candidates(sh, with_group=True), k)

    def probe_shingles(self, text: str):
        """Raw probe text -> sorted-unique shingle hash set (the exact
        signature-stage transforms); ``None`` when below ``min_tokens``."""
        from ..functions.hashing import apply_edge_exclusion

        norm = normalize_text(text)
        toks = tokenize(norm)
        if len(toks) < self.cfg.min_tokens:
            return None
        th = apply_edge_exclusion(
            self.hasher.hash_tokens(toks), self.cfg.edge_exclude_tokens
        )
        return shingle_hashes(th, self.cfg.shingle_w)

    def scored_candidates(self, sh, with_group: bool = False):
        """Band + anchor candidate generation and exact scoring for a probe
        shingle set: ``[(conv_id, jaccard, containment[, group])]``,
        unranked.  The per-shard half of the query — the ranked/grouped
        merge lives in :func:`rank_grouped` so sharded and single-index
        paths share it bit-for-bit."""
        from ..functions.similarity import containment_sorted

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
            if with_group:
                scored.append((cid, jac, cont, self.rep_of.get(cid, cid)))
            else:
                scored.append((cid, jac, cont))
        return scored

    def size(self) -> int:
        return len(self.shingles)


def rank_grouped(scored, k: int) -> list[dict]:
    """Shared final ranking: sort by (max(jaccard, containment) desc,
    conv_id asc), grouped dedup (first = best hit per exact-dup family,
    INCLUDING the final element — SURVEY §2.6 O2), cap at k.  Input rows:
    ``(conv_id, jaccard, containment, group)``."""
    scored = sorted(scored, key=lambda t: (-max(t[1], t[2]), t[0]))
    out: list[dict] = []
    seen_groups: set[str] = set()
    for cid, jac, cont, group in scored:
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


def shard_ids(conv_ids, n_shards: int) -> "np.ndarray":
    """Shard id per row: ``md5_low64(conv_id) % n_shards`` — deterministic
    across processes (never Python ``hash``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.hashing import md5_low64_column

    h = md5_low64_column(pc.cast(conv_ids, pa.string()))
    return (h % np.uint64(n_shards)).astype(np.int64)


def shard_mask(conv_ids, shard_id: int, n_shards: int):
    """Boolean Arrow mask selecting one shard's rows."""
    import pyarrow as pa

    return pa.array(shard_ids(conv_ids, n_shards) == shard_id)


@ray.remote(max_restarts=-1, max_task_retries=-1)
class IndexShardActor:
    """One shard of a :class:`ShardedNearDupIndex`: a NearDupIndex over ONLY
    the conversations hashing to this shard (memory ~1/n_shards).  Loads
    from the same signatures checkpoint path as ``IndexActor``, so a
    restarted actor rebuilds identical state from Parquet — Ray restarts
    it automatically on worker death (``max_restarts=-1``) and retries the
    in-flight probe (``max_task_retries=-1``); post-build ``ingest``ed
    deltas are lost on restart and must be re-synced by the router (the
    reference server has the same reload-from-disk recovery,
    ``server_ndd.py:77-95``)."""

    def __init__(self, signatures_path: str, shard_id: int, n_shards: int,
                 cfg_kwargs: dict | None = None,
                 rep_map_path: str | None = None) -> None:
        import ray.data as rd

        self.shard_id, self.n_shards = shard_id, n_shards
        cfg = NDDConfig(**(cfg_kwargs or {}))

        def mine(t):
            return t.filter(shard_mask(t["conv_id"], shard_id, n_shards))

        sigs = rd.read_parquet(signatures_path).map_batches(
            mine, batch_format="pyarrow"
        )
        rep_map = (
            rd.read_parquet(rep_map_path).map_batches(mine, batch_format="pyarrow")
            if rep_map_path else None
        )
        self.index = NearDupIndex(sigs, cfg, rep_map)

    def query_scored(self, sh: "np.ndarray") -> list[tuple]:
        """Unranked scored candidates for a pre-computed probe shingle set
        (the router computes the signature once and fans it out)."""
        return self.index.scored_candidates(sh, with_group=True)

    def ingest_table(self, batch) -> int:
        """Ingest the shard's slice of a pre-split Arrow batch."""
        return self.index.ingest_batch(batch)

    def evict(self, conv_ids: list[str]) -> int:
        return self.index.evict(conv_ids)

    def size(self) -> int:
        return len(self.index.shingles)


class ShardedNearDupIndex:
    """N-actor sharded serving index, duck-type compatible with
    :class:`NearDupIndex` (``query_text`` / ``ingest`` / ``evict`` /
    ``size``) so ``serve.py`` drops it in unchanged.

    Conversations shard by ``md5_low64(conv_id) % n_shards`` — each shingle
    blob and its band/anchor postings live on exactly ONE shard, so the
    per-shard candidate sets are disjoint and the merged ranking equals the
    single-index ranking bit-for-bit (pytest-pinned).  Per-shard grouped
    dedup is safe before the global one: keeping each family's per-shard
    best drops only rows the global dedup would drop anyway, and the top-k
    after dedup needs at most k families from any shard."""

    def __init__(self, signatures_path: str, n_shards: int = 4,
                 cfg: NDDConfig | None = None,
                 rep_map_path: str | None = None) -> None:
        self.cfg = cfg or NDDConfig()
        self.n_shards = n_shards
        import dataclasses

        cfg_kwargs = dataclasses.asdict(self.cfg)
        self.actors = [
            IndexShardActor.remote(
                signatures_path, i, n_shards, cfg_kwargs, rep_map_path
            )
            for i in range(n_shards)
        ]
        # probe-side signature state (computed ONCE per query on the router)
        self._probe = NearDupIndex.__new__(NearDupIndex)
        self._probe.cfg = self.cfg
        self._probe.a, self._probe.b = minhash_params(
            self.cfg.num_perm, self.cfg.seed
        )
        self._probe.hasher = TokenHasher()

    def query_text(self, text: str, k: int = 30) -> list[dict]:
        sh = self._probe.probe_shingles(text)
        if sh is None:
            return []
        parts = ray.get([a.query_scored.remote(sh) for a in self.actors])
        # per-shard rank+dedup cap (k rows per shard), then the global merge
        merged: list[tuple] = []
        for p in parts:
            best: dict[str, tuple] = {}
            for cid, jac, cont, group in p:
                cur = best.get(group)
                cand = (cid, jac, cont, group)
                if cur is None or (-max(jac, cont), cid) < (-max(cur[1], cur[2]), cur[0]):
                    best[group] = cand
            merged.extend(best.values())
        return rank_grouped(merged, k)

    def ingest(self, signatures) -> int:
        """Split each Arrow batch by shard and ship the slices — accepts a
        Dataset (the ``serve.py`` /update contract).  The shard hash runs
        ONCE per batch (review finding: per-shard shard_mask calls re-ran
        the md5 kernel n_shards times)."""
        import pyarrow as pa

        futs = []
        for batch in signatures.select_columns(
            ["conv_id", "minhash", "shingles", "is_degenerate"]
        ).iter_batches(batch_size=8192, batch_format="pyarrow"):
            sid = shard_ids(batch["conv_id"], self.n_shards)
            for i, a in enumerate(self.actors):
                part = batch.filter(pa.array(sid == i))
                if part.num_rows:
                    futs.append(a.ingest_table.remote(part))
        return int(sum(ray.get(futs))) if futs else 0

    def evict(self, conv_ids: list[str]) -> int:
        return int(sum(ray.get([a.evict.remote(list(conv_ids)) for a in self.actors])))

    def size(self) -> int:
        return int(sum(ray.get([a.size.remote() for a in self.actors])))
