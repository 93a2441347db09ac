"""Dedup operator family over the ``documents`` table (single-text rows):
exact md5 dedup, MinHash+LSH near-dup pairs (the flagship machinery with a
SQL-checkable brute-force oracle), and SimHash Hamming pairs.

Doc ids are carried as ZERO-PADDED strings inside the engine (lexicographic
order == numeric order, so engine pair ordering a<b matches the SQL oracle's
numeric ordering) and converted back to int64 at the edge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import NDDConfig
from ..functions.hashing import hamming_distance
from ..functions.text import normalize_text
from ..stages.lsh import candidate_pairs, explode_bands
from ..stages.signatures import sign_conversations
from ..stages.verify import verify_pairs

DOCS_DEDUP_CFG = NDDConfig()  # shared shingle/signature config for doc queries


def _read_docs(sf_dir: str, columns=None):
    from ..sources.io import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def docs_as_conversations(sf_dir: str):
    """Adapt documents to the conversations schema consumed by the signature
    stage: conv_id (zero-padded doc_id), normalized doc_text, fingerprint."""
    import hashlib

    def fn(batch: pa.Table) -> pa.Table:
        ids = [f"{d:012d}" for d in batch["doc_id"].to_pylist()]
        norm = [normalize_text(t) for t in batch["text"].to_pylist()]
        fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm]
        return pa.table(
            {
                "conv_id": pa.array(ids, pa.string()),
                "doc_text": pa.array(norm, pa.string()),
                "fingerprint": pa.array(fps, pa.string()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def exact_dedup_docs(sf_dir: str):
    """One row per distinct content: fingerprint (md5 of RAW text, matching
    SQL ``md5(text)``), representative doc_id (min), member count.

    Pattern: vectorized hash column -> keyed hash-partition -> block-local
    Arrow group_by (D1/M17; fingerprints are high-cardinality so map-side
    combining would not reduce — see functions/groupagg.py)."""
    import hashlib

    from ..functions.groupagg import highcard_groupagg

    def fp(batch: pa.Table) -> pa.Table:
        fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table(
            {"fingerprint": pa.array(fps, pa.string()), "doc_id": batch["doc_id"]}
        )

    return highcard_groupagg(
        _read_docs(sf_dir, ["doc_id", "text"]).map_batches(fp, batch_format="pyarrow"),
        ["fingerprint"],
        [("doc_id", "min"), ([], "count_all")],
        {"doc_id_min": "rep_id", "count_all": "n_members"},
    )


def near_dup_pairs_docs(sf_dir: str, cfg: NDDConfig | None = None):
    """All document pairs with exact token-5-shingle Jaccard >= tau, found via
    the engine's MinHash/LSH/verify stages.

    With bands=32 x rows=4 the LSH miss probability at j >= tau=0.8 is
    < 5e-8, so the output equals the brute-force all-pairs SQL oracle
    (shingle equi-join + group counts) with overwhelming probability —
    this query IS the SQL-checkable correctness gate for the flagship
    machinery.  Returns a:int64, b:int64 (a < b), jaccard rounded to 6.
    """
    from ..state.partitioning import materialize_clean

    cfg = cfg or DOCS_DEDUP_CFG
    convs = docs_as_conversations(sf_dir)
    sigs = materialize_clean(sign_conversations(convs, cfg))
    cand = candidate_pairs(explode_bands(sigs, cfg), cfg)
    # The unified verifier also emits method='substring' rows (containment >=
    # containment_tau but jaccard < tau); this query's contract is exactly
    # "jaccard >= tau", so keep only the minhash-confirmed pairs.
    dup = verify_pairs(cand, sigs, cfg).map_batches(
        lambda t: t.filter(pc.equal(t["method"], "minhash")), batch_format="pyarrow"
    )

    def finish(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch["a"], pa.int64())
        b = pc.cast(batch["b"], pa.int64())
        jac = pa.array(
            np.round(batch["jaccard"].to_numpy(zero_copy_only=False), 6), pa.float64()
        )
        return pa.table({"a": a, "b": b, "jaccard": jac})

    return dup.map_batches(finish, batch_format="pyarrow")


def md5_simhash_docs(sf_dir: str, cfg: NDDConfig | None = None):
    """Per-doc 64-bit SimHash over ``md5_low64`` shingle-string hashes — the
    SQL-checkable basis: DuckDB recomputes the identical value via
    ``md5_number_lower(shingle)`` + per-bit majority vote (see
    ``oracle_sql()['simhash_pairs_docs']``).  Same majority rule
    (``functions/hashing.simhash_batch``) as the flagship blake2b-basis
    signatures; only the 64-bit shingle fingerprint function differs."""
    from ..functions.hashing import md5_shingle_sets, simhash_batch

    cfg = cfg or DOCS_DEDUP_CFG

    def fn(batch: pa.Table) -> pa.Table:
        sets = md5_shingle_sets(batch["doc_text"].to_pylist(), cfg.shingle_w)
        sim = simhash_batch(sets)
        degen = np.array([len(s) == 0 for s in sets], dtype=bool)
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "simhash": pa.array(sim, pa.uint64()),
                "is_degenerate": pa.array(degen),
            }
        )

    return docs_as_conversations(sf_dir).map_batches(fn, batch_format="pyarrow")


def simhash_pairs_docs(sf_dir: str, cfg: NDDConfig | None = None, radius: int | None = None):
    """Document pairs whose 64-bit SimHashes are within ``radius`` Hamming
    bits, searched via banded SimHash chunks (4 x 16-bit bands: any pair
    within radius<=3 shares at least one exact band — pigeonhole, so the
    banded search is EXACT) and verified exactly.  SimHash basis is
    ``md5_low64`` over shingle strings so the DuckDB oracle can recompute it
    (xor + bit_count pair join)."""
    cfg = cfg or DOCS_DEDUP_CFG
    radius = cfg.hamming_radius if radius is None else radius
    sigs = md5_simhash_docs(sf_dir, cfg).materialize()

    n_chunks = 4  # 16-bit chunks; pigeonhole covers radius <= n_chunks - 1

    def explode(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.invert(batch["is_degenerate"]))
        sim = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(sim)
        chunks = []
        for c in range(n_chunks):
            chunks.append((sim >> np.uint64(16 * c)) & np.uint64(0xFFFF))
        chunk_vals = np.stack(chunks, axis=1).reshape(-1)  # (n*4,)
        chunk_ids = np.tile(np.arange(n_chunks, dtype=np.int32), n)
        idx = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
        return pa.table(
            {
                "chunk_id": pa.array(chunk_ids, pa.int32()),
                "chunk_val": pa.array(chunk_vals.astype(np.uint64), pa.uint64()),
                "conv_id": batch["conv_id"].take(pa.array(idx)),
                "simhash": batch["simhash"].take(pa.array(idx)),
            }
        )

    def pairs_in_block(batch: pa.Table) -> pa.Table:
        """Vectorized over one hash partition: group by (chunk_id, chunk_val)
        via one argsort; Python loop touches only colliding chunks."""
        empty = pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
             "hamming": pa.array([], pa.int32())}
        )
        n = batch.num_rows
        if n == 0:
            return empty
        cid = batch["chunk_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        cval = batch["chunk_val"].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = (cid << np.uint64(16)) | cval
        conv = np.asarray(batch["conv_id"].to_pylist(), dtype=object)
        sim = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        ends = np.append(starts[1:], n)
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            idxs = order[s:e]
            members, first = np.unique(conv[idxs], return_index=True)
            if len(members) < 2:
                continue
            sims = sim[idxs][first]
            ai, bi = np.triu_indices(len(members), k=1)
            h = hamming_distance(sims[ai], sims[bi])
            keep = h <= radius
            out_a.append(members[ai[keep]])
            out_b.append(members[bi[keep]])
            out_h.append(h[keep].astype(np.int32))
        if not out_a:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a).tolist(), pa.string()),
                "b": pa.array(np.concatenate(out_b).tolist(), pa.string()),
                "hamming": pa.array(np.concatenate(out_h), pa.int32()),
            }
        )

    from ..state.partitioning import key_partitioned

    raw_pairs = key_partitioned(
        sigs.select_columns(["conv_id", "simhash", "is_degenerate"]).map_batches(
            explode, batch_format="pyarrow"
        ),
        ["chunk_id", "chunk_val"],
    ).map_batches(pairs_in_block, batch_format="pyarrow", batch_size=None)

    def distinct_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.group_by(["a", "b"]).aggregate([("hamming", "min")]).rename_columns(
            ["a", "b", "hamming"]
        )

    pairs = key_partitioned(raw_pairs, ["a", "b"]).map_batches(
        distinct_block, batch_format="pyarrow", batch_size=None
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pc.cast(batch["a"], pa.int64()),
                "b": pc.cast(batch["b"], pa.int64()),
                "hamming": batch["hamming"],
            }
        )

    return pairs.map_batches(finish, batch_format="pyarrow")
