"""Multimodal column plumbing: opaque ``binary`` payloads with typed metadata,
decoded / feature-extracted by actor-pool stages.

This mirrors the reference's image pipeline shape (decode -> resize -> CNN
feature, ``ndd/extract_images.py`` + ``ndd/extract_features.py``) for
image/audio/video payloads at 100 TB: payloads stay binary in Arrow end to end
(never Python-object columns), batches are kept SMALL because rows are wide,
and the expensive decoder/model lives in an actor's ``__init__``.

The actual codecs (PIL/cv2/ffmpeg) are NOT in this container, so the decode
kernel is STUBBED: ``mode="strict"`` raises NotImplementedError exactly where
a real decoder would plug in; ``mode="fake"`` (default for tests/benches)
produces a DETERMINISTIC pseudo-decode from the payload bytes so the Ray-side
plumbing — schema, batching, actor signature, output layout — is real and
tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import splitmix64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),        # opaque encoded bytes (jpeg/wav/mp4/...)
        ("media_type", pa.string()),     # "image" | "audio" | "video"
        ("n_bytes", pa.int64()),
    ]
)

FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),
        ("feature", pa.list_(pa.float32())),  # FEATURE_DIM floats
        ("checksum", pa.uint64()),
    ]
)

FEATURE_DIM = 16


def media_from_documents(sf_dir: str):
    """Deterministic binary ``media`` table derived from documents (the
    container has no real media files): payload = the utf-8 text bytes,
    media_type cycles by doc_id.  Streams via map_batches."""
    import ray.data as rd

    types = ["image", "audio", "video"]

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = [t.encode("utf-8") for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array([types[i % 3] for i in ids], pa.string()),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            },
            schema=MEDIA_SCHEMA,
        )

    from ..sources.io import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


class MediaFeaturizer:
    """Actor-pool stage: decode payload -> fixed-dim feature vector.

    ``__init__`` is where a real implementation loads the decoder + model once
    per actor (reference: ``load_model()`` once per process,
    ``ndd/extract_features.py:35-38,65``).  ``mode="strict"`` raises at the
    decode boundary; ``mode="fake"`` derives a deterministic float32 vector
    from the payload bytes.
    """

    def __init__(self, mode: str = "fake") -> None:
        if mode not in ("fake", "strict"):
            raise ValueError(f"mode must be 'fake' or 'strict', got {mode!r}")
        self.mode = mode
        # real impl: self.model = load_decoder_and_model()  # once per actor

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.mode == "strict":
            raise NotImplementedError(
                f"real {media_type} decoding requires PIL/cv2/ffmpeg, which are "
                "not available in this container; run with mode='fake' for the "
                "deterministic stub"
            )
        # deterministic pseudo-decode: blake2b(payload) -> seed -> FEATURE_DIM
        seed = np.frombuffer(
            hashlib.blake2b(payload, digest_size=8).digest(), dtype=np.uint64
        )
        states = splitmix64(seed[0] + np.arange(FEATURE_DIM, dtype=np.uint64))
        return (states.astype(np.float64) / 2**64).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        from ..functions.hashing import md5_low64

        feats = np.stack(
            [self._decode(p, t) for p, t in zip(payloads, types)]
        ) if payloads else np.empty((0, FEATURE_DIM), dtype=np.float32)
        # checksum basis is md5_low64 so the DuckDB oracle can recompute the
        # per-type XOR rollup (bit_xor(md5_number_lower(...)))
        checks = np.array(
            [md5_low64(p) for p in payloads], dtype=np.uint64
        ) if payloads else np.empty(0, dtype=np.uint64)
        feat_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), FEATURE_DIM
        ).cast(pa.list_(pa.float32()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "feature": feat_arr,
                "checksum": pa.array(checks, pa.uint64()),
            },
            schema=FEATURES_SCHEMA,
        )


def media_features(sf_dir: str, mode: str = "fake", concurrency=None,
                   batch_size: int = 256):
    """media -> features via the actor pool.  ``batch_size`` is deliberately
    small: binary payload rows are wide, and batch x concurrency must fit in
    worker heaps (at real scale tune with payload size, e.g. 16-64 rows for
    multi-MB videos)."""
    import ray

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (max(1, cpus // 4), max(2, cpus // 2))
    return media_from_documents(sf_dir).map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_feature_summary(sf_dir: str):
    """Per-media_type counts + checksum XOR rollup, SQL-checked (DuckDB
    ``bit_xor(md5_number_lower(text))`` per type).  Exercises the full
    binary-column actor-pool path; per-block partial XOR/count partials (3-row
    tables) stream to a tiny driver combine — no per-row driver loop."""
    import pandas as pd
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "media_type": batch["media_type"].to_pylist(),
                "checksum": batch["checksum"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("media_type")["checksum"]
        agg = pd.DataFrame(
            {
                "n_media": g.size(),
                "checksum_xor": g.agg(lambda s: np.bitwise_xor.reduce(s.to_numpy())),
            }
        ).reset_index()
        return pa.table(
            {
                "media_type": pa.array(agg["media_type"], pa.string()),
                "n_media": pa.array(agg["n_media"].to_numpy(), pa.int64()),
                "checksum_xor": pa.array(
                    agg["checksum_xor"].to_numpy().astype(np.uint64), pa.uint64()
                ),
            }
        )

    parts = (
        media_features(sf_dir)
        .select_columns(["media_type", "checksum"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    g = parts.groupby("media_type")
    out = pd.DataFrame(
        {
            "n_media": g["n_media"].sum(),
            "checksum_xor": g["checksum_xor"].agg(
                lambda s: np.bitwise_xor.reduce(s.to_numpy())
            ),
        }
    ).reset_index()
    out["checksum_xor"] = out["checksum_xor"].astype(np.uint64)
    return rd.from_pandas(out.sort_values("media_type").reset_index(drop=True))


def media_chunks(sf_dir: str, window: int = 256, stride: int = 192):
    """Chunk-plan expansion over binary payloads — the frame-sampler analogue
    (SURVEY §2 M3, ``ndd/extract_images.py:43``: fixed-stride sampling inside
    a unit): one (media_id, chunk_idx, offset, n_bytes) row per
    ``stride``-spaced window of each payload; the last window is truncated,
    empty payloads emit nothing.

    Expansion is fully vectorized: byte lengths via ``pc.binary_length``,
    per-row chunk counts in closed form, rows materialized with one
    ``np.repeat`` + per-row aranges — no per-payload Python.  The chunk PLAN
    carries only arithmetic (offsets/lengths), so at 100 TB the expansion is
    metadata-sized; actual chunk bytes stay in the payload column and are
    sliced lazily by downstream decode stages."""

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "media_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "offset": pa.array([], pa.int64()),
                "n_bytes": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        length = pc.binary_length(batch["payload"]).to_numpy(zero_copy_only=False)
        n_chunks = np.where(length > 0, 1 + (np.maximum(length, 1) - 1) // stride, 0)
        total = int(n_chunks.sum())
        if total == 0:
            return empty
        row_idx = np.repeat(np.arange(len(length), dtype=np.int64), n_chunks)
        starts = np.zeros(len(length), dtype=np.int64)
        np.cumsum(n_chunks[:-1], out=starts[1:])
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, n_chunks)
        offset = chunk_idx * stride
        n_bytes = np.minimum(window, length[row_idx] - offset)
        return pa.table(
            {
                "media_id": batch["media_id"].take(pa.array(row_idx)),
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "offset": pa.array(offset, pa.int64()),
                "n_bytes": pa.array(n_bytes, pa.int64()),
            }
        )

    return media_from_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


def media_chunk_dedup(sf_dir: str, window: int = 256, stride: int = 192):
    """Content-level CHUNK dedup across binary payloads — the multimodal
    cousin of exact text dedup (storage dedup / repeated-asset detection):
    hash every ``stride``-spaced window of every payload and report the chunk
    contents occurring more than once corpus-wide.

    The chunk plan is the same arithmetic as :func:`media_chunks`; here the
    actual BYTES are sliced and fingerprinted (md5_low64, the DuckDB-parity
    basis), then ONE keyed hash-partition on the fingerprint + a block-local
    groupby emits (chunk_hash, n_occurrences, n_media) for duplicated chunks.
    At 100 TB the payload column streams: each task touches only its block's
    bytes, and the shuffle carries 8-byte hashes, never chunk bytes."""
    import pandas as pd

    from ..functions.hashing import md5_low64
    from ..state.partitioning import key_partitioned

    def chunk_hashes(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        payloads = batch["payload"].to_pylist()
        hs: list[int] = []
        mids: list[int] = []
        for mid, p in zip(ids, payloads):
            for off in range(0, len(p), stride):
                hs.append(md5_low64(p[off : off + window]))
                mids.append(int(mid))
        return pa.table(
            {
                "h": pa.array(np.array(hs, dtype=np.uint64), pa.uint64()),
                "media_id": pa.array(mids, pa.int64()),
            }
        )

    def dup_block(df: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [("chunk_hash", pa.uint64()), ("n_occurrences", pa.int64()),
             ("n_media", pa.int64())]
        )
        if df.empty:
            return pa.Table.from_pylist([], schema=schema)
        g = df.groupby("h", sort=False).agg(
            n_occurrences=("media_id", "size"), n_media=("media_id", "nunique")
        ).reset_index()
        g = g[g["n_occurrences"] > 1]
        return pa.table(
            {
                "chunk_hash": pa.array(g["h"].to_numpy().astype(np.uint64), pa.uint64()),
                "n_occurrences": pa.array(g["n_occurrences"].to_numpy(), pa.int64()),
                "n_media": pa.array(g["n_media"].to_numpy(), pa.int64()),
            },
            schema=schema,
        )

    hashes = media_from_documents(sf_dir).map_batches(
        chunk_hashes, batch_format="pyarrow", batch_size=256
    )
    return key_partitioned(hashes, ["h"]).map_batches(
        dup_block, batch_format="pandas", batch_size=None
    )


# Content-defined chunking (gear hash / FastCDC family — public knowledge:
# Xia et al., USENIX ATC'16).  The 64-entry-window gear recurrence
# h_i = (2*h_{i-1} + gear[b_i]) mod 2^64 depends only on the last 64 bytes,
# so it vectorizes as 64 shifted adds over the whole byte array.
_GEAR = np.random.default_rng(0x9E3779B9).integers(
    0, 2**64, size=256, dtype=np.uint64
)  # uniform 64-bit entries: every output bit well-mixed


def cdc_boundaries(data: bytes, min_size: int = 64, avg_bits: int = 7,
                   max_size: int = 1024) -> np.ndarray:
    """Chunk END offsets (exclusive) for one payload under gear-hash CDC:
    a boundary lands after byte i when the rolling hash's low ``avg_bits``
    bits are zero, subject to ``min_size``/``max_size`` chunk bounds
    (expected chunk ~2^avg_bits bytes).  Deterministic; identical content
    yields identical boundaries regardless of where it sits in the stream
    once the 64-byte hash window has refilled — the shift-robustness that
    fixed-stride chunking lacks."""
    n = len(data)
    if n == 0:
        return np.empty(0, np.int64)
    b = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[b]
    h = np.zeros(n, np.uint64)
    for k in range(64):
        if k >= n:
            break
        h[k:] += g[: n - k] << np.uint64(k)
    mask = np.uint64((1 << avg_bits) - 1)
    cand = np.flatnonzero((h & mask) == 0) + 1  # boundary AFTER byte i
    ends = []
    start = 0
    for c in map(int, cand):
        if c - start < min_size:
            continue
        while c - start > max_size:  # forced cuts for long gaps
            start += max_size
            ends.append(start)
        ends.append(c)
        start = c
    while n - start > max_size:
        start += max_size
        ends.append(start)
    if start < n:
        ends.append(n)
    return np.asarray(ends, np.int64)


def media_cdc_dedup(sf_dir: str, min_size: int = 64, avg_bits: int = 7,
                    max_size: int = 1024, num_partitions: int | None = None):
    """CONTENT-DEFINED chunk dedup across binary payloads — the
    insertion-robust upgrade of :func:`media_chunk_dedup`: identical content
    at DIFFERENT byte offsets (a prepended header, an insertion) still
    produces identical chunks because boundaries follow content, not stride.

    Per block: boundaries via the vectorized gear hash, chunk bytes
    fingerprinted (md5_low64), then ONE keyed hash-partition on the
    fingerprint and a block-local census — the shuffle carries 8-byte
    hashes only.  Output: (chunk_hash, n_occurrences, n_media) for chunk
    contents occurring more than once.  SQL-replayed EXACTLY in the driver
    gate (__ray_entry__._media_cdc_sql: 64-LAG-term HUGEINT gear window +
    recursive boundary walk over a precomputed next-candidate map);
    tests/test_cdc.py additionally pins a from-scratch oracle, boundary
    bounds, and the shift-robustness property."""
    import pandas as pd

    from ..functions.hashing import md5_low64
    from ..state.partitioning import key_partitioned

    def chunk_hashes(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        payloads = batch["payload"].to_pylist()
        hs: list[int] = []
        mids: list[int] = []
        for mid, p in zip(ids, payloads):
            start = 0
            for e in cdc_boundaries(p, min_size, avg_bits, max_size):
                hs.append(md5_low64(p[start:e]))
                mids.append(int(mid))
                start = int(e)
        return pa.table(
            {
                "h": pa.array(np.array(hs, dtype=np.uint64), pa.uint64()),
                "media_id": pa.array(mids, pa.int64()),
            }
        )

    def dup_block(df: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [("chunk_hash", pa.uint64()), ("n_occurrences", pa.int64()),
             ("n_media", pa.int64())]
        )
        if df.empty:
            return pa.Table.from_pylist([], schema=schema)
        g = df.groupby("h", sort=False).agg(
            n_occurrences=("media_id", "size"), n_media=("media_id", "nunique")
        ).reset_index()
        g = g[g["n_occurrences"] > 1]
        return pa.table(
            {
                "chunk_hash": pa.array(g["h"].to_numpy(), pa.uint64()),
                "n_occurrences": pa.array(g["n_occurrences"].to_numpy(), pa.int64()),
                "n_media": pa.array(g["n_media"].to_numpy(), pa.int64()),
            },
            schema=schema,
        )

    hashes = media_from_documents(sf_dir).map_batches(
        chunk_hashes, batch_format="pyarrow"
    )
    return key_partitioned(hashes, ["h"], num_partitions).map_batches(
        dup_block, batch_format="pandas", batch_size=None
    )
