"""Incremental, bucket-partitioned signature store — T3/D4 parity with the
reference's ``update_index`` semantics (refresh only changed videos and reuse
cached rows, evict vanished ones: ``ndd/server_ndd.py:227-261``), re-expressed
for Ray Data at partition granularity:

- conversations are hash-bucketed by ``md5_low64(conv_id) % n_buckets``
  (stable across runs and processes — never Python's salted ``hash``);
- each bucket has an ORDER-INSENSITIVE content digest (XOR of
  ``md5_low64(conv_id + NUL + fingerprint)`` over its members), computed as
  per-block partials inside ``map_batches`` and combined on the driver
  (``n_buckets`` tiny rows — never the rows themselves);
- ``update()`` recomputes signatures ONLY for buckets whose digest changed
  (adding one conversation touches exactly one bucket), reuses the parquet
  partitions of unchanged buckets, and DELETES partitions of buckets that
  vanished from the input (eviction);
- the manifest (bucket -> digest + config hash) is written LAST, so a crash
  mid-update degrades to recompute, never to stale reads.

At cluster scale the store root lives on shared storage (same assumption as
``stages/checkpoint.py``); per-bucket parquet files are written inside the
map tasks, so no signature row ever passes through the driver.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import NDDConfig
from ..functions.hashing import md5_low64

MANIFEST_NAME = "_INCR_MANIFEST.json"


def _bucket_ids(conv_ids: list[str], n_buckets: int) -> np.ndarray:
    return np.array(
        [md5_low64(c) % n_buckets for c in conv_ids], dtype=np.int64
    )


class IncrementalSignatureStore:
    """Bucket-partitioned signature checkpoint with changed-bucket recompute
    and vanished-bucket eviction."""

    def __init__(self, root: str, cfg: NDDConfig | None = None, n_buckets: int = 64) -> None:
        self.root = root
        self.cfg = cfg or NDDConfig()
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST_NAME)

    def _read_manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def _bucket_dir(self, bucket: int) -> str:
        return os.path.join(self.root, f"bucket={bucket}")

    # -- digests -----------------------------------------------------------

    def _bucket_digests(self, conversations) -> dict[int, int]:
        """bucket -> XOR digest, via per-block partials (driver sees only
        ``n_buckets`` combined rows)."""
        n_buckets = self.n_buckets

        def partial(t: pa.Table) -> pa.Table:
            ids = t["conv_id"].to_pylist()
            fps = t["fingerprint"].to_pylist()
            if not ids:
                return pa.table(
                    {"bucket": pa.array([], pa.int64()),
                     "digest": pa.array([], pa.uint64())}
                )
            buckets = _bucket_ids(ids, n_buckets)
            row_dig = np.array(
                [md5_low64(f"{c}\x00{f}") for c, f in zip(ids, fps)], dtype=np.uint64
            )
            out_b, out_d = [], []
            for b in np.unique(buckets):
                out_b.append(int(b))
                out_d.append(np.bitwise_xor.reduce(row_dig[buckets == b]))
            return pa.table(
                {"bucket": pa.array(out_b, pa.int64()),
                 "digest": pa.array(np.array(out_d, dtype=np.uint64), pa.uint64())}
            )

        parts = (
            conversations.select_columns(["conv_id", "fingerprint"])
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas()
        )
        out: dict[int, int] = {}
        for b, d in zip(parts["bucket"], parts["digest"]):
            out[int(b)] = out.get(int(b), 0) ^ int(d)
        return out

    # -- update ------------------------------------------------------------

    def update(self, conversations, concurrency=None) -> dict:
        """Bring the store in sync with ``conversations`` (schema: conv_id,
        doc_text, fingerprint, ...).  Returns the signatures Dataset over the
        CURRENT corpus plus per-bucket work stats."""
        import ray.data as rd

        from ..state.partitioning import key_partitioned
        from .signatures import Signer, sign_conversations

        manifest = self._read_manifest()
        old = {int(k): int(v) for k, v in manifest.get("buckets", {}).items()}
        config_changed = manifest.get("config") != self.cfg.config_hash()
        new = self._bucket_digests(conversations)

        changed = sorted(
            b for b, d in new.items() if config_changed or old.get(b) != d
        )
        reused = sorted(b for b in new if b not in changed)
        evicted = sorted(b for b in old if b not in new)

        # eviction + invalidation first (crash-safe: manifest still old)
        for b in evicted + changed:
            shutil.rmtree(self._bucket_dir(b), ignore_errors=True)

        if changed:
            changed_set = set(changed)
            n_buckets = self.n_buckets

            def keep_changed(t: pa.Table) -> pa.Table:
                ids = t["conv_id"].to_pylist()
                if not ids:
                    return t
                buckets = _bucket_ids(ids, n_buckets)
                mask = np.isin(buckets, list(changed_set))
                return t.filter(pa.array(mask))

            subset = conversations.map_batches(keep_changed, batch_format="pyarrow")
            sigs = sign_conversations(subset, self.cfg, concurrency=concurrency)

            root = self.root

            def write_block(t: pa.Table) -> pa.Table:
                """Write each bucket's rows of this block to its partition dir
                (inside the task — signature rows never touch the driver)."""
                ids = t["conv_id"].to_pylist()
                if not ids:
                    return pa.table({"bucket": pa.array([], pa.int64()),
                                     "rows": pa.array([], pa.int64())})
                buckets = _bucket_ids(ids, n_buckets)
                out_b, out_r = [], []
                for b in np.unique(buckets):
                    sub = t.filter(pa.array(buckets == b))
                    d = os.path.join(root, f"bucket={int(b)}")
                    os.makedirs(d, exist_ok=True)
                    pq.write_table(sub, os.path.join(d, f"part-{uuid.uuid4().hex}.parquet"))
                    out_b.append(int(b))
                    out_r.append(sub.num_rows)
                return pa.table({"bucket": pa.array(out_b, pa.int64()),
                                 "rows": pa.array(out_r, pa.int64())})

            written = sigs.map_batches(write_block, batch_format="pyarrow").to_pandas()
            rows_written = int(written["rows"].sum()) if len(written) else 0
        else:
            rows_written = 0

        # manifest LAST
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "config": self.cfg.config_hash(),
                    "n_buckets": self.n_buckets,
                    "buckets": {str(b): d for b, d in sorted(new.items())},
                },
                f,
                indent=2,
            )
        os.rename(tmp, self._manifest_path())

        files = [
            os.path.join(self._bucket_dir(b), f)
            for b in sorted(new)
            for f in sorted(os.listdir(self._bucket_dir(b)))
        ]
        signatures = rd.read_parquet(files) if files else None
        return {
            "signatures": signatures,
            "buckets_changed": changed,
            "buckets_reused": reused,
            "buckets_evicted": evicted,
            "rows_written": rows_written,
        }
