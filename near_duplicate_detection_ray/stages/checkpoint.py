"""Per-stage Parquet checkpoints with chained lineage manifests.

Mirrors the reference's ``.done`` version-file semantics
(``ndd/extract_features.py:74-102``, ``ndd/extract_images.py:164-188``):

- a stage's LINEAGE HASH chains its own config with every upstream stage's
  hash (the reference concatenates upstream ``.done`` parameter lines);
- equality of the stored hash gates recompute (``extract_features.py:88``);
- output is written first, the manifest LAST, so a crash mid-write leaves a
  stage that will simply recompute (the reference wipes the dir and writes
  ``.done`` last, ``extract_images.py:183-188,237-239``);
- the manifest carries per-partition lineage + metrics: one entry per output
  parquet file with its row count (north_rule: "per-partition lineage +
  metrics").

Resume = rerun the same pipeline: stages whose manifest hash matches are
loaded from Parquet instead of recomputed; a changed config (or changed
upstream) hash forces recompute of that stage and everything after it.

VERSIONED SNAPSHOTS (time travel): each distinct lineage hash persists under
``<stage>/versions/<hash12>/`` with its own manifest, so flipping a config
back and forth never recomputes (both versions stay on disk up to the
retention limit), concurrent readers of the previous version are never
disturbed by a recompute (new data lands in a NEW directory), and
``read_stage_version`` serves any retained snapshot.  ``<stage>/data`` is a
symlink to the current version's data dir — the stable path the CLI and
older tooling read.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import weakref
from collections.abc import Callable

from ..config import NDDConfig

MANIFEST_NAME = "_MANIFEST.json"

# Versions handed out as LAZY datasets this process (run_stage /
# read_stage_version / diff_stage_versions), keyed (abs checkpoint root,
# stage): pruning skips
# them, so a later run_stage — through ANY StageCheckpointer instance, not
# just the one that handed the dataset out — can't rmtree a snapshot out
# from under an unconsumed rd.read_parquet handle.  Per-stage scoping keeps
# one stage's pins from eating another stage's keep_versions budget.
# Process-local by design (lazy handles don't outlive the process); call
# clear_version_pins() in long-lived services once handles are consumed.
_PIN_REGISTRY: dict[tuple[str, str], set[str]] = {}

# LIVENESS pins (round-3 ADVICE): every lazy dataset run_stage hands out
# weak-pins its version — pruning skips a version while any handle is alive,
# and the pin dissolves when the handle is garbage-collected, so repeated
# run_stage loops that drop their handles still honor keep_versions exactly.
# The weakref target is the dataset's logical-plan ROOT op when reachable
# (derived datasets — ds.map_batches(...) chains — keep the upstream Read op
# alive, so the pin survives the caller dropping the source wrapper), else
# the Dataset wrapper itself.
_WEAK_PINS: dict[tuple[str, str], dict[str, "weakref.WeakSet"]] = {}


def _weak_pin(root: str, name: str, stage_hash: str, ds) -> None:
    target = ds
    try:
        dag = ds._logical_plan.dag  # liveness-faithful for derived datasets
        if dag is not None:
            target = dag
    except AttributeError:
        pass
    bucket = _WEAK_PINS.setdefault((os.path.abspath(root), name), {})
    ws = bucket.setdefault(stage_hash[:12], weakref.WeakSet())
    try:
        ws.add(target)
    except TypeError:  # plan op not weak-referenceable: pin the wrapper
        try:
            ws.add(ds)
        except TypeError:
            pass  # no liveness pin; keep_versions still protects current


def clear_version_pins(root: str | None = None) -> None:
    """Release version pins, explicit and liveness (all roots, or one
    checkpoint root)."""
    if root is None:
        _PIN_REGISTRY.clear()
        _WEAK_PINS.clear()
        return
    key_root = os.path.abspath(root)
    for reg in (_PIN_REGISTRY, _WEAK_PINS):
        for k in [k for k in reg if k[0] == key_root]:
            del reg[k]


class StageCheckpointer:
    """Runs named stages with skip-if-unchanged Parquet checkpoints.

    ``root`` is the checkpoint directory (one subdir per stage).
    ``input_token`` identifies the pipeline input (e.g. its path) and is
    folded into every stage hash, so pointing the same checkpoint root at
    different data forces recompute.
    """

    def __init__(self, root: str, cfg: NDDConfig | None = None, input_token: str = "",
                 keep_versions: int = 3) -> None:
        self.root = root
        self.cfg = cfg or NDDConfig()
        self.input_token = input_token
        # retained snapshots per stage (current version never pruned); an
        # operational knob, deliberately NOT part of the lineage hash
        self.keep_versions = max(1, keep_versions)
        self.stage_hashes: dict[str, str] = {}
        self.stages_skipped: list[str] = []
        self.stages_computed: list[str] = []
        os.makedirs(root, exist_ok=True)
        # compliance taint (stages/tombstone.py): folding the rolling forget
        # digest into every stage hash means a rerun can neither skip back
        # to a pre-deletion snapshot nor silently reuse one
        from .tombstone import tombstone_digest

        self.tombstone_token = tombstone_digest(root)

    def _lineage_hash(self, name: str, upstream: list[str]) -> str:
        lineage = {
            "stage": name,
            "config": self.cfg.config_hash(),
            "input": self.input_token,
            "upstream": [self.stage_hashes[u] for u in upstream],
        }
        if self.tombstone_token:
            # only folded in once a forget() exists, so every pre-tombstone
            # checkpoint root keeps its hashes (no global invalidation)
            lineage["tombstones"] = self.tombstone_token
        payload = json.dumps(lineage, sort_keys=True)
        return hashlib.md5(payload.encode()).hexdigest()

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.root, name, MANIFEST_NAME)

    def _data_dir(self, name: str) -> str:
        return os.path.join(self.root, name, "data")

    def _version_dir(self, name: str, stage_hash: str) -> str:
        return os.path.join(self.root, name, "versions", stage_hash[:12])

    def _set_current(self, name: str, stage_hash: str) -> None:
        """Point ``<stage>/data`` at the version's data dir (atomic symlink
        swap) — the stable path the CLI and legacy readers use."""
        stage_dir = os.path.join(self.root, name)
        link = self._data_dir(name)
        target = os.path.join("versions", stage_hash[:12], "data")
        tmp = link + ".lnk.tmp"
        if os.path.islink(link) or os.path.exists(link):
            if not os.path.islink(link):
                # legacy real dir from a pre-versioning checkpoint: leave it —
                # it is itself the current data (migration happens on next
                # recompute, which writes a version and swaps the link)
                return
            if os.readlink(link) == target:
                return
        if os.path.lexists(tmp):
            os.unlink(tmp)
        os.symlink(target, tmp)
        os.replace(tmp, link)

    def run_stage(self, name: str, upstream: list[str], build: Callable[[], "object"]):
        """Return the stage's Dataset, loading from checkpoint when the stored
        lineage hash matches (ANY retained version, not just the latest run),
        else computing via ``build()`` and persisting a new version."""
        import ray.data as rd

        stage_hash = self._lineage_hash(name, upstream)
        self.stage_hashes[name] = stage_hash

        # 1. versioned snapshot hit: this exact lineage was computed before
        vdir = self._version_dir(name, stage_hash)
        if os.path.exists(os.path.join(vdir, "manifest.json")):
            self.stages_skipped.append(name)
            self._set_current(name, stage_hash)
            self._write_pointer_manifest(name, stage_hash)
            out = rd.read_parquet(os.path.join(vdir, "data"))
            _weak_pin(self.root, name, stage_hash, out)
            return out

        # 2. legacy (pre-versioning) layout hit
        mpath = self._manifest_path(name)
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest.get("stage_hash") == stage_hash and os.path.isdir(
                self._data_dir(name)
            ):
                self.stages_skipped.append(name)
                return rd.read_parquet(self._data_dir(name))

        t0 = time.time()
        ds = build()
        stage_dir = os.path.join(self.root, name)
        data_dir = os.path.join(vdir, "data")
        # per-process staging dir: two processes computing the SAME lineage
        # concurrently must not interleave writes into one tmp dir (review
        # finding — the shared-root incremental checkpoint made this real)
        tmp_dir = f"{data_dir}.tmp.{os.getpid()}"
        # clear THIS process's stale staging plus any crash-orphaned tmp
        # from earlier runs (legacy "data.tmp" included); live tmp dirs of
        # other processes keep their pid suffix and are left alone
        shutil.rmtree(tmp_dir, ignore_errors=True)
        if os.path.isdir(vdir):
            for d in os.listdir(vdir):
                if d == "data.tmp":
                    shutil.rmtree(os.path.join(vdir, d), ignore_errors=True)
        os.makedirs(os.path.dirname(tmp_dir), exist_ok=True)
        # a stale legacy real `data` dir must yield to the symlink swap below
        legacy = self._data_dir(name)
        if os.path.isdir(legacy) and not os.path.islink(legacy):
            shutil.rmtree(legacy, ignore_errors=True)
        os.makedirs(stage_dir, exist_ok=True)
        ds.write_parquet(tmp_dir)
        if not os.path.isdir(tmp_dir):
            # An empty dataset writes ZERO files (tmp_dir is never created) —
            # e.g. a corpus with no duplicates.  Persist one empty parquet
            # file carrying the stage schema so the rename, the manifest and
            # any later read_parquet (resume) all work.
            import pyarrow.parquet as _pq

            os.makedirs(tmp_dir, exist_ok=True)
            schema = ds.schema()
            arrow_schema = getattr(schema, "base_schema", None)
            if arrow_schema is None:  # ray Schema API moved; rebuild from names/types
                import pyarrow as _pa

                arrow_schema = _pa.schema(list(zip(schema.names, schema.types)))
            _pq.write_table(
                arrow_schema.empty_table(), os.path.join(tmp_dir, "empty_0.parquet")
            )
        try:
            os.rename(tmp_dir, data_dir)
        except OSError:
            if os.path.isdir(data_dir):
                # a concurrent run with the same lineage won the rename —
                # its snapshot is byte-equivalent (same hash); use it
                shutil.rmtree(tmp_dir, ignore_errors=True)
            else:
                raise

        # per-partition lineage + metrics
        import pyarrow.parquet as pq

        partitions = []
        total_rows = 0
        for fname in sorted(os.listdir(data_dir)):
            fpath = os.path.join(data_dir, fname)
            try:
                nrows = pq.read_metadata(fpath).num_rows
            except Exception:
                continue
            partitions.append({"file": fname, "rows": nrows})
            total_rows += nrows
        manifest = {
            "stage": name,
            "stage_hash": stage_hash,
            "config_hash": self.cfg.config_hash(),
            "input_token": self.input_token,
            "upstream": {u: self.stage_hashes[u] for u in upstream},
            "row_count": total_rows,
            "partitions": partitions,
            "metrics": {"wall_seconds": round(time.time() - t0, 3)},
        }
        # version manifest LAST within the version => crash-safe skip gate;
        # current pointer + symlink after that => readers of the previous
        # version were never disturbed
        vman = os.path.join(vdir, "manifest.json")
        with open(vman + ".tmp", "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(vman + ".tmp", vman)
        self._set_current(name, stage_hash)
        self._write_pointer_manifest(name, stage_hash, manifest)
        self._prune_versions(name, keep_hash=stage_hash)
        self.stages_computed.append(name)
        out = rd.read_parquet(data_dir)
        # weak-pin AFTER pruning: the just-produced hash is already in prune's
        # keep set, and the liveness pin protects the returned LAZY handle
        # from a LATER run_stage (different config) pruning this version
        # before the caller consumes or drops the dataset.
        _weak_pin(self.root, name, stage_hash, out)
        return out

    def _write_pointer_manifest(self, name: str, stage_hash: str,
                                manifest: dict | None = None) -> None:
        """``<stage>/_MANIFEST.json`` mirrors the CURRENT version's manifest
        (legacy readers + ``pipeline_report`` read this one file)."""
        if manifest is None:
            vman = os.path.join(self._version_dir(name, stage_hash), "manifest.json")
            if not os.path.exists(vman):
                return
            with open(vman) as f:
                manifest = json.load(f)
        mpath = self._manifest_path(name)
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(mpath + ".tmp", mpath)

    def _prune_versions(self, name: str, keep_hash: str) -> None:
        """Drop the oldest snapshots beyond ``keep_versions`` — never the one
        just produced/used, and never a version PINNED for this (root, stage)
        by an unconsumed lazy handle (pins are extra retention on top of the
        ``keep_versions`` newest, so pinning stage A cannot shrink stage B's
        retention, and pins made through one checkpointer instance protect
        snapshots from pruning by any other instance in the process)."""
        vroot = os.path.join(self.root, name, "versions")
        if not os.path.isdir(vroot):
            return
        entries = []
        for v in os.listdir(vroot):
            vman = os.path.join(vroot, v, "manifest.json")
            if os.path.exists(vman):
                entries.append((os.path.getmtime(vman), v))
        entries.sort(reverse=True)  # newest first
        key = (os.path.abspath(self.root), name)
        pins = _PIN_REGISTRY.get(key, set())
        weak = _WEAK_PINS.get(key, {})
        if any(len(ws) for ws in weak.values()):
            # Dataset plans can sit in reference cycles; one collection pass
            # (prune runs once per computed stage — cost is negligible) makes
            # "handle was dropped" visible to the WeakSet before we retain.
            import gc

            gc.collect()
        live = {v for v, ws in weak.items() if len(ws)}
        keep = (
            {v for _, v in entries[: self.keep_versions]}
            | pins | live | {keep_hash[:12]}
        )
        for _, v in entries:
            if v not in keep:
                shutil.rmtree(os.path.join(vroot, v), ignore_errors=True)

    def list_versions(self, name: str) -> list[dict]:
        """Retained snapshots of one stage, newest first: hash prefix, row
        count, config hash, write time — the time-travel catalog."""
        vroot = os.path.join(self.root, name, "versions")
        out = []
        if not os.path.isdir(vroot):
            return out
        for v in os.listdir(vroot):
            vman = os.path.join(vroot, v, "manifest.json")
            if not os.path.exists(vman):
                continue
            with open(vman) as f:
                m = json.load(f)
            out.append(
                {
                    "version": v,
                    "rows": m.get("row_count"),
                    "config_hash": m.get("config_hash", "")[:12],
                    "stage_hash": m.get("stage_hash", "")[:12],
                    "mtime": os.path.getmtime(vman),
                }
            )
        out.sort(key=lambda e: e["mtime"], reverse=True)
        return out

    def read_stage_version(self, name: str, version: str):
        """TIME TRAVEL: read a retained snapshot by version (hash prefix),
        regardless of what the current pointer says."""
        import ray.data as rd

        vroot = os.path.join(self.root, name, "versions")
        matches = [
            v for v in (os.listdir(vroot) if os.path.isdir(vroot) else [])
            if v.startswith(version)
            and os.path.exists(os.path.join(vroot, v, "manifest.json"))
        ]
        if len(matches) != 1:
            raise ValueError(
                f"version {version!r} of stage {name!r}: "
                f"{len(matches)} matches ({matches})"
            )
        _PIN_REGISTRY.setdefault(
            (os.path.abspath(self.root), name), set()
        ).add(matches[0])
        return rd.read_parquet(os.path.join(vroot, matches[0], "data"))

    def read_manifest(self, name: str) -> dict | None:
        mpath = self._manifest_path(name)
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            return json.load(f)


def checkpointed_near_dup_pipeline(
    transcripts,
    root: str,
    cfg: NDDConfig | None = None,
    input_token: str = "",
    include_substring: bool = True,
):
    """The flagship pipeline with per-stage checkpoints: stages
    ``conversations`` -> ``signatures`` -> ``verified_pairs`` ->
    ``substring_pairs`` -> ``clusters``, each a Parquet dir + manifest under
    ``root``.  Rerunning with unchanged config/input loads every stage from
    disk; deleting a later stage's manifest (or changing the config) recomputes
    from that point on.
    """
    import pyarrow.compute as pc

    from ..stages.assemble import assemble_conversations
    from ..stages.cluster import cluster as cluster_components
    from ..stages.exact import annotate_reps
    from ..stages.lsh import candidate_pairs, explode_bands
    from ..stages.signatures import sign_conversations
    from ..stages.substring import anchor_buckets, confirm_substring
    from ..stages.verify import verify_pairs
    from ..state.partitioning import materialize_clean
    from ..pipelines.dedup import exact_edges

    cfg = cfg or NDDConfig()
    ckpt = StageCheckpointer(root, cfg, input_token)

    # ingest guard: the input corpus may still contain forgotten
    # conversations (the engine does not own it); anti-filter at the read so
    # the tombstone-tainted lineage recomputes WITHOUT them
    if ckpt.tombstone_token:
        from .tombstone import apply_tombstones

        transcripts = apply_tombstones(transcripts, root, "conv_id")

    conversations = ckpt.run_stage(
        "conversations",
        [],
        lambda: materialize_clean(annotate_reps(assemble_conversations(transcripts))),
    )
    signatures = ckpt.run_stage(
        "signatures",
        ["conversations"],
        lambda: materialize_clean(
            sign_conversations(
                conversations.map_batches(
                    lambda t: t.filter(pc.equal(t["conv_id"], t["rep_id"])).drop_columns(
                        ["rep_id"]
                    ),
                    batch_format="pyarrow",
                ),
                cfg,
            )
        ),
    )

    def build_verified():
        buckets = explode_bands(signatures, cfg)
        if include_substring:
            buckets = buckets.union(anchor_buckets(signatures, cfg))
        return materialize_clean(verify_pairs(candidate_pairs(buckets, cfg), signatures, cfg))

    verified = ckpt.run_stage("verified_pairs", ["signatures"], build_verified)

    sub_pairs = None
    if include_substring:
        sub_pairs = ckpt.run_stage(
            "substring_pairs",
            ["verified_pairs", "conversations"],
            lambda: materialize_clean(
                confirm_substring(
                    verified.map_batches(
                        lambda t: t.filter(pc.equal(t["method"], "substring")),
                        batch_format="pyarrow",
                    ),
                    conversations,
                )
            ),
        )

    def build_clusters():
        dup = verified.map_batches(
            lambda t: t.filter(pc.equal(t["method"], "minhash")), batch_format="pyarrow"
        )
        edges = [exact_edges(conversations.select_columns(["conv_id", "rep_id"])), dup]
        if sub_pairs is not None:
            edges.append(sub_pairs)
        return cluster_components(conversations, edges)

    clusters = ckpt.run_stage(
        "clusters",
        ["verified_pairs", "conversations"]
        + (["substring_pairs"] if include_substring else []),
        build_clusters,
    )

    return {
        "conversations": conversations,
        "signatures": signatures,
        "verified_pairs": verified,
        "substring_pairs": sub_pairs,
        "clusters": clusters,
        "checkpointer": ckpt,
    }


def pipeline_report(root: str) -> list[dict]:
    """OBSERVABILITY: read every stage's ``_MANIFEST.json`` under ``root``
    into one report — per-stage row counts, partition counts, wall seconds,
    lineage hashes and upstream edges — the at-a-glance answer to "what did
    the last run compute, what did it skip, and where did the time go"
    (the reference answers this by eyeballing ``.done`` files per video
    dir).  Pure metadata: never opens a data file.  Returns a list of
    dicts sorted by stage name; the CLI ``report`` command prints it."""
    out = []
    if not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        mpath = os.path.join(root, name, MANIFEST_NAME)
        if not os.path.exists(mpath):
            continue
        with open(mpath) as f:
            m = json.load(f)
        out.append(
            {
                "stage": m.get("stage", name),
                "rows": m.get("row_count"),
                "partitions": len(m.get("partitions", [])),
                "wall_seconds": m.get("metrics", {}).get("wall_seconds"),
                "stage_hash": m.get("stage_hash", "")[:12],
                "upstream": sorted(m.get("upstream", {})),
            }
        )
    return out


def gc_versions(root: str, stage: str | None = None, keep: int = 2,
                dry_run: bool = False) -> dict[str, list[str]]:
    """Explicit checkpoint GC (the deferred-pruning companion to run_stage's
    automatic keep_versions pruning): for each stage under ``root`` (or just
    ``stage``), delete retained snapshots beyond the ``keep`` newest.  The
    CURRENT pointer's version, explicitly pinned versions, and versions with
    live lazy handles (this process) always survive.  Returns
    {stage: [deleted version prefixes]}; ``dry_run`` reports without
    deleting — the safe default for operators inspecting a shared root.
    """
    import gc as _gc

    out: dict[str, list[str]] = {}
    if not os.path.isdir(root):
        return out
    stages = [stage] if stage else sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d, "versions"))
    )
    _gc.collect()  # make dropped handles visible to the liveness pins
    for name in stages:
        vroot = os.path.join(root, name, "versions")
        if not os.path.isdir(vroot):
            continue
        entries = []
        for v in os.listdir(vroot):
            vman = os.path.join(vroot, v, "manifest.json")
            if os.path.exists(vman):
                entries.append((os.path.getmtime(vman), v))
        entries.sort(reverse=True)
        key = (os.path.abspath(root), name)
        protected = set(_PIN_REGISTRY.get(key, set()))
        protected |= {v for v, ws in _WEAK_PINS.get(key, {}).items() if len(ws)}
        link = os.path.join(root, name, "data")
        if os.path.islink(link):
            # current pointer: versions/<hash12>/data
            parts = os.readlink(link).split(os.sep)
            if len(parts) >= 2 and parts[0] == "versions":
                protected.add(parts[1])
        keep_set = {v for _, v in entries[:keep]} | protected
        dropped = [v for _, v in entries if v not in keep_set]
        for v in dropped:
            if not dry_run:
                shutil.rmtree(os.path.join(vroot, v), ignore_errors=True)
        if dropped:
            out[name] = dropped
    return out


def diff_stage_versions(root: str, stage: str, version_a: str, version_b: str,
                        key: str, value_col: str,
                        num_partitions: int | None = None):
    """SNAPSHOT DIFF (time-travel composition): classify every key between
    two retained versions of a checkpointed stage as ``added`` / ``removed``
    / ``changed`` / ``unchanged`` — "what did the config change actually do
    to the output" answered without recomputing anything.

    Works for ANY key/value column types (string conv_ids included): both
    snapshots co-shuffle once on ``key``, and the block kernel is a pure
    Arrow ``group_by`` — min/max of the side tag classifies presence,
    ``count_distinct`` of the value plus an explicit null flag detects change.
    Exchange volume is the two snapshots' (key, value) columns, never the
    full rows.  Assumes ``key`` is unique per snapshot (true for every
    checkpointed stage here); with duplicate keys a same-multiset pair of
    multi-valued sides would read as 'changed'.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..state.partitioning import key_partitioned

    ck = StageCheckpointer(root)
    ds_a = ck.read_stage_version(stage, version_a)
    ds_b = ck.read_stage_version(stage, version_b)

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            # NULLs ride an EXPLICIT flag column instead of a string sentinel
            # (a literal "\x00null" value in a string column would collide
            # with the old sentinel and misread NULL<->"\x00null" as
            # unchanged): count_distinct(v) ignores nulls, so change =
            # distinct non-null values + whether any NULL was present > 1.
            v = pc.cast(t[value_col], pa.string())
            return pa.table(
                {
                    "k": t[key],
                    "v": v,
                    "vn": pc.cast(pc.is_null(v), pa.int8()),
                    "side": pa.array([side] * t.num_rows, pa.int8()),
                }
            )

        return fn

    both = ds_a.map_batches(tag(0), batch_format="pyarrow").union(
        ds_b.map_batches(tag(1), batch_format="pyarrow")
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.schema(
                [("key", pa.string()), ("change_type", pa.string())]
            ).empty_table()
        g = t.group_by("k").aggregate(
            [("side", "min"), ("side", "max"),
             ("v", "count_distinct"), ("vn", "max")]
        )
        only_a = pc.equal(g["side_max"], pa.scalar(0, pa.int8()))
        only_b = pc.equal(g["side_min"], pa.scalar(1, pa.int8()))
        # distinct non-null values plus one if any NULL appeared: {x, NULL}
        # -> 2 (changed), {NULL, NULL} -> 1 (unchanged), {x, x} -> 1
        n_vals = pc.add(
            pc.cast(g["v_count_distinct"], pa.int64()),
            pc.cast(g["vn_max"], pa.int64()),
        )
        changed = pc.greater(n_vals, 1)
        ct = pc.if_else(
            only_a, pa.scalar("removed"),
            pc.if_else(
                only_b, pa.scalar("added"),
                pc.if_else(changed, pa.scalar("changed"), pa.scalar("unchanged")),
            ),
        )
        return pa.table({"key": pc.cast(g["k"], pa.string()), "change_type": ct})

    return key_partitioned(both, ["k"], num_partitions).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )
