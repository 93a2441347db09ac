"""Compliance deletion (tombstones): purge named conversations from every
checkpointed stage output, immediately and permanently.

The problem it solves: ``stages/incremental.py`` evicts conversations that
VANISH FROM THE INPUT, but a right-to-be-forgotten request arrives as an
explicit id list while the input corpus (which the engine does not own) may
still contain the rows.  ``forget(root, ids)`` must therefore:

1. **Purge now** — rewrite the CURRENT version of every checkpointed stage
   with the ids (and any dup-pair/substring edge touching them) filtered
   out, as a NEW tombstoned version;
2. **Purge history** — delete every OTHER retained snapshot of each stage
   (time travel would otherwise resurrect the data; compliance supersedes
   ``keep_versions`` and version pins);
3. **Taint lineage** — record a rolling tombstone digest that
   ``StageCheckpointer`` mixes into every stage hash, so a later pipeline
   run neither skips back to a pre-deletion snapshot nor recomputes the
   deleted conversations from a stale input (the checkpointed pipeline
   anti-filters its ingest against the tombstone set).

Deletion ids travel as an object-store broadcast (``ray.put`` once, probed
with vectorized ``pc.is_in`` inside map tasks) — compliance sets are small
relative to the corpus; past ~5M ids the same Bloom-filter machinery the
verify semi-join uses (``state/bloom.py``) is the drop-in upgrade.

Reference analogue: the reference's ``update_index`` deletes vanished videos
from the in-memory index (``ndd/server_ndd.py:246-261``) but has no story
for persisted features on disk; this stage is the durable-storage
completion of that semantic.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TOMBSTONE_MANIFEST = "_TOMBSTONES.json"
TOMBSTONE_DIR = "_tombstones"

# stage schemas identify rows by these columns; a row dies when ANY of its
# id columns is tombstoned (pairs/edges touching a forgotten conv must go)
_ID_COLUMNS = ("conv_id", "a", "b")

# conv-id-VALUED label columns on surviving rows (rep_id = fingerprint
# representative, cluster_id = min component member): when the labeling row
# itself is forgotten, survivors that reference it are relabeled to the min
# surviving conv_id of the same group, so forgotten identifiers do not
# persist on disk as other rows' labels (round-3 ADVICE)
_REF_COLUMNS = ("rep_id", "cluster_id")


def _count_rows(data_dir: str) -> tuple[int, list[dict]]:
    n, partitions = 0, []
    for fname in sorted(os.listdir(data_dir)):
        try:
            nr = pq.read_metadata(os.path.join(data_dir, fname)).num_rows
        except Exception:
            continue
        partitions.append({"file": fname, "rows": nr})
        n += nr
    return n, partitions


def _build_ref_remap(filtered, ref_cols, ids_ref) -> dict:
    """{forgotten label -> min surviving conv_id sharing it}, per ref col.

    Bounded by the tombstone set: only rows whose label is forgotten are
    projected out of the map tasks; partial per-block minima merge on the
    driver."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        outs = []
        vs = ray.get(ids_ref)
        for col in ref_cols:
            if col not in t.schema.names or "conv_id" not in t.schema.names:
                continue
            sub = t.filter(pc.is_in(t[col], value_set=vs))
            if sub.num_rows == 0:
                continue
            g = pa.table(
                {"ref": sub[col], "conv_id": sub["conv_id"]}
            ).group_by("ref").aggregate([("conv_id", "min")])
            outs.append(pa.table({
                "col": pa.array([col] * g.num_rows, pa.string()),
                "ref": g["ref"].cast(pa.string()),
                "new": g["conv_id_min"].cast(pa.string()),
            }))
        if not outs:
            return pa.table({
                "col": pa.array([], pa.string()),
                "ref": pa.array([], pa.string()),
                "new": pa.array([], pa.string()),
            })
        return pa.concat_tables(outs)

    rows = filtered.map_batches(partial, batch_format="pyarrow").take_all()
    remap: dict = {}
    for r in rows:
        key = (r["col"], r["ref"])
        if key not in remap or r["new"] < remap[key]:
            remap[key] = r["new"]
    return remap


def _apply_ref_remap(filtered, ref_cols, remap: dict):
    import ray

    per_col: dict = {}
    for (col, ref), new in remap.items():
        per_col.setdefault(col, {})[ref] = new
    tables = {
        col: pa.table({
            "ref": pa.array(list(m.keys()), pa.string()),
            "new": pa.array(list(m.values()), pa.string()),
        })
        for col, m in per_col.items()
    }
    maps_ref = ray.put(tables)

    def rewrite(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        for col, m in ray.get(maps_ref).items():
            if col not in t.schema.names:
                continue
            idx = pc.index_in(t[col], value_set=m["ref"])
            hit = pc.is_valid(idx)
            if pc.any(hit).as_py() is not True:
                continue
            new_vals = pc.take(
                m["new"], pc.fill_null(idx, 0)
            )
            col_i = t.schema.get_field_index(col)
            merged = pc.if_else(hit, new_vals, t[col])
            t = t.set_column(col_i, t.schema.field(col_i), merged)
        return t

    return filtered.map_batches(rewrite, batch_format="pyarrow")


def tombstone_digest(root: str) -> str:
    """Rolling digest of every forget() call at this root ('' if none) —
    the value StageCheckpointer mixes into lineage hashes."""
    path = os.path.join(root, TOMBSTONE_MANIFEST)
    if not os.path.exists(path):
        return ""
    with open(path) as f:
        return json.load(f).get("digest", "")


def tombstone_ids(root: str) -> pa.Array:
    """All tombstoned ids at this root (deduped string array; empty if none)."""
    d = os.path.join(root, TOMBSTONE_DIR)
    if not os.path.isdir(d):
        return pa.array([], pa.string())
    tables = [
        pq.read_table(os.path.join(d, f))
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not tables:
        return pa.array([], pa.string())
    return pc.unique(pa.concat_tables(tables)["id"].combine_chunks())


def apply_tombstones(ds, root: str, id_column: str = "conv_id"):
    """Anti-filter a Dataset against this root's tombstone set (no-op when
    none exist): the ingest guard the checkpointed pipeline applies so a
    rerun over a stale input cannot recompute forgotten conversations.

    Integer id columns (doc_id/vec_id in persisted index artifacts) are
    matched by parsing the stored string ids — "%012d"-zero-padded conv_ids
    and plain digit strings both resolve; non-numeric ids simply never
    match an integer column."""
    ids = tombstone_ids(root)
    if len(ids) == 0:
        return ds
    import ray

    int_ids = []
    for s in ids.to_pylist():
        try:
            int_ids.append(int(s))
        except (TypeError, ValueError):
            pass
    ids_ref = ray.put(
        {"str": ids, "int": pa.array(sorted(set(int_ids)), pa.int64())}
    )

    def drop(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_column not in t.schema.names:
            return t
        sets = ray.get(ids_ref)
        col = t[id_column]
        if pa.types.is_integer(col.type):
            vs = sets["int"].cast(col.type)
        else:
            vs = sets["str"]
        dead = pc.is_in(col, value_set=vs)
        return t.filter(pc.invert(dead))

    return ds.map_batches(drop, batch_format="pyarrow")


def forget(root: str, ids: list[str], dry_run: bool = False) -> dict:
    """Tombstone ``ids`` at checkpoint root ``root`` (see module docstring).

    Returns a report: per stage the rows dropped and versions purged, plus
    the new rolling digest.  ``dry_run`` reports what WOULD be dropped
    without touching disk.  Idempotent: forgetting already-forgotten ids
    drops 0 rows but still advances the digest (auditable re-request).
    """
    import ray
    import ray.data as rd

    ids = sorted(set(ids))
    if not ids:
        raise ValueError("forget() requires at least one id")
    old_digest = tombstone_digest(root)
    new_digest = hashlib.md5(
        (old_digest + "\n" + "\n".join(ids)).encode()
    ).hexdigest()
    ids_arr = pa.array(ids, pa.string())
    ids_ref = ray.put(ids_arr)

    report: dict = {"digest": new_digest, "n_ids": len(ids),
                    "dry_run": dry_run, "stages": {}}

    stages = sorted(
        d for d in (os.listdir(root) if os.path.isdir(root) else [])
        if not d.startswith("_")
        and (
            os.path.islink(os.path.join(root, d, "data"))
            or os.path.isdir(os.path.join(root, d, "data"))
        )
    )
    for stage in stages:
        link = os.path.join(root, stage, "data")
        # legacy pre-versioning layout: a REAL data dir (no versions/
        # symlink).  run_stage still reads it, so forget() must still purge
        # it — rewritten in place below (round-3 ADVICE: never skip silently)
        legacy = not os.path.islink(link)
        if legacy:
            cur_version, cur_data = None, link
        else:
            cur_version = os.readlink(link).split(os.sep)[1]
            cur_data = os.path.join(
                root, stage, "versions", cur_version, "data"
            )
        pq_files = [f for f in sorted(os.listdir(cur_data))
                    if f.endswith(".parquet")]
        if not pq_files:
            continue
        schema = pq.read_schema(os.path.join(cur_data, pq_files[0]))
        id_cols = [c for c in _ID_COLUMNS if c in schema.names]
        ref_cols = [c for c in _REF_COLUMNS if c in schema.names]
        src = rd.read_parquet(cur_data)
        n_before = src.count()
        if not id_cols:
            report["stages"][stage] = {
                "rows_dropped": 0, "versions_purged": 0,
                "note": "no id columns; untouched",
            }
            continue

        def keep(t: pa.Table, cols=tuple(id_cols)) -> pa.Table:
            if t.num_rows == 0:
                return t
            dead = None
            vs = ray.get(ids_ref)
            for c in cols:
                m = pc.is_in(t[c], value_set=vs)
                dead = m if dead is None else pc.or_(dead, m)
            return t.filter(pc.invert(dead))

        filtered = rd.read_parquet(cur_data).map_batches(
            keep, batch_format="pyarrow"
        )
        remap = (
            _build_ref_remap(filtered, ref_cols, ids_ref) if ref_cols else {}
        )
        if remap:
            filtered = _apply_ref_remap(filtered, ref_cols, remap)
        if dry_run:
            n_after = filtered.count()
            vroot = os.path.join(root, stage, "versions")
            report["stages"][stage] = {
                "rows_dropped": n_before - n_after,
                # the real run replaces EVERY existing version (including
                # the old current) with the single tombstoned one
                "versions_purged": (
                    0 if legacy else len(os.listdir(vroot))
                ),
                "refs_rewritten": len(remap),
                **({"note": "legacy layout; would rewrite in place"}
                   if legacy else {}),
            }
            continue

        if legacy:
            tmp = link + ".purged.tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            filtered.write_parquet(tmp)
            if not os.path.isdir(tmp):  # all rows filtered: keep the schema
                os.makedirs(tmp, exist_ok=True)
                pq.write_table(schema.empty_table(),
                               os.path.join(tmp, "empty_0.parquet"))
            old = link + ".pretombstone.tmp"
            shutil.rmtree(old, ignore_errors=True)
            os.rename(link, old)
            os.rename(tmp, link)
            shutil.rmtree(old, ignore_errors=True)
            n_after, partitions = _count_rows(link)
            mpath = os.path.join(root, stage, "_MANIFEST.json")
            if os.path.exists(mpath):
                with open(mpath) as f:
                    man = json.load(f)
                man.update({
                    "row_count": n_after, "partitions": partitions,
                    "tombstone_digest": new_digest,
                })
                with open(mpath + ".tmp", "w") as f:
                    json.dump(man, f, indent=2)
                os.rename(mpath + ".tmp", mpath)
            report["stages"][stage] = {
                "rows_dropped": n_before - n_after, "versions_purged": 0,
                "refs_rewritten": len(remap),
                "note": "legacy layout; rewritten in place",
            }
            continue

        new_version = hashlib.md5(
            (cur_version + ":" + new_digest).encode()
        ).hexdigest()[:12]
        vdir = os.path.join(root, stage, "versions", new_version)
        data_dir = os.path.join(vdir, "data")
        tmp = data_dir + ".tmp"
        shutil.rmtree(vdir, ignore_errors=True)
        os.makedirs(vdir, exist_ok=True)
        filtered.write_parquet(tmp)
        if not os.path.isdir(tmp):  # everything filtered out: keep the schema
            os.makedirs(tmp, exist_ok=True)
            pq.write_table(schema.empty_table(),
                           os.path.join(tmp, "empty_0.parquet"))
        os.rename(tmp, data_dir)

        n_after, partitions = _count_rows(data_dir)

        old_manifest = {}
        old_man_path = os.path.join(
            root, stage, "versions", cur_version, "manifest.json"
        )
        if os.path.exists(old_man_path):
            with open(old_man_path) as f:
                old_manifest = json.load(f)
        manifest = dict(old_manifest)
        manifest.update(
            {
                "stage": stage,
                "stage_hash": new_version,
                "tombstone_digest": new_digest,
                "tombstoned_from": cur_version,
                "row_count": n_after,
                "partitions": partitions,
                "metrics": {"forget_at": time.strftime("%Y-%m-%dT%H:%M:%S")},
            }
        )
        with open(os.path.join(vdir, "manifest.json") + ".tmp", "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(os.path.join(vdir, "manifest.json") + ".tmp",
                  os.path.join(vdir, "manifest.json"))

        # repoint current, mirror the pointer manifest, purge ALL other
        # versions (history holds the forgotten rows) and drop pins
        tmp_link = link + ".lnk.tmp"
        if os.path.lexists(tmp_link):
            os.unlink(tmp_link)
        os.symlink(os.path.join("versions", new_version, "data"), tmp_link)
        os.replace(tmp_link, link)
        mpath = os.path.join(root, stage, "_MANIFEST.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(mpath + ".tmp", mpath)

        from .checkpoint import _PIN_REGISTRY, _WEAK_PINS

        key = (os.path.abspath(root), stage)
        _PIN_REGISTRY.pop(key, None)
        _WEAK_PINS.pop(key, None)
        vroot = os.path.join(root, stage, "versions")
        purged = 0
        for v in os.listdir(vroot):
            if v != new_version:
                shutil.rmtree(os.path.join(vroot, v), ignore_errors=True)
                purged += 1
        report["stages"][stage] = {
            "rows_dropped": n_before - n_after, "versions_purged": purged,
            "refs_rewritten": len(remap),
        }

    if not dry_run:
        tdir = os.path.join(root, TOMBSTONE_DIR)
        os.makedirs(tdir, exist_ok=True)
        seq = len([f for f in os.listdir(tdir) if f.endswith(".parquet")])
        pq.write_table(
            pa.table({"id": ids_arr}),
            os.path.join(tdir, f"ids-{seq:06d}.parquet"),
        )
        # digest manifest LAST: a crash above degrades to re-runnable
        # partial state, never to a recorded-but-unapplied tombstone
        path = os.path.join(root, TOMBSTONE_MANIFEST)
        with open(path + ".tmp", "w") as f:
            json.dump(
                {"digest": new_digest, "n_files": seq + 1,
                 "updated": time.strftime("%Y-%m-%dT%H:%M:%S")}, f, indent=2
            )
        os.rename(path + ".tmp", path)
    return report
