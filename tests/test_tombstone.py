"""Compliance deletion (stages/tombstone.py): immediate purge across every
checkpointed stage, history purge, lineage taint, ingest guard, and the CLI."""

import json
import os
import shutil

import pyarrow as pa
import ray.data as rd

from near_duplicate_detection_ray.config import NDDConfig
from near_duplicate_detection_ray.sources.transcripts import synth_corpus

ROOT = "/tmp/ndd_tombstone_test"


def _run_pipeline(transcripts):
    from near_duplicate_detection_ray.stages.checkpoint import (
        checkpointed_near_dup_pipeline,
    )

    return checkpointed_near_dup_pipeline(
        rd.from_arrow(transcripts), ROOT, NDDConfig(), input_token="synth42"
    )


def _stage_frames():
    import pyarrow.parquet as pq

    out = {}
    for stage in sorted(os.listdir(ROOT)):
        data = os.path.join(ROOT, stage, "data")
        if os.path.isdir(data):
            out[stage] = pq.read_table(data).to_pandas()
    return out


def _mentions(df, cid):
    for col in ("conv_id", "a", "b"):
        if col in df.columns and (df[col] == cid).any():
            return True
    return False


def test_forget_purges_current_history_and_future(ray_session):
    shutil.rmtree(ROOT, ignore_errors=True)
    transcripts, _ = synth_corpus()
    _run_pipeline(transcripts)

    # x00000 is an exact copy of u00000: both appear in pair/cluster outputs
    target = "x00000"
    before = _stage_frames()
    assert any(_mentions(df, target) for df in before.values())

    from near_duplicate_detection_ray.stages.tombstone import (
        forget,
        tombstone_digest,
        tombstone_ids,
    )

    preview = forget(ROOT, [target], dry_run=True)
    assert preview["dry_run"] and sum(
        s["rows_dropped"] for s in preview["stages"].values()
    ) > 0
    assert tombstone_digest(ROOT) == ""  # dry run touches nothing

    report = forget(ROOT, [target])
    assert tombstone_digest(ROOT) == report["digest"] != ""
    assert target in tombstone_ids(ROOT).to_pylist()

    # 1. immediate purge: no stage output mentions the id
    after = _stage_frames()
    for stage, df in after.items():
        assert not _mentions(df, target), stage
    # every other conversation survives
    assert set(after["conversations"]["conv_id"]) == (
        set(before["conversations"]["conv_id"]) - {target}
    )

    # 2. history purge: exactly ONE retained version per rewritten stage
    for stage, rep in report["stages"].items():
        if rep.get("note"):
            continue
        vroot = os.path.join(ROOT, stage, "versions")
        assert len(os.listdir(vroot)) == 1, stage

    # 3. future: rerunning over the STALE input (still contains the target)
    # recomputes under the tainted lineage and keeps the id out
    _run_pipeline(transcripts)
    rerun = _stage_frames()
    for stage, df in rerun.items():
        assert not _mentions(df, target), f"resurrected in {stage}"
    # and a second rerun skips everything (stable tainted hashes): the
    # version catalog gains no new snapshots
    catalog = {
        s: sorted(os.listdir(os.path.join(ROOT, s, "versions")))
        for s in os.listdir(ROOT)
        if os.path.isdir(os.path.join(ROOT, s, "versions"))
    }
    _run_pipeline(transcripts)
    catalog2 = {
        s: sorted(os.listdir(os.path.join(ROOT, s, "versions")))
        for s in os.listdir(ROOT)
        if os.path.isdir(os.path.join(ROOT, s, "versions"))
    }
    assert catalog2 == catalog


def test_forget_cli(ray_session):
    import subprocess
    import sys

    # reuse the root from the previous test (order-independent: rebuild)
    shutil.rmtree(ROOT, ignore_errors=True)
    transcripts, _ = synth_corpus()
    _run_pipeline(transcripts)
    out = subprocess.run(
        [sys.executable, "-m", "near_duplicate_detection_ray", "forget",
         "--checkpoints", ROOT, "--ids", "n00000"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    rep = json.loads(out.stdout)
    assert rep["n_ids"] == 1 and rep["stages"]
    frames = _stage_frames()
    for stage, df in frames.items():
        assert not _mentions(df, "n00000"), stage

    bad = subprocess.run(
        [sys.executable, "-m", "near_duplicate_detection_ray", "forget",
         "--checkpoints", ROOT],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert bad.returncode == 1 and "no ids" in bad.stderr


def _write_stage_versioned(root, stage, table, version="aaaaaaaaaaaa"):
    import pyarrow.parquet as pq

    vdir = os.path.join(root, stage, "versions", version)
    os.makedirs(os.path.join(vdir, "data"), exist_ok=True)
    pq.write_table(table, os.path.join(vdir, "data", "part_0.parquet"))
    with open(os.path.join(vdir, "manifest.json"), "w") as f:
        json.dump({"stage": stage, "stage_hash": version,
                   "row_count": table.num_rows}, f)
    link = os.path.join(root, stage, "data")
    if os.path.lexists(link):
        os.unlink(link)
    os.symlink(os.path.join("versions", version, "data"), link)


def test_forget_legacy_layout_and_ref_remap(ray_session):
    """Round-3 ADVICE: (a) legacy real-`data`-dir stages are purged in place,
    not silently skipped; (b) forgotten conv_ids are rewritten out of other
    rows' rep_id/cluster_id labels; (c) dry_run reports the exact number of
    versions the real run purges."""
    import pyarrow.parquet as pq

    from near_duplicate_detection_ray.stages.tombstone import forget

    root = "/tmp/ndd_tombstone_unit"
    shutil.rmtree(root, ignore_errors=True)

    # legacy pre-versioning stage: a REAL data dir, rep_id labels
    legacy_data = os.path.join(root, "conversations", "data")
    os.makedirs(legacy_data)
    pq.write_table(
        pa.table({
            "conv_id": ["c1", "c2", "c3"],
            "rep_id": ["c1", "c1", "c3"],
        }),
        os.path.join(legacy_data, "part_0.parquet"),
    )
    with open(os.path.join(root, "conversations", "_MANIFEST.json"), "w") as f:
        json.dump({"stage": "conversations", "row_count": 3}, f)

    # versioned stage with TWO retained versions, cluster_id labels
    _write_stage_versioned(
        root, "clusters",
        pa.table({"conv_id": ["c1", "c2", "c3"],
                  "cluster_id": ["c1", "c1", "c3"]}),
        version="bbbbbbbbbbbb",
    )
    _write_stage_versioned(
        root, "clusters",
        pa.table({"conv_id": ["c1", "c2"], "cluster_id": ["c1", "c1"]}),
        version="cccccccccccc",
    )
    # point current back at the 3-row snapshot
    link = os.path.join(root, "clusters", "data")
    os.unlink(link)
    os.symlink(os.path.join("versions", "bbbbbbbbbbbb", "data"), link)

    preview = forget(root, ["c1"], dry_run=True)
    conv_prev = preview["stages"]["conversations"]
    clus_prev = preview["stages"]["clusters"]
    assert conv_prev["rows_dropped"] == 1 and conv_prev["versions_purged"] == 0
    assert "legacy" in conv_prev["note"]
    assert clus_prev["rows_dropped"] == 1
    # the real run replaces BOTH existing versions with the tombstoned one
    assert clus_prev["versions_purged"] == 2

    report = forget(root, ["c1"])
    assert report["stages"]["clusters"]["versions_purged"] == 2
    assert report["stages"]["conversations"]["refs_rewritten"] == 1
    assert report["stages"]["clusters"]["refs_rewritten"] == 1

    conv = pq.read_table(legacy_data).to_pandas().sort_values("conv_id")
    assert list(conv["conv_id"]) == ["c2", "c3"]
    # c2's rep (c1) was forgotten -> relabeled to min surviving member (c2)
    assert list(conv["rep_id"]) == ["c2", "c3"]
    man = json.load(open(os.path.join(root, "conversations",
                                      "_MANIFEST.json")))
    assert man["row_count"] == 2

    clus = pq.read_table(os.path.join(root, "clusters", "data")).to_pandas()
    clus = clus.sort_values("conv_id")
    assert list(clus["conv_id"]) == ["c2", "c3"]
    assert list(clus["cluster_id"]) == ["c2", "c3"]
    assert len(os.listdir(os.path.join(root, "clusters", "versions"))) == 1
    shutil.rmtree(root, ignore_errors=True)


def test_forget_guards_persisted_artifacts(ray_session):
    """Round-3 verdict item #8: persisted artifacts (term-index postings,
    IVF cell dirs, layout readers) written BEFORE a forget() still hold the
    rows on disk; tombstone-aware readers must never serve them."""
    import pyarrow.parquet as pq

    from near_duplicate_detection_ray.pipelines.ann import (
        ann_ivf_index_topk,
        build_ivf_index,
    )
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        keyword_search_indexed,
    )
    from near_duplicate_detection_ray.sources.io import (
        read_hive_pruned,
        write_hive_partitions,
    )
    from near_duplicate_detection_ray.stages.tombstone import forget

    sf = "/root/testdata/sf0.001"
    root = "/tmp/ndd_tombstone_artifacts"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    # pick a doc the default search actually returns
    base = keyword_search_indexed(
        sf, index_dir=f"{root}/term_index"
    )
    if hasattr(base, "to_pandas"):
        base = base.to_pandas()
    assert len(base) > 0
    victim_doc = int(base["doc_id"].iloc[0])

    # IVF over embeddings: vec_id 0 will appear among its own neighbors' cells
    build_ivf_index(sf, f"{root}/ivf")
    ivf_base = ann_ivf_index_topk(f"{root}/ivf", sf).to_pandas()
    victim_vec = int(ivf_base["neighbor_id"].iloc[0])

    # hive layout over a small table keyed by doc_id
    tbl = pa.table({
        "doc_id": pa.array([victim_doc, victim_doc + 1, victim_doc + 2],
                           pa.int64()),
        "grp": pa.array(["a", "a", "b"], pa.string()),
    })
    pq.write_table(tbl, f"{root}/flat.parquet")
    write_hive_partitions(
        rd.read_parquet(f"{root}/flat.parquet"), "grp", f"{root}/hive"
    )

    # forget the victims (string ids; int columns are matched by parsing)
    forget(root, [f"{victim_doc:012d}", str(victim_vec)])

    after = keyword_search_indexed(
        sf, index_dir=f"{root}/term_index", tombstone_root=root
    )
    if hasattr(after, "to_pandas"):
        after = after.to_pandas()
    assert victim_doc not in set(after["doc_id"]), "forgotten doc served"

    ivf_after = ann_ivf_index_topk(
        f"{root}/ivf", sf, tombstone_root=root
    ).to_pandas()
    assert victim_vec not in set(ivf_after["neighbor_id"])

    hive_ds, _, _ = read_hive_pruned(
        f"{root}/hive", ["a"], tombstone_root=root,
        tombstone_column="doc_id",
    )
    got = hive_ds.to_pandas()
    assert victim_doc not in set(got["doc_id"])
    assert victim_doc + 1 in set(got["doc_id"])
    shutil.rmtree(root, ignore_errors=True)
