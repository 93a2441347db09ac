"""Checkpoint / lineage / resume tests (SURVEY §5.4, north_rule resumability):
rerun loads every stage; deleting a later manifest recomputes only from that
point; config change invalidates everything; outputs identical either way."""

import json
import os
import shutil

import pytest

from near_duplicate_detection_ray.config import NDDConfig
from near_duplicate_detection_ray.sources.transcripts import synth_corpus

CFG = NDDConfig()
ROOT = "/tmp/ndd_ckpt_test"


def _clusters_df(result):
    return (
        result["clusters"].to_pandas().sort_values("conv_id").reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def first_run(ray_session):
    import ray.data as rd

    from near_duplicate_detection_ray.stages.checkpoint import (
        checkpointed_near_dup_pipeline,
    )

    shutil.rmtree(ROOT, ignore_errors=True)
    transcripts, _ = synth_corpus(seed=42)
    ds = rd.from_arrow(transcripts)
    result = checkpointed_near_dup_pipeline(ds, ROOT, CFG, input_token="synth42")
    return ds, _clusters_df(result), result["checkpointer"]


def test_first_run_computes_all(first_run):
    _, clusters, ckpt = first_run
    assert ckpt.stages_skipped == []
    assert set(ckpt.stages_computed) == {
        "conversations", "signatures", "verified_pairs", "substring_pairs", "clusters",
    }
    assert len(clusters) == 142
    # manifests exist with per-partition lineage
    m = json.load(open(f"{ROOT}/signatures/_MANIFEST.json"))
    assert m["row_count"] > 0
    assert all(p["rows"] >= 0 for p in m["partitions"])
    assert m["upstream"]["conversations"]
    assert "wall_seconds" in m["metrics"]


def test_rerun_skips_everything(first_run):
    import ray.data as rd

    from near_duplicate_detection_ray.stages.checkpoint import (
        checkpointed_near_dup_pipeline,
    )

    ds, clusters1, _ = first_run
    result2 = checkpointed_near_dup_pipeline(ds, ROOT, CFG, input_token="synth42")
    ckpt2 = result2["checkpointer"]
    assert ckpt2.stages_computed == []
    assert set(ckpt2.stages_skipped) == {
        "conversations", "signatures", "verified_pairs", "substring_pairs", "clusters",
    }
    assert _clusters_df(result2).equals(clusters1)


def test_partial_resume_recomputes_suffix(first_run):
    from near_duplicate_detection_ray.stages.checkpoint import (
        checkpointed_near_dup_pipeline,
    )

    ds, clusters1, _ = first_run
    # simulate a crash after the signatures stage: later stages' version
    # manifests gone (the per-version manifest is written LAST, so a real
    # crash leaves exactly this state)
    shutil.rmtree(f"{ROOT}/verified_pairs", ignore_errors=True)
    shutil.rmtree(f"{ROOT}/clusters", ignore_errors=True)
    result3 = checkpointed_near_dup_pipeline(ds, ROOT, CFG, input_token="synth42")
    ckpt3 = result3["checkpointer"]
    assert set(ckpt3.stages_skipped) == {"conversations", "signatures", "substring_pairs"}
    assert set(ckpt3.stages_computed) == {"verified_pairs", "clusters"}
    assert _clusters_df(result3).equals(clusters1)


def test_config_change_invalidates(first_run):
    from near_duplicate_detection_ray.stages.checkpoint import (
        checkpointed_near_dup_pipeline,
    )

    ds, _, _ = first_run
    other_cfg = NDDConfig(tau=0.7)
    result4 = checkpointed_near_dup_pipeline(ds, ROOT, other_cfg, input_token="synth42")
    assert result4["checkpointer"].stages_skipped == []


def test_input_change_invalidates(first_run):
    from near_duplicate_detection_ray.stages.checkpoint import (
        checkpointed_near_dup_pipeline,
    )

    ds, _, _ = first_run
    result5 = checkpointed_near_dup_pipeline(ds, ROOT, CFG, input_token="other-input")
    assert result5["checkpointer"].stages_skipped == []


def test_time_travel_versions(first_run):
    """Config flip-flop: both versions stay readable; flipping BACK is an
    instant skip (no recompute); read_stage_version serves the old snapshot
    while `data` points at the new one."""
    from near_duplicate_detection_ray.stages.checkpoint import (
        checkpointed_near_dup_pipeline,
    )

    ds, clusters1, ckpt1 = first_run
    h1 = ckpt1.stage_hashes["clusters"][:12]

    other_cfg = NDDConfig(tau=0.7)
    r2 = checkpointed_near_dup_pipeline(ds, ROOT, other_cfg, input_token="synth42")
    ckpt2 = r2["checkpointer"]
    h2 = ckpt2.stage_hashes["clusters"][:12]
    assert h1 != h2

    versions = ckpt2.list_versions("clusters")
    assert {v["version"] for v in versions} >= {h1, h2}

    # time travel: the tau=0.8 snapshot is still served byte-identically
    old = ckpt2.read_stage_version("clusters", h1).to_pandas()
    old = old.sort_values("conv_id").reset_index(drop=True)
    assert old.equals(clusters1)

    # flip back: every stage skips (versioned hit), outputs identical
    r3 = checkpointed_near_dup_pipeline(ds, ROOT, CFG, input_token="synth42")
    assert r3["checkpointer"].stages_computed == []
    assert _clusters_df(r3).equals(clusters1)
    # the `data` symlink follows the current run
    link = os.path.join(ROOT, "clusters", "data")
    assert os.path.islink(link) and h1 in os.readlink(link)


def test_version_pruning(first_run):
    """keep_versions bounds retained snapshots; the current one survives."""
    import ray.data as rd

    from near_duplicate_detection_ray.stages.checkpoint import StageCheckpointer

    root = "/tmp/ndd_ckpt_prune_test"
    shutil.rmtree(root, ignore_errors=True)
    for tok in ["a", "b", "c", "d"]:
        ck = StageCheckpointer(root, CFG, input_token=tok, keep_versions=2)
        ck.run_stage("s", [], lambda: rd.range(3))
    ck = StageCheckpointer(root, CFG, input_token="d", keep_versions=2)
    ck.run_stage("s", [], lambda: rd.range(3))  # skip; prunes nothing new
    vs = ck.list_versions("s")
    assert len(vs) == 2
    cur_hash = ck.stage_hashes["s"][:12]
    assert any(v["version"] == cur_hash for v in vs)


def test_versions_cli(first_run):
    """`versions` subcommand prints the snapshot catalog as JSON."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "near_duplicate_detection_ray", "versions",
         "--checkpoints", ROOT, "--stage", "clusters"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    cat = json.loads(out.stdout)
    assert cat["clusters"] and all("version" in v for v in cat["clusters"])


def test_diff_stage_versions(first_run):
    """Snapshot diff between the tau=0.8 and tau=0.7 cluster versions equals
    the pandas-computed expectation."""
    import pandas as pd

    from near_duplicate_detection_ray.stages.checkpoint import (
        checkpointed_near_dup_pipeline,
        diff_stage_versions,
    )

    ds, clusters1, ckpt1 = first_run
    h1 = ckpt1.stage_hashes["clusters"][:12]
    r2 = checkpointed_near_dup_pipeline(
        ds, ROOT, NDDConfig(tau=0.7), input_token="synth42"
    )
    h2 = r2["checkpointer"].stage_hashes["clusters"][:12]
    c2 = r2["clusters"].to_pandas()

    got = (
        diff_stage_versions(ROOT, "clusters", h1, h2, "conv_id", "cluster_id")
        .to_pandas().sort_values("key").reset_index(drop=True)
    )

    a = dict(zip(clusters1["conv_id"], clusters1["cluster_id"]))
    b = dict(zip(c2["conv_id"], c2["cluster_id"]))
    want = []
    for k in sorted(set(a) | set(b)):
        if k not in b:
            want.append((k, "removed"))
        elif k not in a:
            want.append((k, "added"))
        elif a[k] != b[k]:
            want.append((k, "changed"))
        else:
            want.append((k, "unchanged"))
    want_df = pd.DataFrame(want, columns=["key", "change_type"])
    pd.testing.assert_frame_equal(got, want_df)
    # same corpus both runs: every conv present on both sides
    assert set(got["change_type"]) <= {"changed", "unchanged"}


def test_diff_detects_null_transitions(ray_session):
    """A key whose value flips between NULL and non-NULL must classify as
    'changed' (Arrow count_distinct ignores nulls; the kernel sentinels
    them)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from near_duplicate_detection_ray.stages.checkpoint import (
        StageCheckpointer,
        diff_stage_versions,
    )

    root = "/tmp/ndd_ckpt_nulldiff_test"
    shutil.rmtree(root, ignore_errors=True)
    import ray.data as rd

    t_a = pa.table({"k": ["k1", "k2"], "v": pa.array([None, "x"], pa.string())})
    t_b = pa.table({"k": ["k1", "k2"], "v": pa.array(["x", None], pa.string())})
    ck_a = StageCheckpointer(root, NDDConfig(), input_token="a")
    ck_a.run_stage("s", [], lambda: rd.from_arrow(t_a))
    ha = ck_a.stage_hashes["s"][:12]
    ck_b = StageCheckpointer(root, NDDConfig(), input_token="b")
    ck_b.run_stage("s", [], lambda: rd.from_arrow(t_b))
    hb = ck_b.stage_hashes["s"][:12]

    got = diff_stage_versions(root, "s", ha, hb, "k", "v").to_pandas()
    assert dict(zip(got["key"], got["change_type"])) == {
        "k1": "changed", "k2": "changed",
    }


def test_diff_null_vs_sentinel_literal_is_changed(ray_session):
    """Regression (round-3 ADVICE): a literal "\\x00null" STRING value used to
    collide with the old null sentinel, misreading NULL <-> "\\x00null" as
    'unchanged'.  The explicit is-null flag must classify it as changed."""
    import pyarrow as pa

    import ray.data as rd

    from near_duplicate_detection_ray.stages.checkpoint import (
        StageCheckpointer,
        diff_stage_versions,
    )

    root = "/tmp/ndd_ckpt_sentinel_test"
    shutil.rmtree(root, ignore_errors=True)
    t_a = pa.table({"k": ["k1", "k2"], "v": pa.array([None, None], pa.string())})
    t_b = pa.table({"k": ["k1", "k2"],
                    "v": pa.array(["\x00null", None], pa.string())})
    ck_a = StageCheckpointer(root, NDDConfig(), input_token="a")
    ck_a.run_stage("s", [], lambda: rd.from_arrow(t_a))
    ha = ck_a.stage_hashes["s"][:12]
    ck_b = StageCheckpointer(root, NDDConfig(), input_token="b")
    ck_b.run_stage("s", [], lambda: rd.from_arrow(t_b))
    hb = ck_b.stage_hashes["s"][:12]

    got = diff_stage_versions(root, "s", ha, hb, "k", "v").to_pandas()
    assert dict(zip(got["key"], got["change_type"])) == {
        "k1": "changed", "k2": "unchanged",
    }


def test_pinned_version_survives_pruning(ray_session):
    """Regression (round-3 ADVICE): a version handed out as a lazy dataset by
    read_stage_version must not be rmtree'd by a later run_stage's pruning
    before the handle is consumed."""
    import pyarrow as pa

    import ray.data as rd

    root = "/tmp/ndd_ckpt_pin_test"
    shutil.rmtree(root, ignore_errors=True)
    from near_duplicate_detection_ray.stages.checkpoint import (
        StageCheckpointer,
        clear_version_pins,
    )

    clear_version_pins(root)
    ck = StageCheckpointer(root, NDDConfig(), input_token="v0", keep_versions=1)
    ck.run_stage("s", [], lambda: rd.from_arrow(pa.table({"k": [0], "v": [0]})))
    h0 = ck.stage_hashes["s"][:12]

    # hand out a LAZY handle to v0, then produce two newer versions through
    # FRESH checkpointer instances (keep_versions=1 would normally prune v0;
    # the process-level pin registry must protect it across instances)
    handle = ck.read_stage_version("s", h0)
    for tok in ("v1", "v2"):
        ck2 = StageCheckpointer(root, NDDConfig(), input_token=tok,
                                keep_versions=1)
        ck2.run_stage(
            "s", [], lambda: rd.from_arrow(pa.table({"k": [1], "v": [1]}))
        )

    # the lazy handle must still be readable
    assert handle.to_pandas()["k"].tolist() == [0]


def test_pins_are_stage_scoped(ray_session):
    """Pinning versions of stage A must not shrink stage B's retained-version
    budget (regression: a shared pin set inflated the keep computation)."""
    import pyarrow as pa

    import ray.data as rd

    root = "/tmp/ndd_ckpt_pin_scope_test"
    shutil.rmtree(root, ignore_errors=True)
    from near_duplicate_detection_ray.stages.checkpoint import (
        StageCheckpointer,
        clear_version_pins,
    )

    clear_version_pins(root)
    hashes_a, hashes_b = [], []
    for i, tok in enumerate(("v0", "v1", "v2")):
        ck = StageCheckpointer(root, NDDConfig(), input_token=tok,
                               keep_versions=3)
        ck.run_stage("a", [], lambda i=i: rd.from_arrow(pa.table({"k": [i]})))
        hashes_a.append(ck.stage_hashes["a"][:12])
        if i == 0:
            # pin TWO stage-A versions' worth of handles early
            ck.read_stage_version("a", hashes_a[0])
    for i, tok in enumerate(("v0", "v1", "v2")):
        ck = StageCheckpointer(root, NDDConfig(), input_token=tok,
                               keep_versions=3)
        ck.run_stage("b", [], lambda i=i: rd.from_arrow(pa.table({"k": [i]})))
        hashes_b.append(ck.stage_hashes["b"][:12])
    ck = StageCheckpointer(root, NDDConfig(), keep_versions=3)
    retained_b = {e["version"] for e in ck.list_versions("b")}
    assert set(hashes_b) <= retained_b, (
        f"stage B retained {len(retained_b)} of 3 despite keep_versions=3"
    )


def test_live_run_stage_handle_survives_pruning(ray_session):
    """Regression (round-3 ADVICE): a lazy dataset returned by run_stage
    itself (not just read_stage_version) must survive a LATER run_stage's
    pruning while the handle — or a DERIVED dataset — is still alive, and a
    dropped handle must not inflate retention beyond keep_versions."""
    import pyarrow as pa

    import ray.data as rd

    root = "/tmp/ndd_ckpt_live_handle_test"
    shutil.rmtree(root, ignore_errors=True)
    from near_duplicate_detection_ray.stages.checkpoint import (
        StageCheckpointer,
        clear_version_pins,
    )

    clear_version_pins(root)
    ck = StageCheckpointer(root, NDDConfig(), input_token="v0", keep_versions=1)
    src = ck.run_stage(
        "s", [], lambda: rd.from_arrow(pa.table({"k": [0], "v": [7]}))
    )
    # derive a lazy pipeline and DROP the source wrapper — the liveness pin
    # must follow the plan, not the wrapper object
    derived = src.map_batches(lambda b: b, batch_format="pyarrow")
    del src
    for i, tok in enumerate(("v1", "v2", "v3")):
        ck2 = StageCheckpointer(root, NDDConfig(), input_token=tok,
                                keep_versions=1)
        ck2.run_stage(
            "s", [], lambda i=i: rd.from_arrow(pa.table({"k": [i + 1],
                                                         "v": [i + 1]}))
        )
    assert derived.to_pandas()["v"].tolist() == [7]

    # once every handle is dropped, keep_versions reasserts itself on the
    # next prune (no permanent retention leak from liveness pins)
    del derived
    ck3 = StageCheckpointer(root, NDDConfig(), input_token="v4",
                            keep_versions=1)
    ck3.run_stage("s", [], lambda: rd.from_arrow(pa.table({"k": [9],
                                                           "v": [9]})))
    hold = None  # noqa: F841 — nothing live except ck3's own handle
    ck4 = StageCheckpointer(root, NDDConfig(), input_token="v5",
                            keep_versions=1)
    ck4.run_stage("s", [], lambda: rd.from_arrow(pa.table({"k": [10],
                                                           "v": [10]})))
    retained = {e["version"] for e in ck4.list_versions("s")}
    # v5 (current) always kept; v4's handle died when ck3's return value was
    # discarded, so at most keep_versions + the just-handed-out v5 remain
    assert ck4.stage_hashes["s"][:12] in retained
    assert len(retained) <= 2, retained


def test_gc_versions_explicit(ray_session):
    """gc_versions prunes beyond --keep but never the current pointer's
    version; dry_run reports without deleting; the CLI subcommand wires it."""
    import subprocess
    import sys

    import pyarrow as pa
    import ray.data as rd

    root = "/tmp/ndd_ckpt_gc_test"
    shutil.rmtree(root, ignore_errors=True)
    from near_duplicate_detection_ray.stages.checkpoint import (
        StageCheckpointer,
        clear_version_pins,
        gc_versions,
    )

    clear_version_pins(root)
    hashes = []
    for i, tok in enumerate(("v0", "v1", "v2", "v3")):
        ck = StageCheckpointer(root, NDDConfig(), input_token=tok,
                               keep_versions=99)  # no auto-prune
        ck.run_stage("s", [], lambda i=i: rd.from_arrow(pa.table({"k": [i]})))
        hashes.append(ck.stage_hashes["s"][:12])
    clear_version_pins(root)  # release liveness pins from the loop handles

    preview = gc_versions(root, keep=2, dry_run=True)
    assert set(preview["s"]) == set(hashes[:2])
    assert len(StageCheckpointer(root).list_versions("s")) == 4  # untouched

    out = subprocess.run(
        [sys.executable, "-m", "near_duplicate_detection_ray", "gc",
         "--checkpoints", root, "--keep", "2"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    rep = json.loads(out.stdout)
    assert set(rep["dropped"]["s"]) == set(hashes[:2])
    retained = {e["version"] for e in StageCheckpointer(root).list_versions("s")}
    assert retained == set(hashes[2:])
    assert hashes[3] in retained  # current pointer survives

    # missing root is a clean CLI error, not a traceback
    bad = subprocess.run(
        [sys.executable, "-m", "near_duplicate_detection_ray", "gc",
         "--checkpoints", "/tmp/does_not_exist_ndd"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert bad.returncode == 1 and "not found" in bad.stderr


def test_crash_mid_write_recovers(ray_session):
    """A crash DURING a stage's parquet write leaves data.tmp + no version
    manifest; the rerun must discard the partial tmp, recompute, and produce
    the correct output (manifest-last ordering makes the skip gate safe)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from near_duplicate_detection_ray.stages.checkpoint import (
        StageCheckpointer,
    )

    root = "/tmp/ndd_ckpt_midwrite_test"
    shutil.rmtree(root, ignore_errors=True)
    ck = StageCheckpointer(root, NDDConfig(), input_token="v0")
    stage_hash = ck._lineage_hash("s", [])
    vdir = ck._version_dir("s", stage_hash)
    tmp = os.path.join(vdir, "data.tmp")
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pa.table({"k": [999], "v": [999]}),
                   os.path.join(tmp, "partial_0.parquet"))
    # no manifest.json => the skip gate must NOT fire; the stale tmp must go
    out = ck.run_stage(
        "s", [], lambda: rd.from_arrow(pa.table({"k": [1, 2], "v": [3, 4]}))
    )
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert df["k"].tolist() == [1, 2] and df["v"].tolist() == [3, 4]
    assert not os.path.exists(tmp)
    assert ck.stages_computed == ["s"]
    # and the rerun skips
    ck2 = StageCheckpointer(root, NDDConfig(), input_token="v0")
    ck2.run_stage("s", [], lambda: (_ for _ in ()).throw(AssertionError))
    assert ck2.stages_skipped == ["s"]
