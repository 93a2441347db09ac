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
    # simulate a crash after the signatures stage: later manifests gone
    os.remove(f"{ROOT}/verified_pairs/_MANIFEST.json")
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
