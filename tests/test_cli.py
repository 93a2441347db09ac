"""CLI surface (the `ray job submit` entry point): run -> warm resume skips
every stage via lineage manifests -> query loads the checkpoint.  In-process
(reuses the session Ray) via main(argv), not a subprocess."""

import json
import os

import pyarrow.parquet as pq
import pytest

from near_duplicate_detection_ray.sources.transcripts import synth_corpus


@pytest.fixture(scope="module")
def cli_dirs(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    inp = root / "in"
    os.makedirs(inp)
    t, _ = synth_corpus(seed=9)
    pq.write_table(t, str(inp / "transcripts.parquet"))
    return str(inp), str(root / "ckpt"), str(root / "out")


def test_cli_run_resume_query(cli_dirs, capsys):
    from near_duplicate_detection_ray.__main__ import main

    inp, ckpt, out = cli_dirs
    assert main(["run", "--input", inp, "--checkpoints", ckpt, "--output", out]) == 0
    cold = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cold["stages_skipped"] == []
    assert cold["clusters"] > 0

    assert main(["run", "--input", inp, "--checkpoints", ckpt, "--output", out]) == 0
    warm = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert warm["stages_computed"] == []
    assert set(warm["stages_skipped"]) >= {"conversations", "signatures", "clusters"}
    assert warm["clusters"] == cold["clusters"]
    assert warm["dup_pairs"] == cold["dup_pairs"]

    assert (
        main(
            [
                "query",
                "--signatures", f"{ckpt}/signatures/data",
                "--rep-map", f"{ckpt}/conversations/data",
                "--text", "zzz unseen probe text with no corpus overlap",
                "--k", "3",
            ]
        )
        == 0
    )
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert isinstance(res, list)  # graceful empty result for an unseen probe
