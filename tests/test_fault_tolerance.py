"""Worker-failure retry: a map task whose WORKER PROCESS dies once
mid-pipeline must be retried by Ray core and leave the flagship output
byte-identical to a clean run — the single-node testable slice of the 100-TB claim that a
lost worker never corrupts results (SURVEY §4 Retry row; the reference's
analogue is rerunning a whole video on crash, ndd/extract_features.py:88)."""

import os

import pyarrow as pa
import ray.data as rd

from near_duplicate_detection_ray.config import NDDConfig
from near_duplicate_detection_ray.sources.transcripts import synth_corpus

MARKER = "/tmp/ndd_fault_injected_once"


def test_flagship_survives_injected_task_failure(ray_session):
    from near_duplicate_detection_ray.pipelines.dedup import near_dup_pipeline

    # defined inside the test so cloudpickle ships it BY VALUE (the test
    # module itself is not importable from Ray worker processes)
    def _crash_once(t: pa.Table, marker=MARKER) -> pa.Table:
        """Passthrough map that raises exactly once per test run (first
        task to find no marker file plants it and dies; every retry and
        every other task passes through)."""
        import os as _os

        if not _os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
            # die like a real lost worker (OOM-kill / node loss): an
            # abrupt process exit is what Ray's task retry handles —
            # user-code exceptions are deliberately NOT retried
            _os._exit(1)
        return t

    transcripts, _ = synth_corpus(seed=42)
    cfg = NDDConfig()

    clean = near_dup_pipeline(rd.from_arrow(transcripts), cfg)
    clean_clusters = (
        clean["clusters"].to_pandas().sort_values("conv_id")
        .reset_index(drop=True)
    )

    if os.path.exists(MARKER):
        os.unlink(MARKER)
    faulty_input = rd.from_arrow(transcripts).map_batches(
        _crash_once, batch_format="pyarrow"
    )
    faulty = near_dup_pipeline(faulty_input, cfg)
    faulty_clusters = (
        faulty["clusters"].to_pandas().sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert os.path.exists(MARKER), "the injected failure never fired"
    assert clean_clusters.equals(faulty_clusters)
    os.unlink(MARKER)
