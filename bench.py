"""Benchmark harness (driver contract).

Default mode: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and print ONE JSON line:

    {"metric": ..., "value": <headline seconds>, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": ..., "num_cpus": N,
     "turns": T, "turns_per_sec": R}

``--scaling``: run the headline job twice in FRESH processes at 8 and 32 CPUs
on the same input and report both throughputs + scaling efficiency
(sandbox proxy for the N->4N cluster-size criterion; see BASELINE.md).

Env knobs: GRAFT_SF_DIR, RAY_GRAFT_CPUS, GRAFT_BENCH_REPS (transcript
replication factor, default 180 => ~2.5M turns at sf0.1 so compute dominates
the fixed per-execution overhead), GRAFT_BENCH_STATS=1 (dump ds.stats() to
stderr).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("GRAFT_BENCH_REPS", "180"))


def run_headline() -> dict:
    """Flagship near-dup pipeline over bench-scale transcripts."""
    import ray

    from near_duplicate_detection_ray.pipelines.dedup import near_dup_pipeline
    from near_duplicate_detection_ray.sources.transcripts import bench_transcripts

    # warm the page cache so we measure compute + shuffle, not first disk read
    import pyarrow.parquet as pq

    pq.read_table(f"{SF_DIR}/documents.parquet")

    # input synthesis is not part of the measured pipeline: materialize the
    # transcripts once (otherwise the lazy expansion re-executes inside the
    # timed run)
    transcripts = bench_transcripts(SF_DIR, reps=REPS).materialize()
    n_turns = transcripts.count()

    t0 = time.time()
    result = near_dup_pipeline(transcripts, include_substring=True)
    n_clusters = result["clusters"].count()
    n_pairs = result["dup_pairs"].count()
    secs = time.time() - t0
    if os.environ.get("GRAFT_BENCH_STATS"):
        print(result["clusters"].stats(), file=sys.stderr)
    return {
        "secs": secs,
        "turns": n_turns,
        "turns_per_sec": n_turns / secs,
        "clusters": n_clusters,
        "dup_pairs": n_pairs,
    }


def run_queries() -> dict[str, float]:
    """Time a representative subset of the driver-contract queries."""
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    picks = [
        "pricing_summary",
        "near_dup_pairs_docs",
        "exact_dedup_docs",
        "events_hourly",
        "ann_cosine_topk",
        "grouped_topk_events",
        "ngram_jaccard_pairs",
        "ngram_containment_pairs",
        "near_dup_pairs_bbit",
        "qa_pair_dups",
        "dup_turn_windows",
        "turn_window_near_dups",
        "conv_prefix_dups",
        "shuffled_dup_convs",
        "assistant_near_dup_convs",
        "ann_ivf_topk",
        "events_trailing_1h",
        "curate_docs",
        "decontaminate_docs",
        "edit_distance_pairs",
        "dup_spans_docs",
        "dedup_best_docs",
        "decontaminate_docs_fuzzy",
        "token_pmi_pairs",
        "pack_sequences_docs",
        "unigram_logprob_docs",
        "cross_source_dup_pairs",
        "winnow_overlap_pairs",
        "incremental_clusters",
        "ann_nsw_topk",
    ]
    out: dict[str, float] = {}
    for name in picks:
        t0 = time.time()
        res = qs[name](SF_DIR)
        # consume
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    cal_start = _calibrate()
    headline = run_headline()
    queries = run_queries()
    cal_end = _calibrate()
    print(
        json.dumps(
            {
                "metric": "near-dup pipeline wall time (read->assemble->sign->LSH->verify->substring->cluster)",
                "value": round(headline["secs"], 3),
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "turns": headline["turns"],
                "turns_per_sec": round(headline["turns_per_sec"], 1),
                "clusters": headline["clusters"],
                "dup_pairs": headline["dup_pairs"],
                "bench_reps": REPS,
                # single-core probe before/after (quiet host ~540k iters/s);
                # a depressed probe marks this run as CPU-steal-contaminated
                # (shared box, ±40% observed) — see BASELINE.md noise notes
                "calib_iters_per_sec": [round(cal_start), round(cal_end)],
            }
        )
    )
    ray.shutdown()


def _calibrate(secs: float = 2.0) -> float:
    """Single-thread numpy burn, iters/s — a host-steal detector.  This box is
    shared; CPU steal moves phase timings by up to ~40%.  Comparing the probe
    before each phase against the documented quiet-host value (~540k iters/s)
    tells whether a scaling number is trustworthy."""
    import numpy as np

    x = np.random.default_rng(0).random(4096)
    t0, n = time.perf_counter(), 0
    while time.perf_counter() - t0 < secs:
        (x * 1.0001).sum()
        n += 1
    return n / (time.perf_counter() - t0)


def scaling() -> None:
    """Fresh-process runs at 8 and 32 CPUs; report throughputs + efficiency,
    plus a per-phase single-core calibration probe (host-steal evidence)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # N and 4N CPUs (driver instruction allows any N, 4N pair).  On this
    # single box every CPU count shares ONE memory system, so high counts
    # understate a real cluster (where bandwidth scales with nodes) — see
    # BASELINE.md's bandwidth analysis.
    lo = int(os.environ.get("NDD_SCALE_LO", "8"))
    hi = int(os.environ.get("NDD_SCALE_HI", str(4 * lo)))
    cal_lo = _calibrate()
    r_lo = run(lo)
    cal_hi = _calibrate()
    r_hi = run(hi)
    cal_end = _calibrate()
    tps_lo = r_lo["turns_per_sec"]
    tps_hi = r_hi["turns_per_sec"]
    eff = (tps_hi / tps_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": f"N->4N scaling ({lo} vs {hi} CPUs, fresh processes, same input)",
                "sec_8": r_lo["value"],
                "sec_32": r_hi["value"],
                "turns_per_sec_8": tps_lo,
                "turns_per_sec_32": tps_hi,
                "scaling_efficiency": round(eff, 3),
                "sf": SF_DIR,
                "turns": r_hi["turns"],
                "bench_reps": REPS,
                # single-core probe before each phase (quiet host ~540k
                # iters/s); a depressed probe marks that phase's timing as
                # steal-contaminated — see BASELINE.md noise notes
                "calib_iters_per_sec": [
                    round(cal_lo), round(cal_hi), round(cal_end)
                ],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
