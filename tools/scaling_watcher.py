"""Probe-gated scaling capture: wait for a quiet window on this shared box,
then run ``bench.py --scaling`` once and append the JSON line to
``BENCH/scaling_runs.jsonl``.

The single-core probe (quiet host ~540k iters/s) gates the run: a scaling
ratio measured under CPU steal is noise (BASELINE.md, "noise" section), so
the watcher sleeps until the probe clears ``--min-probe`` (default 460k),
captures once, and exits.  Usage:

    python tools/scaling_watcher.py [--min-probe 460000] [--max-minutes 240]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(secs: float = 2.0) -> float:
    import numpy as np

    x = np.random.default_rng(0).random(4096)
    t0, n = time.perf_counter(), 0
    while time.perf_counter() - t0 < secs:
        (x * 1.0001).sum()
        n += 1
    return n / (time.perf_counter() - t0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-probe", type=float, default=460_000)
    ap.add_argument("--max-minutes", type=float, default=240)
    ap.add_argument("--interval", type=float, default=120)
    args = ap.parse_args()

    deadline = time.time() + args.max_minutes * 60
    while time.time() < deadline:
        p = probe()
        print(f"probe {int(p)} iters/s (gate {int(args.min_probe)})", flush=True)
        if p >= args.min_probe:
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
                capture_output=True, text=True, cwd=REPO,
            )
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
            if out.returncode == 0 and line.startswith("{"):
                rec = json.loads(line)
                rec["captured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
                rec["gate_probe"] = int(p)
                path = os.path.join(REPO, "BENCH", "scaling_runs.jsonl")
                with open(path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(json.dumps(rec), flush=True)
                return 0
            print(f"scaling run failed rc={out.returncode}: "
                  f"{out.stderr[-500:]}", flush=True)
        time.sleep(args.interval)
    print("no quiet window before deadline", flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
