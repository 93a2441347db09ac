"""Two-node local-sim evidence driver: run the flagship pipeline against a
given Ray address and dump output digests + wall time as one JSON line."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import ray

address = sys.argv[1] if len(sys.argv) > 1 else "local"
sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
reps = int(os.environ.get("GRAFT_BENCH_REPS", "40"))
cpus = os.environ.get("TWO_NODE_CPUS")

kw = {"include_dashboard": False, "logging_level": "ERROR"}
if address == "local" and cpus:
    kw["num_cpus"] = int(cpus)
if address != "local":
    # workers on other nodes need the package importable; on a real cluster
    # this is working_dir/py_modules — here both nodes share the local disk
    kw["runtime_env"] = {"env_vars": {"PYTHONPATH": "/root/repo"}}
ray.init(address=address, **kw)
nodes = [n for n in ray.nodes() if n["Alive"]]
total_cpus = sum(n["Resources"].get("CPU", 0) for n in nodes)

import ray.data as rd
rd.DataContext.get_current().enable_progress_bars = False

from near_duplicate_detection_ray.pipelines.dedup import near_dup_pipeline
from near_duplicate_detection_ray.sources.transcripts import bench_transcripts

transcripts = bench_transcripts(sf, reps=reps).materialize()
n_turns = transcripts.count()
t0 = time.time()
result = near_dup_pipeline(transcripts, include_substring=True)
cl = result["clusters"].to_pandas().sort_values("conv_id").reset_index(drop=True)
dp = result["dup_pairs"].to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
secs = time.time() - t0
import hashlib
cl_digest = hashlib.md5(
    "\n".join(f"{a}\t{b}" for a, b in zip(cl["conv_id"], cl["cluster_id"])).encode()
).hexdigest()
dp_digest = hashlib.md5(
    "\n".join(f"{a}\t{b}" for a, b in zip(dp["a"], dp["b"])).encode()
).hexdigest()
print(json.dumps({
    "address": address, "n_nodes": len(nodes), "total_cpus": total_cpus,
    "turns": n_turns, "secs": round(secs, 2),
    "clusters": len(cl), "dup_pairs": len(dp),
    "clusters_digest": cl_digest, "dup_pairs_digest": dp_digest,
}))
ray.shutdown()
