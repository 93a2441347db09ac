"""Two-node evidence for the join/semi-join/ANN machinery beyond the
flagship (round-4 verdict item #10): run a slice of the top-cost bench
queries through ``queries()`` against a given Ray address and dump
per-query row counts + order-insensitive value digests as one JSON line.
Digest-equal across 1-node and 2-node runs == the exchange machinery is
layout-independent.

Usage: python BENCH/two_node_queries.py <address|local> [query ...]
Env:   GRAFT_SF_DIR (default /root/testdata/sf0.01), TWO_NODE_CPUS
"""
import hashlib
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import ray

address = sys.argv[1] if len(sys.argv) > 1 else "local"
names = sys.argv[2:] or [
    "ngram_jaccard_pairs",        # PPJoin prefix filtering + verify attach
    "turn_window_near_dups",      # windowed shingle join
    "assistant_near_dup_convs",   # role-filtered sign -> LSH -> verify
    "winnow_overlap_pairs",       # fingerprint-overlap similarity join
    "incremental_clusters",       # checkpointed base + delta PPJoin + CC
    "ann_nsw_topk",               # sharded NSW + global threshold refine
]
sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
cpus = os.environ.get("TWO_NODE_CPUS")

kw = {"include_dashboard": False, "logging_level": "ERROR"}
if address == "local" and cpus:
    kw["num_cpus"] = int(cpus)
if address != "local":
    kw["runtime_env"] = {"env_vars": {"PYTHONPATH": "/root/repo"}}
ray.init(address=address, **kw)
nodes = [n for n in ray.nodes() if n["Alive"]]
total_cpus = sum(n["Resources"].get("CPU", 0) for n in nodes)

import ray.data as rd

rd.DataContext.get_current().enable_progress_bars = False

_spec = importlib.util.spec_from_file_location(
    "check_queries", "/root/repo/tools/check_queries.py"
)
_cq = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_cq)

_espec = importlib.util.spec_from_file_location(
    "__ray_entry__", "/root/repo/__ray_entry__.py"
)
entry = importlib.util.module_from_spec(_espec)
_espec.loader.exec_module(entry)
qs = entry.queries()

out = {}
t_all = time.time()
for name in names:
    t0 = time.time()
    df = _cq.normalize_df(_cq.to_pandas(qs[name](sf)))
    out[name] = {
        "rows": len(df),
        "digest": _cq.value_hash(df),
        "secs": round(time.time() - t0, 2),
    }
print(json.dumps({
    "address": address, "n_nodes": len(nodes), "total_cpus": total_cpus,
    "sf": sf, "secs_total": round(time.time() - t_all, 2), "queries": out,
}))
ray.shutdown()
