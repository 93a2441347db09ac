#!/bin/bash
# Two-node digest-equality evidence for the top-cost query slice (round-4
# verdict item #10): start a 2-node Ray cluster on this box (8+8 CPUs), run
# BENCH/two_node_queries.py via the cluster address, then the same slice on
# a single 16-CPU node, and compare per-query digests.
set -e
ray stop -f >/dev/null 2>&1 || true; sleep 2
ray start --head --num-cpus=8 --port=6399 --object-store-memory=3000000000 \
    --include-dashboard=false --disable-usage-stats >/dev/null
ray start --address=127.0.0.1:6399 --num-cpus=8 \
    --object-store-memory=3000000000 --disable-usage-stats >/dev/null
sleep 3
cd /tmp
RAY_ADDRESS= python /root/repo/BENCH/two_node_queries.py 127.0.0.1:6399 2>/dev/null | tail -1
ray stop -f >/dev/null 2>&1
RAY_ADDRESS= TWO_NODE_CPUS=16 PYTHONPATH=/root/repo \
    python /root/repo/BENCH/two_node_queries.py local 2>/dev/null | tail -1
