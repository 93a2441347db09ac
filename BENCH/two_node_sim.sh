#!/bin/bash
# Two-node local-sim evidence (round-3 verdict item #4): start a 2-node Ray
# cluster on this box (8+8 CPUs), run the flagship via a cluster-address
# driver, and compare output digests + wall against a single-node 16-CPU run.
# ray job submit is unavailable in this container (ray[data] without
# ray[default]); the RAY_ADDRESS driver connection is the equivalent cluster
# entry path and is what the CLI session honors (README "cluster runs").
set -e
ray stop -f >/dev/null 2>&1 || true; sleep 2
ray start --head --num-cpus=8 --port=6399 --object-store-memory=3000000000 \
    --include-dashboard=false --disable-usage-stats >/dev/null
ray start --address=127.0.0.1:6399 --num-cpus=8 \
    --object-store-memory=3000000000 --disable-usage-stats >/dev/null
sleep 3
cd /tmp
RAY_ADDRESS= python /root/repo/BENCH/two_node_flagship.py 127.0.0.1:6399 2>/dev/null | tail -1
RAY_ADDRESS= python /root/repo/BENCH/two_node_flagship.py 127.0.0.1:6399 2>/dev/null | tail -1
ray stop -f >/dev/null 2>&1
RAY_ADDRESS= TWO_NODE_CPUS=16 PYTHONPATH=/root/repo \
    python /root/repo/BENCH/two_node_flagship.py local 2>/dev/null | tail -1
