#!/bin/bash
# Sweep round C: the degree-budget frontier (A/B measured: alpha moves the
# ceiling DOWN in both directions at this corpus; degree 16->24 moved it
# 0.883 -> 0.923 at ef=4096). Degree 32 maps where the 0.95 target lands.
set -u
cd /root/repo
CPUS="${SPARK_GRAFT_CPUS:-10}"
echo "=== arm r1_a10_d32: rounds=1 alpha=1.0 degree=32 inter=64 ==="
SPARK_GRAFT_CPUS=$CPUS SPARK_DRIVER_MEM=24g \
GRAFT_DESCENT_ROUNDS=1 GRAFT_ALPHA=1.0 GRAFT_DEGREE=32 GRAFT_INTER_DEGREE=64 \
  scripts/run_main.sh graft.Protocol 200000 100 128 100 0.7 graph \
  2>&1 | grep -E "PROTOCOL|graph build|serve load|ground truth|protocol:"
echo "=== sweep C done ==="
