#!/bin/bash
# Sweep round B: alpha < 1 arms. Round A measured alpha=1.2 COLLAPSING the
# ceiling (0.621 @ ef=4096 vs 0.883 at alpha=1.0) — under the detour-prune
# composition a bigger alpha prunes FEWER in-clique edges, so the
# navigability lever is alpha < 1 (the re-cap then admits longer-range
# survivors), plus the degree-24 budget arm.
set -u
cd /root/repo
CPUS="${SPARK_GRAFT_CPUS:-10}"
run_arm() {
  local name="$1" rounds="$2" alpha="$3" degree="$4" inter="$5"
  echo "=== arm $name: rounds=$rounds alpha=$alpha degree=$degree inter=$inter ==="
  SPARK_GRAFT_CPUS=$CPUS SPARK_DRIVER_MEM=24g \
  GRAFT_DESCENT_ROUNDS=$rounds GRAFT_ALPHA=$alpha \
  GRAFT_DEGREE=$degree GRAFT_INTER_DEGREE=$inter \
    scripts/run_main.sh graft.Protocol 200000 100 128 100 0.7 graph \
    2>&1 | grep -E "PROTOCOL|graph build|serve load|ground truth|protocol:"
}
run_arm r1_a085_d16  1 0.85 16 32
run_arm r1_a09_d24   1 0.9  24 48
echo "=== sweep B done ==="
