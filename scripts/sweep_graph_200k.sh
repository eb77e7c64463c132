#!/bin/bash
# Graph-family 0.95 protocol push (VERDICT r11 next-round #2): sweep the
# landed diversified-build knobs at nb=200k on the protocol corpus, one arm
# per JVM so a failed arm doesn't repay the others' builds.
# Baseline (r11): rounds=1 alpha=1.0 degree=16 inter=32 ->
#   0.80 @ ef=1411 (qps 55.6); 0.95 UNREACHED (0.883 @ ef=4096).
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
run_arm r2_a10_d16   2 1.0 16 32
run_arm r1_a12_d16   1 1.2 16 32
run_arm r1_a10_d24   1 1.0 24 48
echo "=== sweep done ==="
