#!/bin/bash
# One-command TPU perf-measurement window (VERDICT r3 next #3, #6, #8).
# Run ONLY when nothing else is on the chip (one TPU client at a time).
# Results land in artifacts/perf_r4/*.jsonl for BASELINE.md.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/perf_r4
mkdir -p "$OUT"
VEL=Mjlab-Velocity-Flat-Unitree-G1
TRK=Mjlab-Tracking-Flat-Unitree-G1

run() { # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" 2>&1 | tee "$OUT/$name.jsonl"
}

# 1. env.step inversion question: velocity vs tracking at 4096
run steps python tools/perf_harness.py steps "$VEL" "$TRK"
# 2. solver path comparison + phase breakdown
run solver python tools/perf_harness.py solver "$VEL"
run phases python tools/perf_harness.py phases "$VEL"
# 3. per-Newton-iteration marginal cost + convergence headroom
run itersweep python tools/perf_harness.py itersweep "$VEL"
run converge python tools/perf_harness.py converge "$VEL"
# 4. smooth-kernel A/B: the fused kernel is the DEFAULT since round 4,
# so the baseline leg must opt OUT via MJLAB_SMOOTH_KERNEL=0; env vars
# are scoped with `env` so they don't leak into later runs
run bench_default python bench.py
run bench_nokernel env MJLAB_SMOOTH_KERNEL=0 python bench.py
# 5. batch-scaling curve on the honest workload (VERDICT #8; 4096 is
# covered by the steps run above)
for n in 1024 8192 16384; do
  run "scale_$n" env MJLAB_BENCH_ENVS=$n python tools/perf_harness.py steps "$VEL"
done
echo "=== perf window complete; outputs in $OUT ==="
