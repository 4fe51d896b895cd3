#!/bin/bash
# Round-2 TPU validation battery — run when the axon backend is up.
# Each step appends to bench_results/r2_tpu_log.txt; individual steps are
# independently resumable (comment out what's done).
set -x
cd "$(dirname "$0")/.."
LOG=bench_results/r2_tpu_log.txt
mkdir -p bench_results
echo "=== r2 validation $(date -Is)" >> "$LOG"

run() {  # run <tag> <timeout_s> <cmd...>
  local tag="$1" to="$2"; shift 2
  echo "--- $tag: $*" | tee -a "$LOG"
  timeout "$to" "$@" 2>>"$LOG" | tee -a "$LOG"
  echo "--- $tag rc=$?" | tee -a "$LOG"
}

# 1. Headline bench (multigrid stream) + quality gate — validates the two
#    r1 kernels that never ran on hardware (253bd9f, 8bee448).
run headline 4000 python bench.py

# 2. DDP throughput number (VERDICT #5).
run ddp 4000 env IPOC_BENCH_IMPL=ddp IPOC_BENCH_MODE=stream \
    IPOC_BENCH_POOL=16384 python bench.py

# 3. Single-grid stream for comparison (quality gate baseline sanity).
run stream 4000 env IPOC_BENCH_MODE=stream python bench.py

# 4. Reference (dt,H) sweep, all 8 points x 3 solvers, f32 on the chip,
#    saving controls for the f64 agreement gate.
run sweep_pendulum 6000 python examples/runtime_benchmark.py \
    --model pendulum --reps 10 --save-controls
run sweep_cartpole 6000 python examples/runtime_benchmark.py \
    --model cartpole --reps 10 --save-controls

# 5. Paired CPU-f64 agreement (CPU; fast).
run agree_pendulum 3000 python examples/sweep_agreement.py --model pendulum
run agree_cartpole 3000 python examples/sweep_agreement.py --model cartpole

# 6. Characterize the single-launch parallel trial kernel (VERDICT #8):
#    compile time + headline with it on.
run fused_newton 4000 env IPOC_FUSED_NEWTON=1 IPOC_BENCH_MODE=batch \
    IPOC_BENCH_BATCH=1024 python bench.py

echo "=== r2 validation done $(date -Is)" >> "$LOG"

# 7. Slow test tier (r4: no CI — exercise the demoted heavy tests here).
run slow_tier 4000 sh scripts/run_slow_tier.sh
