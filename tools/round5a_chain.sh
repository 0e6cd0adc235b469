#!/bin/bash
# Round-5a TPU batch at the overlap+native-pack commit:
#   1. smoke already green at this tree (exp_smoke_r5a.log)
#   2. step-only headlines at 96³/128³ (re-anchor at ONE commit)
#   3. the deferred round-4c augment A/B (default vs shear-warp MXU path)
#   4. the steady-state loop: overlapped vs --no-overlap A/B
#   5. inference baseline for this round's ≤8.2 s/vol work
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p artifacts

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" >"artifacts/exp_${name}.log" 2>&1
  local rc=$?
  tail -3 "artifacts/exp_${name}.log"
  echo "--- $name rc=$rc"
  return $rc
}

run probe 240 python tools/tpu_probe.py || { echo "TPU DOWN — aborting"; exit 1; }
run bench96_r5a 3600 python bench.py
run bench128_r5a 3600 env RSUPER_BENCH_SIZE=128 python bench.py
run augment_r5a 3600 python tools/bench_augment.py
run augment_shear_r5a 5400 env RSUPER_AUG_SHEAR=1 python tools/bench_augment.py
run loop_r5a 5400 python tools/bench_loop.py
run loop_inline_r5a 5400 python tools/bench_loop.py --no-overlap
run infer_r5a 3600 python bench_infer.py
echo "CHAIN-5A DONE $(date +%H:%M:%S)"
