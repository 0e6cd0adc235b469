#!/bin/bash
# Round-5b TPU batch — the remaining measurements at ONE commit (the shear-
# default tree). Chain 5a (artifacts/chain5a.log) got through smoke, 96³/128³
# headlines and the augment A/B (shear wins 36.6 vs 128.0 ms) before it was
# stopped; this chain re-anchors the cheap numbers at the adoption commit and
# runs everything 5a never reached:
#   - steady-state loop bench, overlapped vs --no-overlap (VERDICT r4 #1)
#   - inference at the fused-accumulator/f16 commit (VERDICT r4 #3)
#   - fresh step profile for the MFU work (VERDICT r4 #4)
#   - phantom study D (VERDICT r4 #6; ~100 min est. from study C's 38 min)
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
  grep -v 'cpu_aot_loader\|machine features' "artifacts/exp_${name}.log" | tail -3
  echo "--- $name rc=$rc"
  return $rc
}

run probe 240 python tools/tpu_probe.py || { echo "TPU DOWN — aborting"; exit 1; }
run smoke_r5b 3600 python bench.py --smoke || { echo "SMOKE RED — aborting"; exit 1; }
run augment_r5b 3600 python tools/bench_augment.py
run bench96_r5b 3600 python bench.py
run bench128_r5b 3600 env RSUPER_BENCH_SIZE=128 python bench.py
run loop_r5b 5400 python tools/bench_loop.py
run loop_inline_r5b 5400 python tools/bench_loop.py --no-overlap
run infer_r5b 5400 python bench_infer.py
run profile96_r5b 3600 python tools/profile_step.py

# --- round-5 small-channel kernel forms (f/g): calibrate on hardware,
# commit the regenerated table, re-gate, re-bench. The table commit happens
# BEFORE smoke/bench so every number corresponds to a commit (r4 weak #3).
run calib_fg 10800 python tools/calibrate_vmem.py
run calib_emit 600 python tools/calibrate_vmem.py --emit
if ! git diff --quiet rsuper_tpu/ops/vmem_table.py; then
  git add rsuper_tpu/ops/vmem_table.py artifacts/vmem_calib2.jsonl
  git commit -m "vmem_table: hardware calibration of the small-channel kernel forms f/g

Measured by tools/calibrate_vmem.py on the real chip (round-5b chain);
PREFERRED_FORM rows flip to f/g only where the new formulation both lowers
and beats the a/d timing at the same signature."
  run smoke_fg 3600 python bench.py --smoke || {
    echo "SMOKE RED after f/g table — reverting table commit"
    git revert --no-edit HEAD
    run smoke_fg_revert 3600 python bench.py --smoke
  }
  run bench96_fg 5400 python bench.py
  run bench128_fg 5400 env RSUPER_BENCH_SIZE=128 python bench.py
else
  echo "calibration produced no table change — skipping f/g re-bench"
fi

# A/B: k=31 segment dilation as iterated reduce_window balls (reference
# decomposition) instead of the exact FFT ball — new step graph, one compile
run bench96_dilate_iter 5400 env RSUPER_DILATE_BIG=iter python bench.py
bash tools/run_phantom_d.sh
echo "CHAIN-5B DONE $(date +%H:%M:%S)"
