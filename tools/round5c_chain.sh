#!/bin/bash
# Round-5c: the calibration sequence the 5b bash never saw (it buffered the
# pre-edit script), plus the final-tree re-measurements. Runs after 5b's
# completion marker appears.
#   1. calibrate the new e/f/g kernel forms on hardware (96-cubed model's
#      signatures only — the headline; 128-cubed rows keep their a/d picks)
#   2. regenerate + COMMIT the table, smoke-gate it, revert on red
#   3. re-bench 96/128 at the committed table (the norm-rewrite tree)
#   4. inference b4/b8 A/B and the steady-state loop at the inline default
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

for i in $(seq 1 720); do
  grep -q "CHAIN-5B DONE" artifacts/chain5b.log 2>/dev/null && break
  sleep 60
done

run probe_5c 240 python tools/tpu_probe.py || { echo "TPU DOWN — aborting"; exit 1; }
run calib_efg 9000 python tools/calibrate_vmem.py --sizes 96
run calib_emit 600 python tools/calibrate_vmem.py --emit
if ! git diff --quiet rsuper_tpu/ops/vmem_table.py; then
  git add rsuper_tpu/ops/vmem_table.py artifacts/vmem_calib2.jsonl
  git commit -m "vmem_table: hardware calibration of the e/f/g kernel forms (96-cubed sweep)

Measured by tools/calibrate_vmem.py on the real chip (round-5c chain);
PREFERRED_FORM rows flip to e/f/g only where the new formulation both
lowers and beats the a/d timing at the same signature."
  run smoke_efg 3600 python bench.py --smoke || {
    echo "SMOKE RED after e/f/g table — reverting table commit"
    git revert --no-edit HEAD
    run smoke_efg_revert 3600 python bench.py --smoke
  }
fi
run bench96_r5c 5400 python bench.py
run bench128_r5c 5400 env RSUPER_BENCH_SIZE=128 python bench.py
run infer_r5c 5400 python bench_infer.py
run infer_b8_r5c 5400 env RSUPER_INFER_BATCH=8 python bench_infer.py
run loop_inline_r5c 5400 python tools/bench_loop.py --no-overlap
echo "CHAIN-5C DONE $(date +%H:%M:%S)"
