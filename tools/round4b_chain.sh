#!/bin/bash
# Round-4b TPU pipeline — run AFTER the formulation-D conv kernels land
# (kh-stacked-M dots; docs/perf.md round-4 section). The measured VMEM table
# is stale for the new kernel bodies, so this re-runs the hardware
# calibration first, then the verification gate and the benches.
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

echo "=== calibrate ($(date +%H:%M:%S)) ==="
# the pre-formulation-D measurements are stale for the new kernel bodies —
# archive them so the resumable store starts empty
if [ -f artifacts/vmem_calib.jsonl ]; then
  mv -n artifacts/vmem_calib.jsonl artifacts/vmem_calib_pre_d.jsonl
fi
timeout 14400 python tools/calibrate_vmem.py > artifacts/calib_d.log 2>&1
tail -3 artifacts/calib_d.log
python tools/calibrate_vmem.py --emit 2>&1 | tail -2
run calibcheck 1800 python tools/calibrate_vmem.py --check || {
  echo "CHECK FAILED — aborting before the batch"; exit 3; }

run smoke 14400 python bench.py --smoke || { echo "SMOKE FAILED"; exit 2; }
run bench96 3600 python bench.py
run bench128 3600 env RSUPER_BENCH_SIZE=128 python bench.py
run infer 3600 python bench_infer.py
run loop_device 5400 python tools/bench_loop.py
run profile96 3600 env PROFILE_DIR=/root/repo/artifacts/profile_r4b python tools/profile_step.py
run profile_infer 3600 env PROFILE_DIR=/root/repo/artifacts/profile_infer python tools/profile_infer.py
echo "CHAIN-4B DONE $(date +%H:%M:%S)"
