#!/bin/bash
# Round-4c TPU batch — runs AFTER round4b_chain finishes (augment levers
# landed mid-round-4: shared-index packed nearest warp fe904b1, shear-warp
# image path 0a4b579):
#   1. device_augment with the shared-index nearest gather (default graph)
#   2. device_augment with RSUPER_AUG_SHEAR=1 (image warp on the MXU)
#   3. e2e loop with the winning augment mode (run both; collect decides)
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
run augment_r4c 3600 python tools/bench_augment.py
run augment_shear 3600 env RSUPER_AUG_SHEAR=1 python tools/bench_augment.py
run loop_shear 5400 env RSUPER_AUG_SHEAR=1 python tools/bench_loop.py
echo "CHAIN-4C DONE $(date +%H:%M:%S)"
