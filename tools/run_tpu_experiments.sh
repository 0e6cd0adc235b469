#!/bin/bash
# Queued TPU measurement batch — run when the axon backend is reachable.
# Each stage appends to artifacts/ and prints a one-line summary; stages are
# ordered so the real-lowering smoke gate runs first (CLAUDE.md workflow) and
# everything reuses the persistent compile cache. Round 4: the smoke gate is
# TRACED from the model configs; the batch gates 128³ + inference + the
# steady-state loop so no perf surface can silently regress again.
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
run smoke 14400 python bench.py --smoke || { echo "SMOKE FAILED"; exit 2; }
run bench96 3600 python bench.py
run bench128 3600 env RSUPER_BENCH_SIZE=128 python bench.py
run augment 3600 python tools/bench_augment.py
run augment_fullwarp 3600 env RSUPER_AUG_FULLWARP=1 python tools/bench_augment.py
run loop_device 5400 python tools/bench_loop.py
run loop_host 5400 python tools/bench_loop.py --augment host
run loop_off 5400 python tools/bench_loop.py --augment off
run infer 3600 python bench_infer.py
run profile96 3600 env PROFILE_DIR=/root/repo/artifacts/profile_r4 python tools/profile_step.py
echo "ALL DONE $(date +%H:%M:%S)"
