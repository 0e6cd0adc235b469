#!/bin/bash
# Round-5c: short re-measurement suite at the FINAL round-5 tree, run after
# chain 5b finishes (waits for its completion marker). Everything here is a
# cache-hit or a cheap A/B:
#   - smoke at HEAD (gate for whatever 5b committed)
#   - inference at the final tree (norm rewrite + measured table affect the
#     window fwd) + a batch=8 window A/B
#   - steady-state loop at the new inline default
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

# wait for chain 5b to finish (marker written by round5b_chain.sh)
for i in $(seq 1 720); do
  grep -q "CHAIN-5B DONE" artifacts/chain5b.log 2>/dev/null && break
  sleep 60
done

run probe_5c 240 python tools/tpu_probe.py || { echo "TPU DOWN — aborting"; exit 1; }
run smoke_r5c 3600 python bench.py --smoke
run bench96_r5c 5400 python bench.py
run infer_r5c 5400 python bench_infer.py
run infer_b8_r5c 5400 env RSUPER_INFER_BATCH=8 python bench_infer.py
run loop_inline_r5c 5400 python tools/bench_loop.py --no-overlap
echo "CHAIN-5C DONE $(date +%H:%M:%S)"
