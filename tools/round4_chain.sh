#!/bin/bash
# Round-4 TPU pipeline: wait for the running VMEM calibration, emit the
# measured TD table, verify every production pick is measured-good, then run
# the full experiment batch and phantom study C back-to-back so the remote
# chip never idles between stages.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
CALIB_PID=${1:-}

if [ -n "$CALIB_PID" ]; then
  echo "waiting for calibration pid $CALIB_PID..."
  while kill -0 "$CALIB_PID" 2>/dev/null; do sleep 30; done
fi

echo "=== emit ($(date +%H:%M:%S)) ==="
python tools/calibrate_vmem.py --emit 2>&1 | tail -3

echo "=== check ($(date +%H:%M:%S)) ==="
if ! timeout 1800 python tools/calibrate_vmem.py --check \
    > artifacts/exp_calibcheck.log 2>&1; then
  echo "CHECK FAILED — measuring the missing cells, then re-checking"
  tail -10 artifacts/exp_calibcheck.log
  timeout 14400 python tools/calibrate_vmem.py \
      >> artifacts/calib_run2.log 2>&1
  python tools/calibrate_vmem.py --emit 2>&1 | tail -2
  timeout 1800 python tools/calibrate_vmem.py --check \
      > artifacts/exp_calibcheck.log 2>&1 || {
    echo "CHECK STILL FAILING — aborting before the batch"; exit 3; }
fi
tail -2 artifacts/exp_calibcheck.log

bash tools/run_tpu_experiments.sh
echo "=== phantom C ($(date +%H:%M:%S)) ==="
bash tools/run_phantom_c.sh
echo "CHAIN DONE $(date +%H:%M:%S)"
