#!/bin/bash
# Poll the remote TPU until it is reachable, then run the queued measurement
# batch (tools/run_tpu_experiments.sh). Intended to run in the background:
#   bash tools/wait_and_run_experiments.sh & echo $! > /tmp/wait_exp.pid
# Gives up after MAX_WAIT_S (default 8h).
set -u
cd /root/repo
MAX_WAIT_S=${MAX_WAIT_S:-28800}
POLL_S=${POLL_S:-600}
start=$(date +%s)
mkdir -p artifacts
while :; do
  if timeout 180 env PYTHONPATH=/root/repo:/root/.axon_site \
      python tools/tpu_probe.py >>artifacts/exp_wait.log 2>&1; then
    echo "TPU back at $(date +%H:%M:%S) — starting batch" | tee -a artifacts/exp_wait.log
    bash "${CHAIN_SCRIPT:-tools/run_tpu_experiments.sh}"
    exit $?
  fi
  now=$(date +%s)
  if (( now - start > MAX_WAIT_S )); then
    echo "gave up waiting for TPU after ${MAX_WAIT_S}s" | tee -a artifacts/exp_wait.log
    exit 1
  fi
  echo "tpu still down at $(date +%H:%M:%S); retry in ${POLL_S}s" >>artifacts/exp_wait.log
  sleep "$POLL_S"
done
