#!/bin/bash
# Phantom study C (VERDICT r3 item 6): a regime harsh enough that the
# mask-only arm MISSES many tumors — missed tumors score Dice/NSD 0, so the
# detection gain report supervision buys becomes a mean-DSC/NSD gain, the
# mechanism by which the reference's DSC gains manifest at real-data scale.
# vs study B: contrast floor 0.25 -> 0.18, mask slice 1.4-1.6 -> 1.45-1.6.
# Same 5-seed paired protocol; graphs reuse the study-B compile cache.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p artifacts
timeout 14000 python tools/phantom_benchmark.py \
  --platform tpu --seeds 5 --seed 30 \
  --n_mask 2 --n_report 24 --n_test 32 --steps 300 \
  --contrast 0.18 1.6 --mask_contrast 1.45 1.6 --radius 2.5 5.0 \
  --report_weight 0.1 --out artifacts/phantom_c \
  2>&1 | tee artifacts/exp_phantom_c.log | tail -5
