#!/bin/bash
# Phantom study D (VERDICT r4 item 6): make the DSC gain statistically
# unambiguous. Study C's scaling analysis put the lesion-Dice signal-to-noise
# at ~1 with n_test=32 — each found-vs-missed tumor moves mean Dice by
# ~1/n_test, the same order as boundary noise. This runs the regime that
# analysis predicts works: the SAME harsh study-C generator (contrast floor
# 0.18, mask slice 1.45-1.6) with n_test=128 (4x the per-seed Dice
# resolution; test volumes are inference-only, cheap) and 10 seeds, plus the
# PRE-REGISTERED exclusion of both-arms-degenerate seeds (lesion Dice < 0.05
# in both arms = the mask draw failed to train any segmenter — study C seed
# 34's mode, which measures the data draw, not the supervision effect).
# Done-bar: paired lesion-Dice gain with a 1 sigma (sem) interval excluding
# zero, or a documented negative.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p artifacts

# The 5e loop_inline stage ran on a checkout where native/librsuper_native.so
# had never been built (gitignored; fresh clone) — the loader silently fell
# back to the Python packing path. Build it and take the deliverable
# default-mode (overlap) loop number at HEAD before the long phantom run;
# graphs are cached from the loop_inline stage so this is minutes.
make -C native >/dev/null 2>&1 || true
timeout 3600 python tools/bench_loop.py \
  > artifacts/exp_loop_native_r5e.log 2>&1
loop_rc=$?
grep -E '^\{"metric"' artifacts/exp_loop_native_r5e.log | tail -2
{ echo "## loop_native (rc=$loop_rc, commit $(git rev-parse --short HEAD), $(date +%H:%M:%S))"
  grep -E '^\{"metric"' artifacts/exp_loop_native_r5e.log | tail -2
  echo; } >> docs/results_r5e.md
git add docs/results_r5e.md >/dev/null 2>&1
git diff --cached --quiet || git commit -q -m "round5e chain: record native-loader loop measurement"

timeout 38000 python tools/phantom_benchmark.py \
  --platform tpu --seeds 10 --seed 40 \
  --n_mask 2 --n_report 24 --n_test 128 --steps 300 \
  --contrast 0.18 1.6 --mask_contrast 1.45 1.6 --radius 2.5 5.0 \
  --report_weight 0.1 --exclude_degenerate 0.05 \
  --out artifacts/phantom_d \
  2>&1 | tee artifacts/exp_phantom_d.log | tail -5
