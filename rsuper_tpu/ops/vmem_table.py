"""Hardware-measured TD capacities for the whole-plane channel-first conv
kernels (`ops/conv_cf.py`).

Two rounds of analytic scoped-VMEM budgets each mispredicted a new shape on
real Mosaic lowering (round 2: the paired conv at 19.23M; round 3: the 128³
pair Ci=64→Co=128/S=4096 at 18.93M, predicted 12.6M) — the compiler's
liveness is not modellable from first principles, so TD selection is driven
by MEASUREMENT: `tools/calibrate_vmem.py` compiles every kernel signature
the real MedFormer configs emit (traced via `ops/trace_shapes.py`) on the
TPU and records the largest TD that lowers. `_pick_td` consults this table
first; unmeasured shapes fall back to a conservative analytic bound and are
caught by the traced `bench.py --smoke` gate before any training run.

key: (kind, S, Ci, Co, itemsize, fused) where kind ∈ {"fwd", "wgrad"},
S = H·W lanes, itemsize = operand dtype bytes, fused = IN+relu epilogue.
value: max TD (depth rows per grid step) that lowers on v5e; 0 = even TD=1
fails (dispatch must chunk channels further).

This file is GENERATED — regenerate with:
    tools/calibrate_vmem.py --emit rsuper_tpu/ops/vmem_table.py
"""

# provenance: empty bootstrap table (pre-calibration); the analytic fallback
# in _pick_td governs until tools/calibrate_vmem.py populates this.
MEASURED_TD = {}
