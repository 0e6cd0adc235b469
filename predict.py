#!/usr/bin/env python
"""Batch-prediction CLI — counterpart of the reference's
``predict_abdomenatlas.py``.

    python predict.py --input_dir cts/ --output_dir preds/ \\
        --checkpoint exp/run1 --classes_json classes.json \\
        [--ema] [--ensemble exp/run2 exp/run3] [--parts 4 --part 0]
"""

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint", required=True, help="experiment dir (orbax)")
    p.add_argument("--ensemble", nargs="*", default=[],
                   help="additional experiment dirs to ensemble")
    p.add_argument("--tag", default="best", choices=["best", "latest"])
    p.add_argument("--classes_json", required=True,
                   help="JSON list of class names (sorted)")
    p.add_argument("--arch", default="medformer")
    p.add_argument("--model_args_json", default=None)
    p.add_argument("--window", type=int, nargs=3, default=(128, 128, 128))
    p.add_argument("--batch_windows", type=int, default=8)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--ema", action="store_true", help="use EMA weights")
    p.add_argument("--no_organ_gating", action="store_true")
    p.add_argument("--connected_components", action="store_true")
    p.add_argument("--save_probabilities", action="store_true")
    p.add_argument("--prob_wire", default="u8", choices=["u8", "f16"],
                   help="D2H format for --save_probabilities lesion "
                        "channels: u8 halves the transfer (error <= 1/510); "
                        "f16 is exact half precision")
    p.add_argument("--ids_csv", default=None, help="CSV with BDMAP_ID column")
    p.add_argument("--parts", type=int, default=1)
    p.add_argument("--part", type=int, default=0)
    args = p.parse_args(argv)
    from rsuper_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # RSUPER_PLATFORM=cpu -> CPU smoke runs

    import jax
    import jax.numpy as jnp

    from rsuper_tpu.inference.predict import predict_folder
    from rsuper_tpu.models import get_model
    from rsuper_tpu.train import make_optimizer
    from rsuper_tpu.train.checkpoint import CheckpointManager
    from rsuper_tpu.train.loop import init_params_on_host
    from rsuper_tpu.train.state import TrainState

    with open(args.classes_json) as f:
        classes = sorted(json.load(f))
    model_args = {}
    if args.model_args_json:
        with open(args.model_args_json) as f:
            model_args = json.load(f)

    model = get_model(args.arch, len(classes), model_args, dtype=jnp.bfloat16)
    tx = make_optimizer()
    params0 = init_params_on_host(
        model, jax.random.PRNGKey(0), jnp.zeros((1, *args.window, 1))
    )
    template = TrainState(
        params=params0, opt_state=tx.init(params0),
        ema_params=jax.tree.map(jnp.copy, params0),
        step=jnp.zeros((), jnp.int32), tx=tx,
    )

    def apply_fn(params, x):
        out = model.apply(params, x)["segmentation"]
        return out[0] if isinstance(out, (list, tuple)) else out

    params_list = []
    for exp in [args.checkpoint] + list(args.ensemble):
        ckpt = CheckpointManager(exp)
        tag = args.tag if ckpt.has(args.tag) else "latest"
        state = ckpt.restore(template, tag)
        params_list.append(state.ema_params if args.ema else state.params)

    ids = None
    if args.ids_csv:
        import pandas as pd

        df = pd.read_csv(args.ids_csv)
        col = "BDMAP_ID" if "BDMAP_ID" in df.columns else "BDMAP ID"
        ids = df[col].tolist()

    done = predict_folder(
        [apply_fn] * len(params_list), params_list,
        args.input_dir, args.output_dir, classes,
        window=tuple(args.window), batch=args.batch_windows,
        threshold=args.threshold,
        organ_mask_on_lesion=not args.no_organ_gating,
        connected_components=args.connected_components,
        save_probabilities=args.save_probabilities,
        prob_wire=args.prob_wire,
        ids=ids, parts=args.parts, part=args.part,
    )
    print(f"predicted {len(done)} cases")


if __name__ == "__main__":
    main()
