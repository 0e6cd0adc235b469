#!/usr/bin/env python
"""Convert a reference R-Super torch MedFormer checkpoint to rsuper_tpu.

    python tools/convert_torch_checkpoint.py model.pth out_ckpt/ \
        --classes 42 [--ema] [--config-overrides ...]

Writes an orbax checkpoint ``out_ckpt/best`` containing ``{"params": ...}``
— the exact layout ``train.py --pretrained out_ckpt`` and
``predict.py --model_path out_ckpt`` load. Combine with
``--old_classes``/class surgery for class-list changes after import.

The source may be:
* a ``.pth`` from the reference trainer (``train_ddp.py:184-197``:
  ``{'model_state_dict': ..., 'ema_model_state_dict': ...}``) — torch (CPU)
  must be importable; loaded with ``weights_only=True``;
* a bare state_dict ``.pth``;
* an ``.npz`` with the state_dict keys (export with
  ``np.savez(f, **{k: v.numpy() for k, v in sd.items()})`` on any machine
  that has torch — this path needs no torch here).

Run inference/training on the imported weights with the model flag
``torch_port=True`` (``--model_args '{"torch_port": true}'``) to reproduce
the reference's numerics exactly (align-corners upsampling + torch norm
eps); see ``rsuper_tpu/models/torch_port.py`` for what is converted and why.
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def load_source(path: str, ema: bool):
    if path.endswith(".npz"):
        with np.load(path) as z:
            state = {k: z[k] for k in z.files}
    else:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=True)
        key = "ema_model_state_dict" if ema else "model_state_dict"
        if isinstance(raw, dict) and key in raw:
            raw = raw[key]
        state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                 for k, v in raw.items()}
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source", help=".pth or .npz torch state_dict")
    ap.add_argument("out", help="output checkpoint directory")
    ap.add_argument("--ema", action="store_true",
                    help="convert the EMA weights instead of the raw model")
    ap.add_argument("--classes", type=int, default=42,
                    help="segmentation classes of the source checkpoint "
                         "(only used for the verification template)")
    ap.add_argument("--base_chan", type=int, default=32)
    ap.add_argument("--chan_num", default="64,128,256,320,256,128,64,32")
    ap.add_argument("--conv_num", default="2,0,0,0,0,0,2,2")
    ap.add_argument("--trans_num", default="0,2,4,6,4,2,0,0")
    ap.add_argument("--num_heads", default="1,4,8,10,8,4,1,1")
    ap.add_argument("--fusion_depth", type=int, default=2)
    ap.add_argument("--fusion_dim", type=int, default=320)
    ap.add_argument("--fusion_heads", type=int, default=10)
    ap.add_argument("--no_aux", action="store_true")
    ap.add_argument("--classification", action="store_true")
    ap.add_argument("--clip", action="store_true")
    ap.add_argument("--skip_verify", action="store_true",
                    help="skip the structural check against a fresh init "
                         "(faster; shapes are still validated by orbax load)")
    args = ap.parse_args()

    ints = lambda s: tuple(int(x) for x in s.split(","))
    state = load_source(args.source, args.ema)

    from rsuper_tpu.models.torch_port import (convert_state_dict,
                                              verify_against_template)

    params, missing, unused = convert_state_dict(
        state,
        base_chan=args.base_chan,
        chan_num=ints(args.chan_num),
        conv_num=ints(args.conv_num),
        trans_num=ints(args.trans_num),
        num_heads=ints(args.num_heads),
        fusion_depth=args.fusion_depth,
        aux_loss=not args.no_aux,
        classification=args.classification,
        clip=args.clip,
    )
    if unused:
        print(f"note: {len(unused)} torch keys unused (first 5): {unused[:5]}")

    if not args.skip_verify:
        import jax

        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        from rsuper_tpu.models.medformer import MedFormer

        model = MedFormer(
            num_classes=args.classes, base_chan=args.base_chan,
            chan_num=ints(args.chan_num), conv_num=ints(args.conv_num),
            trans_num=ints(args.trans_num), num_heads=ints(args.num_heads),
            fusion_depth=args.fusion_depth, fusion_dim=args.fusion_dim,
            fusion_heads=args.fusion_heads, aux_loss=not args.no_aux,
            classification_classes=2 if args.classification else 0,
            clip_branch=args.clip, remat=False,
            cf_fullres=False, cf_halfres=False, torch_port=True,
        )
        # smallest valid input: 16x the total downsample factor is plenty
        tmpl = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 32, 32, 32, 1)))["params"]
        problems = verify_against_template(params, tmpl)
        if problems:
            print("CONVERSION MISMATCH:")
            for p in problems[:40]:
                print("  " + p)
            sys.exit(1)

    import orbax.checkpoint as ocp

    out = os.path.abspath(args.out)
    ocp.PyTreeCheckpointer().save(os.path.join(out, "best"),
                                  {"params": params})
    with open(os.path.join(out, "convert_info.json"), "w") as f:
        json.dump({"source": os.path.abspath(args.source), "ema": args.ema,
                   "missing": missing, "unused": unused,
                   "note": "run the model with torch_port=True"}, f, indent=1)
    print(f"wrote {out}/best ({len(missing)} missing, {len(unused)} unused)")


if __name__ == "__main__":
    main()
