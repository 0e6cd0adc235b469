#!/usr/bin/env python
"""Export an rsuper_tpu checkpoint back to a reference torch state_dict.

    python tools/export_torch_checkpoint.py exp_dir/checkpoint best out.pth
    python tools/export_torch_checkpoint.py exp_dir/checkpoint best out.npz

The inverse of ``tools/convert_torch_checkpoint.py`` (exact roundtrip —
``tests/test_torch_port.py::test_roundtrip_export``): weights trained on TPU
load into the reference's torch MedFormer with
``model.load_state_dict(torch.load("out.pth"))``. Writes ``.pth`` when torch
is importable, else use a ``.npz`` target and convert on any torch machine.
Pass the same architecture flags as the converter for non-default configs.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir", help="orbax checkpoint directory")
    ap.add_argument("tag", help="checkpoint tag (e.g. best, latest)")
    ap.add_argument("out", help="output .pth or .npz")
    ap.add_argument("--base_chan", type=int, default=32)
    ap.add_argument("--chan_num", default="64,128,256,320,256,128,64,32")
    ap.add_argument("--conv_num", default="2,0,0,0,0,0,2,2")
    ap.add_argument("--trans_num", default="0,2,4,6,4,2,0,0")
    ap.add_argument("--num_heads", default="1,4,8,10,8,4,1,1")
    ap.add_argument("--fusion_depth", type=int, default=2)
    ap.add_argument("--no_aux", action="store_true")
    ap.add_argument("--classification", action="store_true")
    ap.add_argument("--clip", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    from rsuper_tpu.models.torch_port import export_state_dict

    raw = ocp.PyTreeCheckpointer().restore(
        str(Path(args.ckpt_dir).resolve() / args.tag))
    params = raw["params"] if "params" in raw else raw

    ints = lambda s: tuple(int(x) for x in s.split(","))
    state = export_state_dict(
        params, base_chan=args.base_chan, chan_num=ints(args.chan_num),
        conv_num=ints(args.conv_num), trans_num=ints(args.trans_num),
        num_heads=ints(args.num_heads), fusion_depth=args.fusion_depth,
        aux_loss=not args.no_aux, classification=args.classification,
        clip=args.clip)

    if args.out.endswith(".npz"):
        np.savez(args.out, **state)
    else:
        import torch

        torch.save({"model_state_dict":
                    {k: torch.from_numpy(v) for k, v in state.items()}},
                   args.out)
    print(f"wrote {args.out} ({len(state)} tensors)")


if __name__ == "__main__":
    main()
