#!/usr/bin/env python
"""Port a torch DINO/DINOv2 checkpoint into splice_tpu's .npz format.

The reference fetches its frozen backbone at runtime from torch.hub
(reference models/extractor.py:20). This framework owns its weights: run
this once on any machine that has the torch checkpoint, then pass
--vit_weights to train.py.

Accepted inputs:
  * a torch-saved state_dict / checkpoint file (.pth/.pt), e.g.
    dino_vitbase8_pretrain.pth from the DINO release, or a torch.hub
    cache entry;
  * checkpoints with a nested 'state_dict' / 'teacher' / 'model' key
    (DINO release formats) — unwrapped automatically, 'module.' and
    'backbone.' prefixes stripped.

Usage:
    python -m splice_tpu.tools.port_dino_weights \
        --checkpoint dino_vitbase8_pretrain.pth \
        --model_name dino_vitb8 --out dino_vitb8.npz
"""
from argparse import ArgumentParser

import numpy as np


def load_torch_state(path: str) -> dict:
    import torch
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Full DINO release checkpoints bundle non-tensor entries (e.g.
        # an argparse.Namespace under 'args') that weights_only refuses;
        # the user explicitly pointed us at this local file, so fall back
        # to a full unpickle for the documented nested formats.
        obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "teacher", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    state = {}
    for k, v in obj.items():
        for prefix in ("module.", "backbone."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        if hasattr(v, "numpy"):
            state[k] = v.detach().cpu().numpy()
    return state


def main():
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True,
                        help="torch checkpoint (.pth) path")
    parser.add_argument("--model_name", default="dino_vitb8",
                        help="dino_vitb8|dino_vits8|dino_vitb16|dino_vits16|"
                             "dinov2_vit{b,l}14[_reg]")
    parser.add_argument("--out", required=True, help="output .npz path")
    args = parser.parse_args()

    from splice_tpu.models import vit as vit_lib
    from splice_tpu.models import weights as w_lib

    cfg = vit_lib.get_vit_config(args.model_name)
    state = load_torch_state(args.checkpoint)
    params = w_lib.port_torch_state_dict(state, cfg)
    w_lib.save_vit_params(args.out, params, args.model_name)
    n = sum(int(np.prod(np.shape(x)))
            for x in __import__("jax").tree.leaves(params))
    print(f"ported {args.model_name}: {n / 1e6:.1f}M params -> {args.out}")


if __name__ == "__main__":
    main()
