#!/usr/bin/env python
"""Generate tests/fixtures/golden_vitb8.npz: full-scale (768/12/12, 785
tokens) block-11 qkv + block-11 output + final CLS of the deterministic
state dict in tests/golden_vit.py, computed by an INDEPENDENT torch
implementation of the DINO ViT architecture.

Run once (torch required); the committed .npz then guards the full-scale
port path in CI with no torch at test time (tests/test_vit_golden.py).

    python tests/fixtures/gen_golden_vitb8.py
"""
import pathlib
import sys

import numpy as np
import torch

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))          # tests/
sys.path.insert(0, str(HERE.parent.parent))   # repo root

import golden_vit
from test_vit_parity import TorchDinoVit


def main():
    state = golden_vit.make_state()
    model = TorchDinoVit(patch=golden_vit.PATCH, dim=golden_vit.DIM,
                         depth=golden_vit.DEPTH, heads=golden_vit.HEADS,
                         img_size=golden_vit.IMG).eval()
    model.load_state_dict({k: torch.from_numpy(v)
                           for k, v in state.items()})
    img = golden_vit.make_input()
    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    with torch.no_grad():
        blocks, qkv = model.forward_collect(timg)
        final = model.norm(blocks[-1])[0].numpy()       # [785, 768]
        probs = model.forward_probs(timg, layer=11)[0].numpy()  # [12,785,785]
    qkv11 = qkv[-1][0].numpy()        # [785, 2304]
    blk11 = blocks[-1][0].numpy()     # [785, 768]
    rows = golden_vit.GOLDEN_ROWS
    prow = golden_vit.PROB_ROWS
    out = HERE / "golden_vitb8.npz"
    np.savez_compressed(
        out,
        rows=rows,
        qkv11_rows=qkv11[rows].astype(np.float16),
        block11_rows=blk11[rows].astype(np.float16),
        cls11=blk11[0].astype(np.float32),
        qkv11_mean=np.float64(qkv11.mean()),
        qkv11_std=np.float64(qkv11.std()),
        block11_mean=np.float64(blk11.mean()),
        block11_std=np.float64(blk11.std()),
        # round-3 VERDICT next #5: freeze the final-norm output and one
        # attention-probability row block so shared-assumption regressions
        # in those paths are pinned to today's behavior.
        final_rows=final[rows].astype(np.float16),
        final_mean=np.float64(final.mean()),
        final_std=np.float64(final.std()),
        prob_rows=prow,
        probs11_rows=probs[:, prow, :].astype(np.float16),
        seed=np.int64(golden_vit.SEED),
    )
    print(f"wrote {out} ({out.stat().st_size / 1024:.0f} KiB); "
          f"qkv11 std={qkv11.std():.4f} blk11 std={blk11.std():.4f} "
          f"final std={final.std():.4f}")


if __name__ == "__main__":
    main()
