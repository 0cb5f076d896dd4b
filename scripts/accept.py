#!/usr/bin/env python
"""Turnkey quality acceptance: port a real DINO checkpoint, train the two
bundled pairs, and score the outputs against stored reference outputs.

This is the ONE command to run the moment a `dino_vitbase8_pretrain.pth`
becomes available (this environment has zero egress, so the checkpoint —
reference models/extractor.py:20 downloads it from torch.hub — can never be
fetched here; see README "When you have DINO weights").

    python scripts/accept.py --checkpoint dino_vitbase8_pretrain.pth \
        [--lpips_weights lpips_alex.npz] [--n_epochs 2000] [--out accept.json]

Per pair it: trains `n_epochs` steps with the ported weights, then compares
`<dataroot>/out/output.png` against `<dataroot>/ref/output.png` — the
reference implementation's own output for the same pair, which the upstream
repo does NOT ship (it bundles inputs only; reference
datasets/splicing/*/{A,B}). Producing that file requires one run of the
reference on a CUDA/CPU box: `python train.py --dataroot datasets/splicing/
<pair>` in the reference repo, then copy `out/output.png` to
`<dataroot>/ref/output.png` here. Until both artifacts exist the script
still runs end to end and reports `ref_available: false` per pair.

Acceptance criterion (BASELINE.md protocol step 3): LPIPS <= 0.05 vs the
reference output. LPIPS needs AlexNet+linear-head weights as an .npz
(tools/evaluate.py `port_lpips_weights`); without it PSNR/SSIM are reported
and `lpips` is null.

Exit code: 0 if every comparable pair passes (or nothing was comparable —
the report then says exactly which artifact is missing), 1 on a failed
comparison, 2 on a pipeline error (weight port, training run, or a
shape-mismatched comparison — anything that prevents a verdict).
"""
from __future__ import annotations

import pathlib as _pathlib
import sys as _sys
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
PAIRS = ("cows", "apples2oranges")
LPIPS_THRESHOLD = 0.05


def run(cmd, **kw):
    print("+", " ".join(str(c) for c in cmd), flush=True)
    return subprocess.run([str(c) for c in cmd], check=True, **kw)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="torch DINO checkpoint (.pth), e.g. "
                         "dino_vitbase8_pretrain.pth")
    ap.add_argument("--model_name", default="dino_vitb8")
    ap.add_argument("--lpips_weights", default=None,
                    help="LPIPS .npz (evaluate.port_lpips_weights); "
                         "omit to report PSNR/SSIM only")
    ap.add_argument("--n_epochs", type=int, default=2000)
    ap.add_argument("--pairs", nargs="*", default=list(PAIRS))
    ap.add_argument("--datasets_root", default=str(REPO / "datasets"
                                                   / "splicing"),
                    help="directory holding the <pair>/{A,B[,ref]} trees")
    ap.add_argument("--train_args", default="",
                    help="extra flags forwarded verbatim to train.py "
                         "(e.g. '--A_resize 224 --jax_platform cpu')")
    ap.add_argument("--out", default=str(REPO / "accept.json"))
    ap.add_argument("--vit_npz", default="/tmp/accept_vit.npz",
                    help="where to write the ported weights")
    args = ap.parse_args()
    extra_train_args = args.train_args.split()

    report = {"checkpoint": args.checkpoint, "model_name": args.model_name,
              "n_epochs": args.n_epochs, "pairs": {}, "pass": None,
              "lpips_threshold": LPIPS_THRESHOLD}

    try:
        run([sys.executable, "-m", "splice_tpu.tools.port_dino_weights",
             "--checkpoint", args.checkpoint, "--model_name",
             args.model_name, "--out", args.vit_npz], cwd=REPO)
    except subprocess.CalledProcessError as e:
        report["error"] = f"weight port failed: {e}"
        pathlib.Path(args.out).write_text(json.dumps(report, indent=2))
        print(json.dumps(report))
        return 2

    from splice_tpu.tools import evaluate as ev

    verdicts = []
    pipeline_error = False
    for pair in args.pairs:
        droot = pathlib.Path(args.datasets_root) / pair
        entry = {"dataroot": str(droot)}
        t0 = time.time()
        try:
            run([sys.executable, str(REPO / "train.py"),
                 "--dataroot", str(droot),
                 "--vit_weights", args.vit_npz,
                 "--dino_model_name", args.model_name,
                 "--n_epochs", str(args.n_epochs)] + extra_train_args,
                cwd=REPO)
            entry["trained"] = True
            entry["train_wall_s"] = round(time.time() - t0, 1)
        except subprocess.CalledProcessError as e:
            # A failed training run prevents a verdict: pipeline error
            # (exit 2), not a failed comparison (exit 1).
            entry["trained"] = False
            entry["error"] = str(e)
            report["pairs"][pair] = entry
            pipeline_error = True
            continue
        out_png = droot / "out" / "output.png"
        ref_png = droot / "ref" / "output.png"
        entry["output"] = str(out_png)
        entry["ref_available"] = ref_png.exists()
        if not ref_png.exists():
            entry["blocking_artifact"] = (
                f"{ref_png} missing: run the reference implementation on "
                f"this pair once and copy its out/output.png there")
            report["pairs"][pair] = entry
            continue
        a, b = ev.load01(str(out_png)), ev.load01(str(ref_png))
        if a.shape != b.shape:
            entry["error"] = f"shape mismatch {a.shape} vs {b.shape}"
            report["pairs"][pair] = entry
            pipeline_error = True
            continue
        entry["psnr"] = round(ev.psnr(a, b), 3)
        entry["ssim"] = round(ev.ssim(a, b), 4)
        if args.lpips_weights:
            entry["lpips"] = round(ev.lpips(a, b, args.lpips_weights), 4)
            entry["lpips_pass"] = entry["lpips"] <= LPIPS_THRESHOLD
            verdicts.append(entry["lpips_pass"])
        else:
            entry["lpips"] = None
            entry["blocking_artifact"] = (
                "no --lpips_weights: LPIPS (the acceptance metric) not "
                "computed; produce the .npz with "
                "evaluate.port_lpips_weights on a box with the torch "
                "checkpoints")
        report["pairs"][pair] = entry

    report["pass"] = all(verdicts) if verdicts else None
    pathlib.Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report))
    if pipeline_error:
        return 2
    return 0 if report["pass"] in (True, None) else 1


if __name__ == "__main__":
    sys.exit(main())
