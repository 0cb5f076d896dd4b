#!/usr/bin/env python
"""CLI entry point: optimize a generator for one structure/appearance pair.

Reference-compatible surface (reference train.py:83-89: only --dataroot) plus
full config override: every key in splice_tpu.config.Config is a --flag, and
--config selects a YAML file (default conf/default/config.yaml if present).

Examples:
    python train.py --dataroot datasets/splicing/cows
    python train.py --dataroot d --n_epochs 2000 --vit_weights dino_vitb8.npz
    python train.py --config conf/default/config.yaml --direction BtoA
"""
from argparse import ArgumentParser

from splice_tpu.config import add_cli_args, config_from_cli


def main():
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, default=None,
                        help="YAML config path (CLI flags override it)")
    add_cli_args(parser)
    args = parser.parse_args()
    cfg = config_from_cli(args, args.config)

    from splice_tpu import trainer   # deferred: jax import is slow
    if cfg.video_mode:
        from splice_tpu.video import train_video
        train_video(cfg)
    elif "," in cfg.dataroot:
        # Multi-pair scale-out: comma-separated dataroots optimize
        # concurrently in one compiled step, sharded over the dp mesh axis.
        from splice_tpu.parallel.pair_parallel import train_pairs
        roots = [r.strip() for r in cfg.dataroot.split(",") if r.strip()]
        res = train_pairs(cfg, roots)
        from splice_tpu.utils.io import save_image
        import numpy as np
        for root, out in zip(roots, np.asarray(res["outputs"])):
            save_image(out, f"{root}/out/output.png")
        print(f"{res['pair_steps_per_sec']:.2f} pair-steps/s over "
              f"{len(roots)} pairs")
    else:
        trainer.train_pair(cfg)


if __name__ == "__main__":
    main()
