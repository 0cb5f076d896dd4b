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
import os
import sys
from argparse import ArgumentParser

from splice_tpu.config import add_cli_args, config_from_cli


def run_with_restarts(cfg) -> int:
    """Elastic recovery (the reference loses the whole run on any crash,
    SURVEY.md §5): run the training in a child process; when it dies —
    OOM, a remote-device tunnel drop, an injected fault — relaunch it
    from the latest checkpoint, up to cfg.max_restarts times. Process
    isolation matters: a wedged device client cannot be revived
    in-process."""
    import subprocess
    if cfg.checkpoint_every <= 0 or not cfg.checkpoint_dir:
        raise SystemExit("--max_restarts requires --checkpoint_every > 0 "
                         "and --checkpoint_dir (the restart resumes from "
                         "the latest checkpoint)")
    rc = 1
    for attempt in range(cfg.max_restarts + 1):
        env = dict(os.environ, _SPLICE_ELASTIC_CHILD="1",
                   SPLICE_RESTART_ATTEMPT=str(attempt))
        cmd = [sys.executable, os.path.abspath(__file__)] + sys.argv[1:]
        if attempt > 0:
            # argparse takes the LAST occurrence, so this overrides any
            # user-provided --resume_from on restarts.
            cmd += ["--resume_from", cfg.checkpoint_dir]
        rc = subprocess.run(cmd, env=env).returncode
        if rc == 0:
            return 0
        left = cfg.max_restarts - attempt
        print(f"train.py: attempt {attempt} exited rc={rc}; "
              f"{'restarting from ' + cfg.checkpoint_dir if left else 'no restarts left'}",
              file=sys.stderr)
    return rc


def main():
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, default=None,
                        help="YAML config path (CLI flags override it)")
    add_cli_args(parser)
    args = parser.parse_args()
    cfg = config_from_cli(args, args.config)

    if cfg.max_restarts > 0 and not os.environ.get("_SPLICE_ELASTIC_CHILD"):
        raise SystemExit(run_with_restarts(cfg))
    if cfg.jax_platform:
        import jax
        jax.config.update("jax_platforms", cfg.jax_platform)

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
