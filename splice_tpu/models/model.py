"""API-parity model wrapper (reference models/model.py:5-25 and
models/networks.py:56-58).

The TPU-native hot path does not use this class — branch gating is compiled
into the two step variants (splice_tpu/trainer.py). It exists so code
written against the reference's surface (`Model(cfg)(inputs)`/`define_G`)
ports mechanically, e.g. notebooks and tools.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from splice_tpu.models import unet


def define_G(init_type: str = "normal", init_gain: float = 0.02,
             key: Optional[jax.Array] = None,
             cfg: Optional[unet.SkipConfig] = None):
    """reference networks.py:56-58: build + initialize the skip generator.
    Returns (params, skip_config)."""
    gcfg = cfg or unet.SkipConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    return unet.init_skip_params(key, gcfg, init_type, init_gain), gcfg


class Model:
    """reference models/model.py semantics: forward(inputs) computes
    x_global (if cls+ssim lambdas > 0), x_entire (on entire-A steps), and
    always y_global. Inputs/outputs NHWC."""

    def __init__(self, cfg, key: Optional[jax.Array] = None,
                 gcfg: Optional[unet.SkipConfig] = None):
        self.cfg = cfg
        self.params, self.gcfg = define_G(cfg.init_type, cfg.init_gain,
                                          key, gcfg)

    def netG(self, x: jax.Array) -> jax.Array:
        return unet.skip_apply(self.params, self.gcfg, x)

    def __call__(self, inputs: Dict[str, Any]) -> Dict[str, jax.Array]:
        cfg = self.cfg
        outputs: Dict[str, jax.Array] = {}
        if cfg.lambda_global_cls + cfg.lambda_global_ssim > 0:
            outputs["x_global"] = self.netG(inputs["A_global"])
        step = int(inputs["step"])
        # NOTE: the reference gates only on lambda_entire_ssim (model.py:19)
        # and would KeyError when lambda_entire_cls > 0 alone (SURVEY.md §2
        # gating asymmetry); we gate on either.
        if (cfg.lambda_entire_ssim > 0 or cfg.lambda_entire_cls > 0) \
                and step % cfg.entire_A_every == 0:
            outputs["x_entire"] = self.netG(inputs["A"])
        outputs["y_global"] = self.netG(inputs["B_global"])
        return outputs
