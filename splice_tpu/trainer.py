"""Training driver: one jitted step = on-device augmentation -> generator
forwards -> one batched frozen-ViT forward -> weighted loss -> grad -> Adam.

Replaces the reference hot loop (reference train.py:51-80), which per step
runs host-side PIL augmentation, an H2D copy, 3-4 generator forwards and ~6
sequential batch-1 frozen-ViT forwards with 48 hook registrations each
(reference extractor.py:81-103). Here the host only advances a step counter
and occasionally fetches logs; everything else is a single compiled XLA
program per step class (regular / entire-A).

Two compiled step variants instead of a traced conditional: the every-75th
"entire image" step (reference model.py:19, losses.py:39-44) adds a full-res
generator forward and a batch-2 ViT forward; compiling it separately keeps
the regular step free of dead branches.
"""
from __future__ import annotations

import dataclasses
import functools
import math
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from splice_tpu import losses as losses_lib
from splice_tpu.config import Config
from splice_tpu.data import ImagePair, load_pair
from splice_tpu.models import extractor as ext_lib
from splice_tpu.models import unet, vit as vit_lib
from splice_tpu.models.weights import load_or_init_vit_params
from splice_tpu.ops import image as img_ops
from splice_tpu.utils.io import save_result
from splice_tpu.utils.metrics import MetricsLogger, StepTimer


# ---------------------------------------------------------------------------
# Optimizer / scheduler (reference util/util.py:8-39)
# ---------------------------------------------------------------------------

def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """adam/rmsprop/sgd with torch-matching defaults; lr is injected as a
    hyperparameter so host-side schedulers (incl. plateau) tune it without
    recompiling."""
    if cfg.optimizer == "adam":
        tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.lr, b1=cfg.optimizer_beta1,
            b2=cfg.optimizer_beta2, eps=1e-8)
    elif cfg.optimizer == "rmsprop":
        tx = optax.inject_hyperparams(optax.rmsprop)(
            learning_rate=cfg.lr, decay=0.99, eps=1e-8)
    elif cfg.optimizer == "sgd":
        tx = optax.inject_hyperparams(optax.sgd)(learning_rate=cfg.lr)
    else:
        raise ValueError(cfg.optimizer)
    return tx


class Scheduler:
    """Host-side LR schedule, torch-parity (reference util/util.py:8-25).

    lr_for_step(i) with 0-based i reproduces the torch scheduler value in
    effect during optimization step i (schedulers step once per epoch after
    the optimizer, reference train.py:80).
    """

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.policy = cfg.scheduler_policy
        self.base_lr = cfg.lr
        # plateau state (torch ReduceLROnPlateau: factor .2, rel threshold
        # .01, patience 5)
        self._plateau_factor = 1.0
        self._best = math.inf
        self._bad_epochs = 0

    def observe(self, loss: float) -> None:
        if self.policy != "plateau":
            return
        if loss < self._best * (1.0 - 0.01):
            self._best = loss
            self._bad_epochs = 0
        else:
            self._bad_epochs += 1
            if self._bad_epochs > 5:
                self._plateau_factor *= 0.2
                self._bad_epochs = 0

    def lr_for_step(self, i: int) -> float:
        c = self.cfg
        if self.policy == "none":
            return self.base_lr
        if self.policy == "linear":
            return self.base_lr * max(
                0.0, 1.0 - max(0, i) / float(c.scheduler_n_epochs_decay + 1))
        if self.policy == "step":
            return self.base_lr * (0.5 ** (i // c.scheduler_lr_decay_iters))
        if self.policy == "cosine":
            return self.base_lr * 0.5 * (1.0 + math.cos(
                math.pi * i / c.n_epochs))
        if self.policy == "plateau":
            return self.base_lr * self._plateau_factor
        raise ValueError(self.policy)


# ---------------------------------------------------------------------------
# Step builder
# ---------------------------------------------------------------------------

LOSS_NAMES = ("loss_global_cls", "loss_global_ssim", "loss_global_id_B",
              "loss_entire_cls", "loss_entire_ssim")
LAMBDA_ORDER = ("lambda_global_cls", "lambda_global_ssim",
                "lambda_global_identity", "lambda_entire_cls",
                "lambda_entire_ssim")


@dataclasses.dataclass
class SpliceProgram:
    """Compiled artifacts for one image pair."""
    step_regular: Callable
    step_entire: Callable
    render: Callable
    init_state: Callable
    gcfg: unet.SkipConfig
    extractor: ext_lib.VitExtractor


def lambdas_vec(cfg: Config, step: int) -> np.ndarray:
    lam = losses_lib.lambdas_for_step(cfg, step)
    return np.asarray([lam[k] for k in LAMBDA_ORDER], np.float32)


def build_program(cfg: Config, pair: ImagePair,
                  extractor: ext_lib.VitExtractor,
                  gcfg: Optional[unet.SkipConfig] = None) -> SpliceProgram:
    gcfg = gcfg or unet.SkipConfig()
    nA, nB = cfg.global_A_crops_n_crops, cfg.global_B_crops_n_crops
    SA, SB = pair.canvas_A, pair.canvas_B
    tx = make_optimizer(cfg)

    def transform(x):
        """Loss-side preprocessing (reference losses.py:17-24)."""
        y = img_ops.dino_global_resize(
            x, cfg.dino_global_patch_size, cfg.dino_global_max_size,
            antialias=cfg.antialias)
        return img_ops.imagenet_normalize(y)

    def sample_inputs(A, B, key):
        """Per-step on-device augmentation + global crops
        (reference Dataset.py:62-70, transforms.py:7-41)."""
        kAa, kAc, kBa, kBc = jax.random.split(key, 4)
        if cfg.use_augmentations:
            A = img_ops.structure_augment(A, kAa)
            B = img_ops.texture_augment(B, kBa)
        A_crops = img_ops.global_crops(A, kAc, nA,
                                       cfg.global_A_crops_min_cover, SA,
                                       cfg.antialias)
        B_crops = img_ops.global_crops(B, kBc, nB,
                                       cfg.global_B_crops_min_cover, SB,
                                       cfg.antialias)
        return A_crops, B_crops

    def loss_fn(params, A, B, key, lam, entire: bool):
        A_crops, B_crops = sample_inputs(A, B, key)
        x_global = unet.skip_apply(params, gcfg, A_crops)
        y_global = unet.skip_apply(params, gcfg, B_crops)
        parts, aux = losses_lib.splice_losses_fused(
            extractor, transform(x_global), transform(A_crops),
            transform(y_global), transform(B_crops))
        if entire:
            x_entire = unet.skip_apply(params, gcfg, A[None])
            # entire-cls target: CLS of the first B crop (losses.py:60,87),
            # reused from the main fused batch.
            parts.update(losses_lib.entire_losses_fused(
                extractor, transform(x_entire), transform(A[None]),
                aux["cls_B"]))
        else:
            parts["loss_entire_cls"] = jnp.float32(0.0)
            parts["loss_entire_ssim"] = jnp.float32(0.0)
        lam_map = dict(zip(LAMBDA_ORDER, lam))
        active = {k: v for k, v in parts.items()
                  if entire or not k.startswith("loss_entire")}
        total = losses_lib.weighted_total(active, lam_map)
        return total, parts

    def step(state, A, B, step_idx, base_key, lam, entire: bool):
        key = jax.random.fold_in(base_key, step_idx)
        (total, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"], A, B, key, lam, entire)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        parts["loss"] = total
        return {"params": params, "opt_state": opt_state}, parts

    step_regular = jax.jit(functools.partial(step, entire=False),
                           donate_argnums=(0,))
    step_entire = jax.jit(functools.partial(step, entire=True),
                          donate_argnums=(0,))

    @jax.jit
    def render(params, A):
        """Full-image generator forward for logging (reference train.py
        :70-74 runs this under no_grad; here it is simply not
        differentiated)."""
        return jnp.clip(unet.skip_apply(params, gcfg, A[None])[0], 0.0, 1.0)

    def init_state(key) -> Dict[str, Any]:
        params = unet.init_skip_params(key, gcfg, cfg.init_type,
                                       cfg.init_gain)
        return {"params": params, "opt_state": tx.init(params)}

    return SpliceProgram(step_regular=step_regular, step_entire=step_entire,
                         render=render, init_state=init_state, gcfg=gcfg,
                         extractor=extractor)


# ---------------------------------------------------------------------------
# Host loop (reference train.py:15-80)
# ---------------------------------------------------------------------------

def make_extractor_from_config(cfg: Config,
                               seed: int = 0) -> ext_lib.VitExtractor:
    vcfg = vit_lib.get_vit_config(cfg.dino_model_name)
    params = load_or_init_vit_params(cfg.dino_model_name, cfg.vit_weights,
                                     seed=seed)
    dtype = jnp.bfloat16 if cfg.vit_compute_dtype == "bfloat16" \
        else jnp.float32
    return ext_lib.VitExtractor(
        params=params, cfg=vcfg, model_name=cfg.dino_model_name,
        compute_dtype=dtype, use_pallas=cfg.use_pallas_attention,
        remat=cfg.remat_vit)


def resolve_seed(cfg: Config) -> int:
    if cfg.seed == -1:
        return int(np.random.randint(2 ** 31 - 1))
    return cfg.seed


def train_pair(cfg: Config, pair: Optional[ImagePair] = None,
               callback: Optional[Callable] = None,
               extractor: Optional[ext_lib.VitExtractor] = None,
               init_params: Optional[Dict[str, Any]] = None,
               n_steps: Optional[int] = None,
               dataroot: Optional[str] = None) -> Dict[str, Any]:
    """Optimize one pair; returns {'state', 'losses', 'steps_per_sec',
    'output'}. `init_params` warm-starts the generator (video mode)."""
    seed = resolve_seed(cfg)
    print(f"running with seed: {seed}.")
    root = dataroot or cfg.dataroot
    if pair is None:
        pair = load_pair(cfg, root)
    if extractor is None:
        extractor = make_extractor_from_config(cfg)
    program = build_program(cfg, pair, extractor)

    key = jax.random.PRNGKey(seed)
    k_init, k_steps = jax.random.split(key)
    state = program.init_state(k_init)
    if init_params is not None:
        state["params"] = init_params

    sched = Scheduler(cfg)
    logger = MetricsLogger(cfg.metrics_path
                           or f"{root}/out/metrics.jsonl")
    timer = StepTimer()
    ckpt = None
    if cfg.checkpoint_every and cfg.checkpoint_dir:
        from splice_tpu.utils.checkpoint import Checkpointer
        ckpt = Checkpointer(cfg.checkpoint_dir)

    total_steps = n_steps if n_steps is not None else cfg.n_epochs
    last_losses: Dict[str, Any] = {}
    t_start = time.perf_counter()
    for epoch in range(1, total_steps + 1):
        step_idx = epoch - 1          # dataset counter is 0-based
        lam = lambdas_vec(cfg, step_idx)
        lr = sched.lr_for_step(step_idx)
        state["opt_state"].hyperparams["learning_rate"] = jnp.asarray(
            lr, jnp.float32)
        fn = program.step_entire if losses_lib.is_entire_step(cfg, step_idx) \
            else program.step_regular
        state, parts = fn(state, pair.A, pair.B, jnp.int32(step_idx),
                          k_steps, jnp.asarray(lam))
        timer.tick()

        if epoch % cfg.log_images_freq == 0:
            out = program.render(state["params"], pair.A)
            save_result(np.asarray(out), root)
            last_losses = {k: float(v) for k, v in parts.items()}
            sched.observe(last_losses.get("loss", math.inf))
            logger.log(step_idx, {**last_losses, "lr": lr,
                                  "steps_per_sec": timer.rate()})
            if callback is not None:
                callback(out)
        if ckpt is not None and epoch % cfg.checkpoint_every == 0:
            ckpt.save(epoch, state)
    # Final render
    out = program.render(state["params"], pair.A)
    out.block_until_ready()
    wall = time.perf_counter() - t_start
    save_result(np.asarray(out), root)
    logger.close()
    return {"state": state, "losses": last_losses,
            "steps_per_sec": total_steps / wall, "output": out,
            "wall_time": wall, "seed": seed}


def train_model(dataroot: Optional[str] = None,
                callback: Optional[Callable] = None,
                cfg: Optional[Config] = None) -> Dict[str, Any]:
    """Reference-parity entry point (reference train.py:15)."""
    if cfg is None:
        from splice_tpu.config import load_config
        import pathlib
        default = pathlib.Path("conf/default/config.yaml")
        cfg = load_config(str(default) if default.exists() else None)
    if dataroot is not None:
        cfg = dataclasses.replace(cfg, dataroot=dataroot)
    return train_pair(cfg, callback=callback)
