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
import os
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
from splice_tpu.utils.io import AsyncImageSaver
from splice_tpu.utils import metrics as metrics_lib
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


# torch ReduceLROnPlateau default patience; shared with train_pair's
# plateau chunk cap so the two stay in sync.
PLATEAU_PATIENCE = 5


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
            if self._bad_epochs > PLATEAU_PATIENCE:
                self._plateau_factor *= 0.2
                self._bad_epochs = 0

    def state_dict(self) -> Dict[str, np.ndarray]:
        """Host scheduler state for checkpointing — only plateau carries
        any (the other policies are closed-form in the step index)."""
        return {"plateau_factor": np.float64(self._plateau_factor),
                "best": np.float64(self._best),
                "bad_epochs": np.int64(self._bad_epochs)}

    def load_state_dict(self, d) -> None:
        self._plateau_factor = float(d["plateau_factor"])
        self._best = float(d["best"])
        self._bad_epochs = int(d["bad_epochs"])

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


class MultiPairScheduler:
    """Per-pair host LR schedule for the multi-pair trainer: Scheduler
    vectorized over the pair axis. The closed-form policies are identical
    across pairs (and computed in-trace by device_lr_fn anyway); plateau
    keeps an independent (factor, best, bad_epochs) per pair so one pair
    stalling cuts only its own lr — torch ReduceLROnPlateau semantics
    (reference util/util.py:18) applied per pair.
    """

    def __init__(self, cfg: Config, n_pairs: int):
        self.cfg = cfg
        self.policy = cfg.scheduler_policy
        self.base_lr = cfg.lr
        self.n_pairs = n_pairs
        self._scalar = Scheduler(cfg)
        self._factor = np.ones(n_pairs)
        self._best = np.full(n_pairs, np.inf)
        self._bad = np.zeros(n_pairs, np.int64)

    def observe(self, losses) -> None:
        """Feed one step's per-pair losses ([P]); same cut rule as
        Scheduler.observe, elementwise."""
        if self.policy != "plateau":
            return
        losses = np.asarray(losses, np.float64)
        improved = losses < self._best * (1.0 - 0.01)
        self._best = np.where(improved, losses, self._best)
        bad = np.where(improved, 0, self._bad + 1)
        cut = bad > PLATEAU_PATIENCE
        self._factor = np.where(cut, self._factor * 0.2, self._factor)
        self._bad = np.where(cut, 0, bad)

    def lr_for_step(self, i: int) -> np.ndarray:
        """Per-pair lr vector [P] in effect during step i."""
        if self.policy == "plateau":
            return self.base_lr * self._factor
        return np.full(self.n_pairs, self._scalar.lr_for_step(i))

    def state_dict(self) -> Dict[str, np.ndarray]:
        return {"plateau_factor": self._factor.copy(),
                "best": self._best.copy(),
                "bad_epochs": self._bad.copy()}

    def load_state_dict(self, d) -> None:
        factor = np.asarray(d["plateau_factor"], np.float64)
        if factor.shape != (self.n_pairs,):
            # A wrong-pair-count checkpoint would otherwise load silently
            # and only surface later as an opaque shape/vmap error at
            # dispatch.
            raise ValueError(
                f"scheduler checkpoint holds {factor.shape} plateau state "
                f"but this run trains {self.n_pairs} pairs")
        self._factor = factor.copy()
        self._best = np.asarray(d["best"], np.float64).copy()
        self._bad = np.asarray(d["bad_epochs"], np.int64).copy()


def device_lr_fn(cfg: Config) -> Optional[Callable]:
    """Closed-form LR as a traced function of the step index, for policies
    whose schedule doesn't depend on host feedback (linear/step/cosine).

    Computing lr INSIDE the scanned step keeps the chunked dispatch intact:
    with the host-side scheduler every step needed its own dispatch to
    inject a fresh lr (dominating cost through a remote-TPU tunnel), so any
    scheduler != none collapsed throughput. Matches Scheduler.lr_for_step
    exactly (torch parity, reference util/util.py:8-25); plateau stays
    host-side because it observes the loss.
    """
    c = cfg
    if c.scheduler_policy == "linear":
        return lambda i: c.lr * jnp.maximum(
            0.0, 1.0 - jnp.maximum(i, 0).astype(jnp.float32)
            / float(c.scheduler_n_epochs_decay + 1))
    if c.scheduler_policy == "step":
        return lambda i: c.lr * jnp.power(
            jnp.float32(0.5),
            (i // c.scheduler_lr_decay_iters).astype(jnp.float32))
    if c.scheduler_policy == "cosine":
        return lambda i: c.lr * 0.5 * (1.0 + jnp.cos(
            jnp.float32(math.pi) * i.astype(jnp.float32) / c.n_epochs))
    return None


# ---------------------------------------------------------------------------
# Step builder
# ---------------------------------------------------------------------------

# Unroll factor for the chunk's step scan (ablate.py `cu<N>`); unroll=2
# measured 30.29 vs 31.96 steps/s (PERFORMANCE.md negative results).
CHUNK_SCAN_UNROLL = 1

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
    step_chunk: Callable        # n regular steps per dispatch (lax.scan)
    render: Callable
    init_state: Callable
    gcfg: unet.SkipConfig
    extractor: ext_lib.VitExtractor
    unravel: Callable = None    # flat param vector -> param tree
    ravel: Callable = None      # param tree -> flat vector
    render_u8: Callable = None  # render + on-device uint8 (cheap d2h)
    precompile: Callable = None  # parallel AOT compile of known chunk sizes


def fetch_scalars(parts: Dict[str, Any]) -> Dict[str, float]:
    """One device-to-host transfer for a dict of device scalars (see
    utils.metrics.fetch_stacked for the tunnel-roundtrip rationale)."""
    keys, vals = metrics_lib.fetch_stacked(parts)
    return {k: float(v) for k, v in zip(keys, vals)}


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
    gdt = jnp.bfloat16 if cfg.generator_compute_dtype == "bfloat16" else None
    if cfg.generator_layout == "chw":
        g_apply = functools.partial(unet.skip_apply_chw,
                                    conv_impl=cfg.generator_conv)
    else:
        g_apply = unet.skip_apply

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

    # Generator params live in the train state as ONE flat fp32 vector:
    # Adam over ~200 separate conv/BN leaves lowers to >1k tiny kernels per
    # step (tens of ms of pure launch overhead on TPU), while Adam over one
    # contiguous 1M-element vector is a single fused kernel; it also shrinks
    # the lax.scan carry from ~600 buffers to 3.
    from jax.flatten_util import ravel_pytree
    _p0 = unet.init_skip_params(jax.random.PRNGKey(0), gcfg, cfg.init_type,
                                cfg.init_gain)
    _flat0, unravel = ravel_pytree(_p0)

    def loss_fn(flat_params, vit_params, A, B, key, lam, entire: bool):
        params = unravel(flat_params)
        # vit_params MUST be a jit argument, not a closure capture: captured
        # arrays are embedded into the HLO as literals, and 86M frozen ViT
        # params (~344MB) blow both compile time and the TPU tunnel's
        # program-upload limit.
        ext = dataclasses.replace(extractor, params=vit_params)
        A_crops, B_crops = sample_inputs(A, B, key)
        if SA == SB and nA == nB:
            # One vmapped generator pass over both crop stacks: convs see
            # batch 2n (the tiny-channel U-Net is dispatch/utilization
            # bound at batch 1), while BatchNorm statistics remain
            # per-stack exactly like the reference's two separate forwards
            # (reference model.py:15-23).
            outs = jax.vmap(
                lambda xs: g_apply(params, gcfg, xs, gdt)
            )(jnp.stack([A_crops, B_crops]))
            x_global, y_global = outs[0], outs[1]
        else:
            x_global = g_apply(params, gcfg, A_crops, gdt)
            y_global = g_apply(params, gcfg, B_crops, gdt)
        parts, aux = losses_lib.splice_losses_fused(
            ext, transform(x_global), transform(A_crops),
            transform(y_global), transform(B_crops))
        if entire:
            x_entire = g_apply(params, gcfg, A[None], gdt)
            # entire-cls target: CLS of the first B crop (losses.py:60,87),
            # reused from the main fused batch.
            parts.update(losses_lib.entire_losses_fused(
                ext, transform(x_entire), transform(A[None]),
                aux["cls_B"]))
        else:
            parts["loss_entire_cls"] = jnp.float32(0.0)
            parts["loss_entire_ssim"] = jnp.float32(0.0)
        lam_map = dict(zip(LAMBDA_ORDER, lam))
        active = {k: v for k, v in parts.items()
                  if entire or not k.startswith("loss_entire")}
        total = losses_lib.weighted_total(active, lam_map)
        return total, parts

    dev_lr = device_lr_fn(cfg)

    def step(state, vit_params, A, B, step_idx, base_key, lam,
             entire: bool):
        key = jax.random.fold_in(base_key, step_idx)
        (total, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"], vit_params, A, B, key,
                                   lam, entire)
        opt_in = state["opt_state"]
        if dev_lr is not None:
            # In-trace lr assignment into the injected hyperparams (the
            # documented optax pattern): each scanned step sees its own lr
            # without a host dispatch.
            opt_in.hyperparams["learning_rate"] = dev_lr(
                jnp.asarray(step_idx, jnp.int32))
        updates, opt_state = tx.update(grads, opt_in,
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        parts["loss"] = total
        return {"params": params, "opt_state": opt_state}, parts

    def chunk(state, vit_params, A, B, start_idx, base_key, lam, n: int):
        """lax.scan over n regular steps: ONE dispatch per chunk instead of
        per step (host/tunnel dispatch overhead would otherwise dwarf the
        ~ms device step). Returns the last step's losses."""
        def body(st, i):
            st, parts = step(st, vit_params, A, B, start_idx + i, base_key,
                             lam, entire=False)
            return st, parts

        state, parts_seq = jax.lax.scan(body, state, jnp.arange(n),
                                        unroll=CHUNK_SCAN_UNROLL)
        parts = jax.tree.map(lambda x: x[-1], parts_seq)
        # Per-step totals for the whole chunk: the plateau scheduler must
        # observe EVERY step's loss (torch ReduceLROnPlateau steps per
        # epoch, reference util/util.py:18), not just chunk/log boundaries.
        parts["loss_seq"] = parts_seq["loss"]
        return state, parts

    _jit_chunks: Dict[int, Callable] = {}
    _jit_entire = jax.jit(functools.partial(step, entire=True),
                          donate_argnums=(0,))
    vparams = extractor.params   # passed at call time => XLA parameter
    # (closure-captured params would be embedded as HLO literals: 344MB of
    # ViT-B weights per program, breaking compile time and upload limits)

    # AOT-compiled executables keyed by chunk size (int) or "entire",
    # produced by precompile() on background threads. Each distinct chunk
    # size is a SEPARATE multi-minute XLA compile; without precompile the
    # host loop hits them serially, mid-run, at the first step of that
    # size (measured: a cold 400-step CLI run stalls ~1-2 min each at
    # steps 70/76 when the 5- and 4-step boundary chunks first compile).
    _aot: Dict[Any, Any] = {}

    def _aot_get(key_):
        fut = _aot.get(key_)
        if fut is None:
            return None
        try:
            return fut.result()
        except Exception:
            _aot[key_] = None       # compile failed: fall back to jit
            return None

    def step_chunk(state, A, B, start_idx, base_key, lam, n: int):
        """Run n consecutive regular steps (one compiled program per
        distinct n; the host loop uses a handful of sizes)."""
        exe = _aot_get(n)
        if exe is not None:
            try:
                return exe(state, vparams, A, B, start_idx, base_key, lam)
            except Exception:
                _aot[n] = None      # aval drift vs the precompiled args
        if n not in _jit_chunks:
            _jit_chunks[n] = jax.jit(functools.partial(chunk, n=n),
                                     donate_argnums=(0,))
        return _jit_chunks[n](state, vparams, A, B, start_idx, base_key,
                              lam)

    def step_regular(state, A, B, step_idx, base_key, lam):
        return step_chunk(state, A, B, step_idx, base_key, lam, 1)

    def step_entire(state, A, B, step_idx, base_key, lam):
        exe = _aot_get("entire")
        if exe is not None:
            try:
                return exe(state, vparams, A, B, step_idx, base_key, lam)
            except Exception:
                _aot["entire"] = None
        return _jit_entire(state, vparams, A, B, step_idx, base_key, lam)

    def precompile(state, A, B, base_key, sizes, include_entire=True):
        """Compile the run's known chunk-size programs (and the entire-A
        step) concurrently on background threads via the AOT API, so the
        host loop never stalls on a first-encounter compile. Returns
        immediately; step_chunk/step_entire block on the matching future
        only when they actually need that program.

        The chunk sizes are fully determined by the boundary policy
        (train_pair walks boundaries_after over the whole run), so every
        program can start compiling at step 0 instead of surfacing
        serially at steps 70, 75, 76, ... XLA compiles are internally
        multithreaded but release the GIL, so a small pool overlaps them.
        """
        import concurrent.futures as cf

        def sds(t):
            return jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), t)

        s_state, s_vp, s_A, s_B = sds(state), sds(vparams), sds(A), sds(B)
        s_idx = jax.ShapeDtypeStruct((), jnp.int32)
        s_key = sds(base_key)
        s_lam = jax.ShapeDtypeStruct((len(LAMBDA_ORDER),), jnp.float32)

        jobs = []
        for n in sorted(set(sizes)):
            if n in _aot or n in _jit_chunks:
                continue
            jfn = jax.jit(functools.partial(chunk, n=n), donate_argnums=(0,))
            jobs.append((n, jfn))
        if include_entire and "entire" not in _aot:
            jobs.append(("entire", _jit_entire))
        if not jobs:
            return
        pool = cf.ThreadPoolExecutor(max_workers=min(3, len(jobs)))
        for key_, jfn in jobs:
            _aot[key_] = pool.submit(
                lambda f=jfn: f.lower(s_state, s_vp, s_A, s_B, s_idx,
                                      s_key, s_lam).compile())
        pool.shutdown(wait=False)

    # Introspection for tests: step_chunk must actually consume the AOT
    # executables (a silently-broken lower/compile would fall back to the
    # serial mid-run jit compiles this exists to remove).
    precompile.aot = _aot
    precompile.jit_cache = _jit_chunks

    @jax.jit
    def render(flat_params, A):
        """Full-image generator forward for logging (reference train.py
        :70-74 runs this under no_grad; here it is simply not
        differentiated)."""
        return jnp.clip(
            g_apply(unravel(flat_params), gcfg, A[None], gdt)[0],
            0.0, 1.0)

    @jax.jit
    def render_u8(flat_params, A):
        """render + on-device uint8 conversion for the periodic dump: the
        device-to-host image transfer shrinks 4x (12.9 MB fp32 -> 3.2 MB
        at 900x1200), which matters through a remote-TPU tunnel."""
        return img_ops.tensor2im(render(flat_params, A))

    def init_state(key, params=None) -> Dict[str, Any]:
        """Fresh train state; passing `params` (tree or flat vector) warm
        starts without the ~200 tiny eager random-init dispatches a fresh
        init costs (which a remote-TPU tunnel turns into real per-frame
        latency in video mode)."""
        if params is None:
            tree = unet.init_skip_params(key, gcfg, cfg.init_type,
                                         cfg.init_gain)
            flat, _ = ravel_pytree(tree)
        elif getattr(params, "ndim", None) == 1:
            flat = params
        else:
            flat, _ = ravel_pytree(params)
        return {"params": flat, "opt_state": tx.init(flat)}

    def ravel_params(tree):
        flat, _ = ravel_pytree(tree)
        return flat

    return SpliceProgram(step_regular=step_regular, step_entire=step_entire,
                         step_chunk=step_chunk, render=render,
                         render_u8=render_u8,
                         init_state=init_state, gcfg=gcfg,
                         extractor=extractor, unravel=unravel,
                         ravel=ravel_params, precompile=precompile)


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
    # Frozen weights stored in the compute dtype: halves the per-step HBM
    # traffic of the block scan's weight slices (see
    # vit.cast_params_for_compute).
    params = vit_lib.cast_params_for_compute(params, dtype)
    return ext_lib.VitExtractor(
        params=params, cfg=vcfg, model_name=cfg.dino_model_name,
        compute_dtype=dtype, use_pallas=cfg.use_pallas_attention,
        remat=cfg.remat_vit)


def setup_compile_cache(cfg: Config) -> None:
    """Enable the persistent XLA compile cache (idempotent, cheap to repeat).

    Each step-class/shape variant otherwise costs a fresh multi-minute XLA
    compile per process; with the cache, repeat CLI runs (and the small
    every-run programs like render/init) reload compiled executables from
    disk. cfg.compile_cache_dir="" disables."""
    from splice_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(cfg.compile_cache_dir)


def resolve_seed(cfg: Config) -> int:
    if cfg.seed == -1:
        return int(np.random.randint(2 ** 31 - 1))
    return cfg.seed


def train_pair(cfg: Config, pair: Optional[ImagePair] = None,
               callback: Optional[Callable] = None,
               extractor: Optional[ext_lib.VitExtractor] = None,
               init_params: Optional[Dict[str, Any]] = None,
               n_steps: Optional[int] = None,
               dataroot: Optional[str] = None,
               program: Optional[SpliceProgram] = None,
               saver: Optional[AsyncImageSaver] = None,
               logger: Optional[MetricsLogger] = None,
               want_output: bool = True) -> Dict[str, Any]:
    """Optimize one pair; returns {'state', 'losses', 'steps_per_sec',
    'output'}. `init_params` warm-starts the generator (video mode);
    passing `program` reuses an already-built/compiled step (video mode
    runs many same-shape frames — rebuilding per frame re-jits).

    `callback`, when given, is invoked at each log boundary with the
    rendered output as a uint8 HWC array in [0, 255] (rendered on device;
    do NOT multiply by 255 — reference train.py:70-76 callback parity but
    with the dtype already quantized)."""
    setup_compile_cache(cfg)
    seed = resolve_seed(cfg)
    print(f"running with seed: {seed}.")
    root = dataroot or cfg.dataroot
    if pair is None:
        pair = load_pair(cfg, root)
    if extractor is None:
        extractor = make_extractor_from_config(cfg)
    if program is None:
        program = build_program(cfg, pair, extractor)

    key = jax.random.PRNGKey(seed)
    k_init, k_steps = jax.random.split(key)
    start_epoch = 1
    if init_params is not None:
        # Warm start (video mode): state built directly from the given
        # params (tree or flat vector) — no throwaway random init.
        state = program.init_state(k_init, params=init_params)
    else:
        state = program.init_state(k_init)
    sched = Scheduler(cfg)
    if init_params is None and cfg.resume_from:
        # Crash recovery / continuation (new capability: the reference
        # loses the whole run on a crash, SURVEY.md §5).
        from splice_tpu.utils.checkpoint import Checkpointer
        rck = Checkpointer(cfg.resume_from)
        step0 = rck.latest_step()
        if step0 is not None:
            template = jax.tree.map(np.asarray, state)
            if cfg.scheduler_policy == "plateau":
                # Plateau lr depends on host feedback history, so its
                # factor/best/patience state rides in the checkpoint —
                # without it a resume would silently reset lr to base.
                try:
                    restored = rck.restore(
                        step0,
                        template={**template, "sched": sched.state_dict()})
                    sched.load_state_dict(restored.pop("sched"))
                    state = restored
                except Exception:
                    # pre-sched-state checkpoint: restore what exists
                    state = rck.restore(step0, template=template)
                    print("warning: checkpoint has no scheduler state; "
                          "plateau lr restarts from the base lr")
            else:
                state = rck.restore(step0, template=template)
            start_epoch = step0 + 1
            print(f"resumed from {cfg.resume_from} at step {step0}")
    own_logger = logger is None
    if own_logger:
        logger = MetricsLogger(cfg.metrics_path
                               or f"{root}/out/metrics.jsonl")
    timer = StepTimer()
    ckpt = None
    if cfg.checkpoint_every and cfg.checkpoint_dir:
        from splice_tpu.utils.checkpoint import Checkpointer
        ckpt = Checkpointer(cfg.checkpoint_dir)

    total_steps = n_steps if n_steps is not None else cfg.n_epochs
    last_losses: Dict[str, Any] = {}
    own_saver = saver is None
    if own_saver:
        saver = AsyncImageSaver()
    out_png = f"{root}/out/output.png"
    out_u8 = None

    def boundaries_after(i: int) -> int:
        """Next step index (exclusive) where the host must intervene:
        an entire-A step, a log/checkpoint boundary, a profiler mark, or
        the lambda-warmup switch."""
        cands = [total_steps]
        # next entire-A step strictly after i
        if cfg.lambda_entire_ssim > 0 or cfg.lambda_entire_cls > 0:
            nxt = ((i // cfg.entire_A_every) + 1) * cfg.entire_A_every
            cands.append(nxt)
        # log boundary: epochs (1-based) multiple of log_images_freq
        # -> step index log_images_freq*k - 1 must END a chunk
        k = (i + 1 + cfg.log_images_freq - 1) // cfg.log_images_freq
        cands.append(k * cfg.log_images_freq)
        if ckpt is not None:
            k = (i + 1 + cfg.checkpoint_every - 1) // cfg.checkpoint_every
            cands.append(k * cfg.checkpoint_every)
        if i < cfg.cls_warmup:
            cands.append(cfg.cls_warmup)
        if cfg.profile_dir:
            for m in (cfg.profile_start_step,
                      cfg.profile_start_step + cfg.profile_n_steps):
                if m > i:
                    cands.append(m)
        if cfg.scheduler_policy == "plateau":
            # Plateau needs host feedback: the chunk reports every step's
            # loss, but a mid-chunk lr cut only applies from the next
            # dispatch — cap chunks at patience+1 so the cut lands within
            # one patience window. linear/step/cosine compute lr inside the
            # scanned step (device_lr_fn) and keep full-length chunks.
            cands.append(i + PLATEAU_PATIENCE + 1)
        return min(c for c in cands if c > i)

    if program.precompile is not None:
        # The boundary walk below is the exact step-class sequence the
        # loop will execute, so every distinct chunk size (and whether an
        # entire-A step occurs) is known NOW — start all those compiles
        # in parallel instead of stalling 1-2 min at each size's first
        # mid-run encounter (measured on the 400-step CLI run: stalls at
        # steps 70/76 for the 5- and 4-step boundary chunks).
        sizes = set()
        any_entire = False
        i = start_epoch - 1
        while i < total_steps:
            if losses_lib.is_entire_step(cfg, i):
                any_entire = True
                i += 1
                continue
            b = boundaries_after(i)
            sizes.add(b - i)
            i = b
        program.precompile(state, pair.A, pair.B, k_steps, sizes,
                           include_entire=any_entire)

    t_start = time.perf_counter()
    step_idx = start_epoch - 1
    parts: Dict[str, Any] = {}
    while step_idx < total_steps:
        lam = lambdas_vec(cfg, step_idx)
        lr = sched.lr_for_step(step_idx)
        if cfg.scheduler_policy in ("none", "plateau"):
            # linear/step/cosine set lr in-trace (device_lr_fn); writing it
            # here too would be dead work overwritten on device.
            state["opt_state"].hyperparams["learning_rate"] = jnp.asarray(
                lr, jnp.float32)
        if cfg.profile_dir and step_idx == cfg.profile_start_step:
            from splice_tpu.utils.profiling import device_trace_options
            jax.profiler.start_trace(
                cfg.profile_dir, profiler_options=device_trace_options())
        if cfg.profile_dir and \
                step_idx == cfg.profile_start_step + cfg.profile_n_steps:
            jax.tree.map(lambda x: x.block_until_ready(), state)
            jax.profiler.stop_trace()
        if losses_lib.is_entire_step(cfg, step_idx):
            state, parts = program.step_entire(
                state, pair.A, pair.B, jnp.int32(step_idx), k_steps,
                jnp.asarray(lam))
            n_done = 1
        else:
            # boundaries_after never crosses the next entire-A step (it is
            # one of the candidates), a log/checkpoint boundary, or the
            # lambda-warmup switch.
            end = boundaries_after(step_idx)
            n_done = end - step_idx
            state, parts = program.step_chunk(
                state, pair.A, pair.B, jnp.int32(step_idx), k_steps,
                jnp.asarray(lam), n_done)
        step_idx += n_done
        if (0 <= cfg.fault_inject_step < step_idx
                and os.environ.get("SPLICE_RESTART_ATTEMPT", "0") == "0"):
            # Fault injection (first attempt only): exercises the elastic
            # recovery path — train.py --max_restarts relaunches from the
            # latest checkpoint (SURVEY.md §5: absent in the reference).
            raise RuntimeError(
                f"injected fault after step {cfg.fault_inject_step}")
        timer.tick(n_done)
        loss_seq = parts.pop("loss_seq", None)
        if cfg.scheduler_policy == "plateau":
            # Feed EVERY step's loss to the plateau logic (torch patience
            # semantics are per-step; observing only at log boundaries made
            # patience log_images_freq x too slow). One small d2h per chunk.
            seq = np.atleast_1d(np.asarray(
                loss_seq if loss_seq is not None else parts["loss"]))
            for v in seq:
                sched.observe(float(v))

        if step_idx % cfg.log_images_freq == 0 or step_idx >= total_steps:
            # uint8 on device; the saver thread does the (tunnel) d2h.
            # Intermediate frames may drop under queue pressure (a newer
            # one lands shortly); the FINAL output.png must not. Video
            # mode (want_output=False) writes its own per-frame artifact
            # from output_u8 — skip the duplicate final output.png encode.
            out_u8 = program.render_u8(state["params"], pair.A)
            if want_output or step_idx < total_steps:
                saver.save(out_u8, out_png,
                           must_write=step_idx >= total_steps)
            # Scalar fetches + the memory-stats RPC happen in the metrics
            # worker thread: on the train thread each was a blocking
            # tunnel roundtrip per log boundary (video mode pays several
            # boundaries per ~2s frame).
            logger.log_async(
                step_idx - 1, dict(parts),
                # lr as of the chunk's LAST step (the record's step label);
                # the pre-chunk value can be log_images_freq decay steps
                # stale under linear/step/cosine.
                {"lr": sched.lr_for_step(step_idx - 1),
                 "steps_per_sec": timer.rate()},
                with_memory=(step_idx // cfg.log_images_freq) % 10 == 0)
            if callback is not None:
                callback(out_u8)
        if ckpt is not None and step_idx % cfg.checkpoint_every == 0:
            if cfg.scheduler_policy == "plateau":
                ckpt.save(step_idx, {**state, "sched": sched.state_dict()})
            else:
                ckpt.save(step_idx, state)
    # Final float render for the return value. The loop's last iteration
    # already queued the final output.png (its log branch fires when
    # step_idx >= total_steps), so no synchronous save/transfer here —
    # the old blocking np.asarray + PNG write cost a full-image d2h
    # through the tunnel per video frame. Video mode skips the float
    # render entirely (want_output=False): it only consumes output_u8 and
    # the params, so a full-res fp32 render per frame is dead device work.
    out = None
    if want_output:
        out = program.render(state["params"], pair.A)
        jax.block_until_ready(out)
    else:
        jax.block_until_ready(state["params"])
    wall = time.perf_counter() - t_start
    if parts:
        # A run shorter than one log interval must still report its
        # losses; a resumed run already at total_steps has none to report.
        last_losses = fetch_scalars(parts)
    if out_u8 is None:
        # Zero-step run (e.g. resume already complete): still produce the
        # output artifact (reference train.py:70-74 contract).
        out_u8 = program.render_u8(state["params"], pair.A)
        saver.save(out_u8, out_png, must_write=True)
    if ckpt is not None:
        # orbax saves are async: finalize the last one before returning,
        # or process teardown can leave it uncommitted and a later resume
        # silently restarts up to checkpoint_every steps earlier.
        ckpt.wait()
    if own_saver:
        saver.close()
    if own_logger:
        logger.close()
    # Rate over the steps THIS call executed (a resumed run did fewer
    # than total_steps; same fix as train_pairs).
    done_steps = total_steps - (start_epoch - 1)
    return {"state": state, "losses": last_losses,
            "steps_per_sec": done_steps / wall if done_steps > 0 else 0.0,
            "output": out,
            "output_u8": out_u8, "wall_time": wall, "seed": seed}


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
