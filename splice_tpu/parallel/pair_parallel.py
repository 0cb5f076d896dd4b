"""Multi-pair scale-out: optimize P independent image pairs inside ONE
compiled step, sharded over a ("dp", "tp") mesh.

This is BASELINE.json config 3 ("vmap-batched optimization over 8 image
pairs sharing one compiled step on a v5e slice") — a capability the
reference cannot express at all (single device, batch-1 loop; SURVEY.md §2).

Design: the per-pair train step (augment -> G -> batched frozen ViT ->
losses -> grad -> Adam) is vmapped over the pair axis with
spmd_axis_name="dp", so every pair-stacked tensor — generator params,
optimizer state, crops, ViT activations' batch dim — is sharded over dp by
GSPMD. The frozen ViT params are replicated over dp and (optionally)
Megatron-sharded over tp, so a big pair batch can also split each ViT
matmul across chips. Pairs are independent, so dp needs no collectives;
tp > 1 runs the ViT's MANUAL tensor-parallel path (vit._block tp_manual:
local head/hidden slices + explicit psums after proj/fc2) inside the
fully-manual shard_map region so the Pallas attention/conv kernels stay
live — a GSPMD-auto tp axis would force their XLA fallbacks.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from splice_tpu import losses as losses_lib
from splice_tpu.config import Config
from splice_tpu.models import extractor as ext_lib
from splice_tpu.models import unet
from splice_tpu.ops import image as img_ops
from splice_tpu.parallel import mesh as mesh_lib
from splice_tpu.trainer import LAMBDA_ORDER, device_lr_fn, make_optimizer


@dataclasses.dataclass
class MultiPairProgram:
    step_regular: Callable
    step_entire: Callable
    render: Callable
    init_states: Callable
    mesh: Mesh
    gcfg: unet.SkipConfig
    step_chunk: Callable = None   # n regular steps per dispatch (lax.scan)
    render_u8: Callable = None    # render + on-device uint8 [P,H,W,3]


def build_multi_pair_program(cfg: Config, extractor: ext_lib.VitExtractor,
                             mesh: Mesh, canvas: int,
                             gcfg: Optional[unet.SkipConfig] = None
                             ) -> MultiPairProgram:
    """All pairs share one static geometry: images are [P, hw, hw, 3]
    (square, pre-resized by the loader), crops land on `canvas`. The
    generator/optimizer state carries a leading P axis sharded over dp.
    """
    gcfg = gcfg or unet.SkipConfig()
    nA, nB = cfg.global_A_crops_n_crops, cfg.global_B_crops_n_crops
    tx = make_optimizer(cfg)
    gdt = jnp.bfloat16 if cfg.generator_compute_dtype == "bfloat16" else None
    if cfg.generator_layout == "chw":
        g_apply = functools.partial(unet.skip_apply_chw,
                                    conv_impl=cfg.generator_conv)
    else:
        g_apply = unet.skip_apply
    # The whole step is MANUAL over both axes (Mosaic/Pallas kernels cannot
    # sit in a GSPMD-auto region, so an auto tp axis would force the XLA
    # attention/conv fallbacks — the round-2 formulation). With tp > 1 the
    # ViT runs its manual-tp path: params are column-permuted local head /
    # hidden slices (mesh.manual_tp_permute_vit_params) and the block
    # psums after proj/fc2; the Pallas attention kernel runs on the local
    # head slice. Gradient correctness across the replicated-over-tp
    # generator relies on shard_map's varying-manual-axes tracking
    # (check_vma=True) inserting the psums at invariant->varying
    # boundaries in the transpose.
    manual_axes = {"dp", "tp"}
    tp_size = mesh.shape["tp"]
    check_vma = tp_size > 1
    vit_in_spec = P()
    if tp_size > 1:
        pparams = mesh_lib.manual_tp_permute_vit_params(
            extractor.params, extractor.cfg, tp_size)
        specs = mesh_lib.vit_param_pspecs(pparams)
        pparams = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            pparams, specs)
        extractor = dataclasses.replace(extractor, params=pparams,
                                        tp_axis=None, tp_manual="tp")
        vit_in_spec = specs

    def transform(x):
        y = img_ops.dino_global_resize(
            x, cfg.dino_global_patch_size, cfg.dino_global_max_size,
            antialias=cfg.antialias)
        return img_ops.imagenet_normalize(y)

    def per_pair_loss(params, vit_params, A, B, key, lam, entire: bool):
        # vit_params arrives as a jit/shard_map argument — closure-captured
        # arrays would be baked into the HLO as literals (344MB for ViT-B).
        ext = dataclasses.replace(extractor, params=vit_params)
        kAa, kAc, kBa, kBc = jax.random.split(key, 4)
        if cfg.use_augmentations:
            # static_ctrl=False: this runs vmapped over pairs (cond would
            # lower to select anyway) inside a check_vma shard_map region,
            # where jax-0.9.0's cond/vma unification is buggy.
            A_aug = img_ops.structure_augment(A, kAa, static_ctrl=False)
            B_aug = img_ops.texture_augment(B, kBa)
        else:
            A_aug, B_aug = A, B
        A_crops = img_ops.global_crops(A_aug, kAc, nA,
                                       cfg.global_A_crops_min_cover, canvas,
                                       cfg.antialias)
        B_crops = img_ops.global_crops(B_aug, kBc, nB,
                                       cfg.global_B_crops_min_cover, canvas,
                                       cfg.antialias)
        x_global = g_apply(params, gcfg, A_crops, gdt)
        y_global = g_apply(params, gcfg, B_crops, gdt)
        parts, aux = losses_lib.splice_losses_fused(
            ext, transform(x_global), transform(A_crops),
            transform(y_global), transform(B_crops))
        if entire:
            x_entire = g_apply(params, gcfg, A[None], gdt)
            parts.update(losses_lib.entire_losses_fused(
                ext, transform(x_entire), transform(A[None]),
                aux["cls_B"]))
        else:
            parts["loss_entire_cls"] = jnp.float32(0.0)
            parts["loss_entire_ssim"] = jnp.float32(0.0)
        lam_map = dict(zip(LAMBDA_ORDER, lam))
        active = {k: v for k, v in parts.items()
                  if entire or not k.startswith("loss_entire")}
        return losses_lib.weighted_total(active, lam_map), parts

    dev_lr = device_lr_fn(cfg)

    def per_pair_step(state, vit_params, A, B, key, lam, step_idx,
                      entire: bool):
        (total, parts), grads = jax.value_and_grad(
            per_pair_loss, has_aux=True)(state["params"], vit_params, A, B,
                                         key, lam, entire)
        opt_in = state["opt_state"]
        if dev_lr is not None:
            # linear/step/cosine lr computed in-trace from the step index:
            # scheduled multi-pair runs keep chunked dispatch (same design
            # as the single-pair trainer).
            opt_in.hyperparams["learning_rate"] = dev_lr(
                jnp.asarray(step_idx, jnp.int32))
        updates, opt_state = tx.update(grads, opt_in,
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        parts["loss"] = total
        return {"params": params, "opt_state": opt_state}, parts

    # Both axes are *manual* shard_map axes: each device runs the plain
    # per-pair step over its local slice of pairs (independent — zero dp
    # collectives), and with tp > 1 the ViT's manual-tp path psums across
    # head/hidden shards explicitly. A pure spmd_axis_name=vmap formulation
    # trips XLA's partitioner on the grouped convs that batching per-pair
    # generator kernels produces.
    def local_step(states, vit_params, As, Bs, step_idx, base_key, lam,
                   entire: bool):
        L = As.shape[0]                      # pairs on this device
        shard = jax.lax.axis_index("dp")
        gids = shard * L + jnp.arange(L)     # global pair ids -> streams
        keys = jax.vmap(lambda i: jax.random.fold_in(
            jax.random.fold_in(base_key, step_idx), i))(gids)
        return jax.vmap(
            functools.partial(per_pair_step, entire=entire),
            in_axes=(0, None, 0, 0, 0, None, None),
        )(states, vit_params, As, Bs, keys, lam, step_idx)

    vparams = extractor.params

    def jit_step(entire):
        fn = jax.shard_map(
            functools.partial(local_step, entire=entire), mesh=mesh,
            in_specs=(P("dp"), vit_in_spec, P("dp"), P("dp"),
                      P(), P(), P()),
            out_specs=(P("dp"), P("dp")),
            axis_names=manual_axes, check_vma=check_vma)
        jitted = jax.jit(fn, donate_argnums=(0,))
        return lambda states, As, Bs, i, k, lam: \
            jitted(states, vparams, As, Bs, i, k, lam)

    # Chunked regular stepping: one dispatch per n steps (lax.scan), same
    # trick as the single-pair trainer — per-step dispatch latency through
    # the host/tunnel otherwise dwarfs the device step at these sizes.
    def local_chunk(states, vit_params, As, Bs, start_idx, base_key, lam,
                    n: int):
        def body(st, i):
            return local_step(st, vit_params, As, Bs, start_idx + i,
                              base_key, lam, entire=False)

        states, parts_seq = jax.lax.scan(body, states, jnp.arange(n))
        parts = jax.tree.map(lambda x: x[-1], parts_seq)
        # Every step's per-pair total, pair-major ([L, n] so the uniform
        # P("dp") out-spec shards the pair axis): the plateau scheduler
        # observes each step, not just chunk tails (same rationale as the
        # single-pair trainer's loss_seq).
        parts["loss_seq"] = parts_seq["loss"].T
        return states, parts

    _jit_chunks: Dict[int, Callable] = {}

    def step_chunk(states, As, Bs, start_idx, base_key, lam, n: int):
        if n not in _jit_chunks:
            fn = jax.shard_map(
                functools.partial(local_chunk, n=n), mesh=mesh,
                in_specs=(P("dp"), vit_in_spec, P("dp"), P("dp"),
                          P(), P(), P()),
                out_specs=(P("dp"), P("dp")),
                axis_names=manual_axes, check_vma=check_vma)
            _jit_chunks[n] = jax.jit(fn, donate_argnums=(0,))
        return _jit_chunks[n](states, vparams, As, Bs, start_idx, base_key,
                              lam)

    render_local = jax.shard_map(
        lambda ps, As: jnp.clip(
            jax.vmap(lambda p, a: unet.skip_apply(p, gcfg, a[None])[0]
                     )(ps, As), 0.0, 1.0),
        mesh=mesh, in_specs=(P("dp"), P("dp")), out_specs=P("dp"),
        axis_names=manual_axes, check_vma=check_vma)
    render = jax.jit(render_local)
    # uint8 on device: periodic per-pair output dumps transfer 4x less
    # through a remote-TPU tunnel (same rationale as the single-pair
    # trainer's render_u8).
    render_u8 = jax.jit(
        lambda ps, As: img_ops.tensor2im(render_local(ps, As)))

    dp_shard = mesh_lib.dp_sharding(mesh)

    def init_states(key, n_pairs: int):
        keys = jax.random.split(key, n_pairs)
        states = jax.vmap(
            lambda k: (lambda p: {"params": p, "opt_state": tx.init(p)})(
                unet.init_skip_params(k, gcfg, cfg.init_type, cfg.init_gain))
        )(keys)
        return jax.device_put(states, dp_shard)

    return MultiPairProgram(step_regular=jit_step(False),
                            step_entire=jit_step(True), render=render,
                            init_states=init_states, mesh=mesh, gcfg=gcfg,
                            step_chunk=step_chunk, render_u8=render_u8)


def load_pair_batch(cfg: Config, dataroots: Sequence[str],
                    image_hw: int) -> Dict[str, jax.Array]:
    """Load P pairs, shorter-side resize + center crop to (image_hw,
    image_hw) so every pair shares one static geometry."""
    from splice_tpu.data import first_image_in, load_image

    def square(np_img):
        h, w, _ = np_img.shape
        short = min(h, w)
        # torchvision truncation (int(), not round()) — same parity
        # convention as load_image / dino_resize_shape.
        scale_hw = (int(h * image_hw / short), int(w * image_hw / short))
        t = img_ops.resize(jnp.asarray(np_img), scale_hw,
                           antialias=cfg.antialias)
        top = (scale_hw[0] - image_hw) // 2
        left = (scale_hw[1] - image_hw) // 2
        return t[top:top + image_hw, left:left + image_hw]

    As, Bs = [], []
    for root in dataroots:
        a = load_image(first_image_in(os.path.join(root, "A")), cfg.A_resize)
        b = load_image(first_image_in(os.path.join(root, "B")), cfg.B_resize)
        if cfg.direction == "BtoA":
            a, b = b, a
        As.append(square(a))
        Bs.append(square(b))
    return {"A": jnp.stack(As), "B": jnp.stack(Bs)}


def _fetch_parts_matrix(parts):
    """One stacked d2h for the whole [n_losses, P] scalar block (see
    utils.metrics.fetch_stacked)."""
    from splice_tpu.utils.metrics import fetch_stacked
    return fetch_stacked(parts)


def train_pairs(cfg: Config, dataroots: Sequence[str], image_hw: int = 224,
                n_steps: Optional[int] = None,
                mesh: Optional[Mesh] = None) -> Dict[str, Any]:
    """Optimize several pairs concurrently; the step count applies to all.

    Host-loop parity with the single-pair trainer: per-pair periodic
    output.png + metrics.jsonl under each pair's dataroot (reference
    train.py:70-76 cadence, per pair), checkpoint/resume of the stacked
    states, per-pair PRNG streams (global pair id folded into the step
    key), linear/step/cosine LR schedules on device, and a per-pair
    plateau scheduler on host (each pair's lr rides in its own slice of
    the stacked opt_state hyperparams; the chunk's loss_seq feeds every
    step's per-pair loss back, chunks capped at patience+1 — the same
    cadence contract as the single-pair loop).
    """
    import time

    from splice_tpu import trainer
    from splice_tpu.utils.io import AsyncImageSaver
    from splice_tpu.utils.metrics import MetricsLogger, StepTimer

    trainer.setup_compile_cache(cfg)
    n_pairs = len(dataroots)
    if mesh is None:
        # Clamp the requested mesh to what this process can actually see:
        # a config written for a v5e-8 slice should still run (un-sharded)
        # on a single chip or in CPU tests rather than erroring.
        n_dev = len(jax.devices())
        dp = min(cfg.mesh_dp, n_pairs) or 1
        tp = cfg.mesh_tp or 1
        if tp > n_dev:
            print(f"mesh tp={tp} exceeds {n_dev} visible device(s); "
                  f"running tp=1")
            tp = 1
        if dp * tp > n_dev:
            dp_clamped = max(n_dev // tp, 1)
            print(f"mesh dp={dp} tp={tp} needs {dp * tp} devices, have "
                  f"{n_dev}; clamping dp to {dp_clamped} (pairs still "
                  f"optimize together in one compiled step)")
            dp = dp_clamped
        if n_pairs % dp != 0:
            # P("dp") shards the pair axis: dp must DIVIDE n_pairs or
            # device_put/init_states crash. Largest divisor <= dp.
            dp_div = max(d for d in range(1, dp + 1) if n_pairs % d == 0)
            print(f"dp={dp} does not divide {n_pairs} pairs; using "
                  f"dp={dp_div}")
            dp = dp_div
        mesh = mesh_lib.make_mesh(dp=dp, tp=tp)
    extractor = trainer.make_extractor_from_config(cfg)
    extractor = dataclasses.replace(
        extractor,
        params=mesh_lib.shard_vit_params(extractor.params, mesh))
    from splice_tpu.data import crop_canvas_size
    canvas = crop_canvas_size(image_hw, image_hw, cfg.crop_canvas)
    program = build_multi_pair_program(cfg, extractor, mesh, canvas)

    batch = load_pair_batch(cfg, dataroots, image_hw)
    dp_shard = mesh_lib.dp_sharding(mesh)
    As = jax.device_put(batch["A"], dp_shard)
    Bs = jax.device_put(batch["B"], dp_shard)

    seed = trainer.resolve_seed(cfg)
    key = jax.random.PRNGKey(seed)
    k_init, k_steps = jax.random.split(key)
    states = program.init_states(k_init, n_pairs)
    sched = trainer.MultiPairScheduler(cfg, n_pairs)
    plateau = cfg.scheduler_policy == "plateau"
    start_step = 0
    ckpt = None
    if cfg.checkpoint_every and cfg.checkpoint_dir:
        from splice_tpu.utils.checkpoint import Checkpointer
        ckpt = Checkpointer(cfg.checkpoint_dir)
    if cfg.resume_from:
        from splice_tpu.utils.checkpoint import Checkpointer
        rck = Checkpointer(cfg.resume_from)
        step0 = rck.latest_step()
        if step0 is not None:
            # The template is FULL host arrays ([P, ...] per leaf), so the
            # device_put below re-shards onto THIS run's mesh — a dp=4
            # checkpoint restores onto dp=2 or dp=8 (elastic re-sharding).
            template = jax.tree.map(np.asarray, states)
            if plateau:
                # Per-pair plateau (factor/best/patience) rides in the
                # checkpoint — same contract as the single-pair trainer.
                try:
                    host = rck.restore(
                        step0,
                        template={**template, "sched": sched.state_dict()})
                    sched.load_state_dict(host.pop("sched"))
                except Exception:
                    host = rck.restore(step0, template=template)
                    print("warning: checkpoint has no scheduler state; "
                          "plateau lr restarts from the base lr")
            else:
                host = rck.restore(step0, template=template)
            states = jax.device_put(host, dp_shard)
            start_step = step0
            print(f"resumed {n_pairs} pairs from {cfg.resume_from} "
                  f"at step {step0}")

    loggers = [MetricsLogger(os.path.join(r, "out", "metrics.jsonl"))
               for r in dataroots]
    saver = AsyncImageSaver()
    timer = StepTimer()

    total = n_steps if n_steps is not None else cfg.n_epochs
    t0 = time.perf_counter()
    parts = None
    entire_on = cfg.lambda_entire_ssim > 0 or cfg.lambda_entire_cls > 0

    def next_boundary(i: int) -> int:
        """Next step (exclusive) a regular chunk may run to: a lambda
        boundary (entire-A / cls_warmup), a log boundary, or a checkpoint
        boundary — same policy as the single-pair trainer."""
        cands = [total]
        if entire_on:
            cands.append(((i // cfg.entire_A_every) + 1)
                         * cfg.entire_A_every)
        if i < cfg.cls_warmup:
            cands.append(cfg.cls_warmup)
        k = (i + cfg.log_images_freq) // cfg.log_images_freq
        cands.append(k * cfg.log_images_freq)
        if ckpt is not None:
            k = (i + cfg.checkpoint_every) // cfg.checkpoint_every
            cands.append(k * cfg.checkpoint_every)
        if plateau:
            # Host feedback cadence: an lr cut only applies from the next
            # dispatch — cap chunks at patience+1 so the cut lands within
            # one patience window (single-pair boundaries_after policy).
            cands.append(i + trainer.PLATEAU_PATIENCE + 1)
        return min(c for c in cands if c > i)

    def log_boundary(step_idx: int, final: bool = False) -> None:
        outs_u8 = program.render_u8(states["params"], As)
        keys, mat = _fetch_parts_matrix(parts)
        lrs = sched.lr_for_step(step_idx - 1)
        rate = timer.rate()
        outs_host = np.asarray(outs_u8)   # one [P,H,W,3] u8 transfer
        for p, root in enumerate(dataroots):
            # the FINAL output.png must not drop under queue pressure
            saver.save(outs_host[p],
                       os.path.join(root, "out", "output.png"),
                       must_write=final)
            loggers[p].log(step_idx - 1,
                           {**{k: float(mat[j, p])
                               for j, k in enumerate(keys)},
                            "lr": float(lrs[p]), "steps_per_sec": rate})

    with jax.set_mesh(mesh):
        step_idx = start_step
        while step_idx < total:
            lam = jnp.asarray(trainer.lambdas_vec(cfg, step_idx))
            if plateau:
                # Per-pair lr written into each pair's slice of the stacked
                # opt_state hyperparams ([P] leaf, dp-sharded) — the same
                # inject_hyperparams override the single-pair loop uses,
                # just vectorized. linear/step/cosine compute lr in-trace
                # (device_lr_fn) and skip this host write.
                states["opt_state"].hyperparams["learning_rate"] = \
                    jax.device_put(
                        jnp.asarray(sched.lr_for_step(step_idx),
                                    jnp.float32), dp_shard)
            if losses_lib.is_entire_step(cfg, step_idx):
                states, parts = program.step_entire(
                    states, As, Bs, jnp.int32(step_idx), k_steps, lam)
                n = 1
            else:
                n = next_boundary(step_idx) - step_idx
                states, parts = program.step_chunk(
                    states, As, Bs, jnp.int32(step_idx), k_steps, lam, n)
            step_idx += n
            timer.tick(n)
            loss_seq = parts.pop("loss_seq", None)       # [P, n] pair-major
            if plateau:
                if loss_seq is not None:
                    mat = np.asarray(loss_seq)
                    for t in range(mat.shape[1]):
                        sched.observe(mat[:, t])
                else:
                    sched.observe(np.asarray(parts["loss"]))
            if step_idx % cfg.log_images_freq == 0 or step_idx >= total:
                log_boundary(step_idx, final=step_idx >= total)
            if ckpt is not None and step_idx % cfg.checkpoint_every == 0:
                ckpt.save(step_idx, {**states, "sched": sched.state_dict()}
                          if plateau else states)
        outs = program.render(states["params"], As)
        outs.block_until_ready()
        if parts is None:
            # Zero-step run (resume already complete): still produce the
            # per-pair output artifacts (single-pair loop parity).
            outs_host = np.asarray(program.render_u8(states["params"], As))
            for p, root in enumerate(dataroots):
                saver.save(outs_host[p],
                           os.path.join(root, "out", "output.png"),
                           must_write=True)
    wall = time.perf_counter() - t0
    if ckpt is not None:
        ckpt.wait()
    saver.close()
    for lg in loggers:
        lg.close()
    done = total - start_step
    return {"states": states, "outputs": outs,
            "losses": {k: np.asarray(v) for k, v in (parts or {}).items()},
            "steps_per_sec": done / wall if wall else float("inf"),
            "pair_steps_per_sec": done * n_pairs / wall if wall
            else float("inf"), "wall_time": wall}
