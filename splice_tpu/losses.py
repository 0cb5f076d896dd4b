"""Splice loss system, TPU-native.

Three loss kernels (reference util/losses.py:74-105):
  * structure: MSE between keys-self-similarity Grams (layer 11) of the
    generated image and the (stop-gradient) structure input.
  * appearance: MSE between last-block CLS tokens of the generated image and
    the (stop-gradient) appearance target.
  * identity: MSE between raw layer-11 keys of G(B) and B.

Two call paths:
  * `LossG` — API-parity class mirroring the reference signature
    (forward(outputs, inputs) -> dict) with per-crop looping replaced by
    batching. Used by tools/tests.
  * `splice_losses_fused` — the hot path: ONE batched frozen-ViT forward
    serves all three losses. The reference runs ~6 sequential batch-1 ViT
    forwards per step and even re-runs the ViT on the same generated crop
    for the structure and appearance losses separately (losses.py:81 vs 90);
    here the generated A-crop's single forward yields both its keys and its
    CLS token, and all crops/targets ride one batch onto the MXU.

Per-crop reduction is SUM of per-crop MSEs, matching the reference's
`loss += F.mse_loss(...)` accumulation (losses.py:76-83).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from splice_tpu.models import extractor as ext
from splice_tpu.ops import image as img_ops


# ---------------------------------------------------------------------------
# Lambda schedule (reference losses.py:26-44) — as data, host-side
# ---------------------------------------------------------------------------

LAMBDA_KEYS = ("lambda_global_cls", "lambda_global_ssim",
               "lambda_global_identity", "lambda_entire_cls",
               "lambda_entire_ssim")


def lambdas_for_step(cfg, step: int) -> Dict[str, float]:
    """Replicates the reference's stateful update_lambda_config as a pure
    function of the step index (0-based, as the dataset's counter:
    reference Dataset.py:57,63).

    step 0: cls + entire losses on (0 % entire_A_every == 0); ssim/identity
    join at step == cls_warmup and stay on (SURVEY.md §2 step-0 schedule).
    """
    lam = {
        "lambda_global_cls": float(cfg.lambda_global_cls),
        "lambda_global_ssim": float(cfg.lambda_global_ssim)
        if step >= cfg.cls_warmup else 0.0,
        "lambda_global_identity": float(cfg.lambda_global_identity)
        if step >= cfg.cls_warmup else 0.0,
        "lambda_entire_cls": 0.0,
        "lambda_entire_ssim": 0.0,
    }
    if step % cfg.entire_A_every == 0:
        lam["lambda_entire_cls"] = float(cfg.lambda_entire_cls)
        lam["lambda_entire_ssim"] = float(cfg.lambda_entire_ssim)
    return lam


def is_entire_step(cfg, step: int) -> bool:
    """The reference computes x_entire when lambda_entire_ssim > 0 and
    step % entire_A_every == 0 (model.py:19). NOTE the reference gates only
    on lambda_entire_ssim yet loss_entire_cls also consumes x_entire — with
    ssim=0, cls>0 the reference would KeyError (SURVEY.md §2 gating
    asymmetry); we gate on either lambda being positive."""
    return (step % cfg.entire_A_every == 0
            and (cfg.lambda_entire_ssim > 0 or cfg.lambda_entire_cls > 0))


# ---------------------------------------------------------------------------
# Pure loss kernels
# ---------------------------------------------------------------------------

def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a.astype(jnp.float32)
                               - b.astype(jnp.float32)))


def per_crop_mse_sum(a: jax.Array, b: jax.Array) -> jax.Array:
    """Sum over the leading (crop) axis of per-crop MSEs."""
    n = a.shape[0]
    d = jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32))
    return jnp.sum(jnp.mean(d.reshape(n, -1), axis=-1))


def structure_loss(gen_keys: jax.Array, tgt_keys: jax.Array) -> jax.Array:
    """Keys self-sim Gram MSE (reference losses.py:74-83). keys: [n,H,T,dh];
    target side is stop-gradiented (reference computes it under no_grad)."""
    g = ext.keys_self_sim(gen_keys)
    t = jax.lax.stop_gradient(ext.keys_self_sim(tgt_keys))
    return per_crop_mse_sum(g, t)


def appearance_loss(gen_cls: jax.Array, tgt_cls: jax.Array) -> jax.Array:
    """CLS-token MSE (reference losses.py:85-94). cls: [n, D]."""
    return per_crop_mse_sum(gen_cls, jax.lax.stop_gradient(tgt_cls))


def identity_loss(gen_keys: jax.Array, tgt_keys: jax.Array) -> jax.Array:
    """Raw layer-11 keys MSE of G(B) vs B (reference losses.py:96-105)."""
    return per_crop_mse_sum(gen_keys, jax.lax.stop_gradient(tgt_keys))


# ---------------------------------------------------------------------------
# Fused hot path
# ---------------------------------------------------------------------------

def splice_losses_fused(
        extractor: ext.VitExtractor,
        gen_A: jax.Array, crops_A: jax.Array,
        gen_B: jax.Array, crops_B: jax.Array,
        ssim_layer: Optional[int] = None,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """All three global losses from ONE batched ViT forward.
    Returns (losses dict, aux dict).

    Inputs are 224-resized, ImageNet-normalized NHWC batches of identical
    spatial shape: gen_A = G(A crops) [n,h,w,3], crops_A = the A crops
    themselves, gen_B = G(B crops), crops_B = the B crops. Targets are
    stop-gradiented here; generated branches carry gradients through the
    frozen ViT (reference losses.py:79-81,91-92,101-103).
    """
    cfg = extractor.cfg
    layer = cfg.depth - 1 if ssim_layer is None else ssim_layer
    n = gen_A.shape[0]
    m = gen_B.shape[0]
    taps = {"qkv": (layer,), "block": (cfg.depth - 1,)}
    # Two batched forwards: generated entries (carry grad through the
    # frozen ViT, reference losses.py:81,90,103) and targets (no_grad,
    # losses.py:79-80,91-92,101-102). Keeping the targets OUT of the
    # differentiated batch halves the ViT backward: batch entries share
    # matmuls, so stop_gradient alone would still backprop a 2x batch.
    gen_feats = extractor._run(jnp.concatenate([gen_A, gen_B], axis=0),
                               taps)
    tgt_feats = jax.lax.stop_gradient(extractor._run(
        jnp.concatenate([crops_A, crops_B], axis=0), taps))
    gen_keys = ext.keys_from_qkv(gen_feats["qkv"][layer], cfg.num_heads)
    tgt_keys = ext.keys_from_qkv(tgt_feats["qkv"][layer], cfg.num_heads)
    gen_cls = gen_feats["block"][cfg.depth - 1][:, 0, :]
    tgt_cls = tgt_feats["block"][cfg.depth - 1][:, 0, :]

    k_genA, k_genB = gen_keys[:n], gen_keys[n:]
    k_A, k_B = tgt_keys[:n], tgt_keys[n:]
    cls_genA = gen_cls[:n]
    cls_B = tgt_cls[n:]

    # Appearance targets: reference zips gen crops with B crops; with
    # unequal counts torch's zip truncates — we truncate likewise.
    nm = min(n, m)
    losses = {
        "loss_global_ssim": structure_loss(k_genA, k_A),
        "loss_global_cls": appearance_loss(cls_genA[:nm], cls_B[:nm]),
        "loss_global_id_B": identity_loss(k_genB, k_B),
    }
    # cls_B is reused as the entire-cls target on entire-A steps — no extra
    # ViT forward needed there.
    aux = {"cls_B": jax.lax.stop_gradient(cls_B)}
    return losses, aux


def entire_losses_fused(extractor: ext.VitExtractor,
                        gen_entire: jax.Array, entire_A: jax.Array,
                        cls_B_targets: jax.Array,
                        ssim_layer: Optional[int] = None) -> Dict[str, jax.Array]:
    """Entire-image losses (reference losses.py:55-61), one batch-2 forward.

    gen_entire/entire_A: [1, h, w, 3] resized+normalized full-image pair.
    cls_B_targets: [m, D] CLS tokens of the B crops from the main batch —
    loss_entire_cls compares x_entire against B_global crops, NOT full B
    (reference losses.py:60, SURVEY.md §2). Because the reference zips the
    single x_entire against the crop stack, only the FIRST B crop
    participates (losses.py:87: zip truncates at the shorter sequence).
    """
    cfg = extractor.cfg
    layer = cfg.depth - 1 if ssim_layer is None else ssim_layer
    taps = {"qkv": (layer,), "block": (cfg.depth - 1,)}
    gen_feats = extractor._run(gen_entire, taps)
    tgt_feats = jax.lax.stop_gradient(extractor._run(entire_A, taps))
    gen_keys = ext.keys_from_qkv(gen_feats["qkv"][layer], cfg.num_heads)
    tgt_keys = ext.keys_from_qkv(tgt_feats["qkv"][layer], cfg.num_heads)
    cls_gen = gen_feats["block"][cfg.depth - 1][:1, 0, :]
    return {
        "loss_entire_ssim": structure_loss(gen_keys, tgt_keys),
        "loss_entire_cls": appearance_loss(cls_gen, cls_B_targets[:1]),
    }


def weighted_total(losses: Dict[str, jax.Array],
                   lambdas: Dict[str, Any]) -> jax.Array:
    """loss = sum of lambda-weighted terms (reference losses.py:46-72)."""
    total = 0.0
    mapping = {
        "loss_global_cls": "lambda_global_cls",
        "loss_global_ssim": "lambda_global_ssim",
        "loss_global_id_B": "lambda_global_identity",
        "loss_entire_cls": "lambda_entire_cls",
        "loss_entire_ssim": "lambda_entire_ssim",
    }
    for name, value in losses.items():
        lam = lambdas.get(mapping[name], 0.0)
        total = total + lam * value
    return total


# ---------------------------------------------------------------------------
# API-parity class (reference util/losses.py:11-105)
# ---------------------------------------------------------------------------

class LossG:
    """Drop-in analogue of the reference LossG for tools and tests.

    forward(outputs, inputs) takes the reference's dict shapes
    (outputs: x_global/x_entire/y_global; inputs: A/A_global/B_global/step,
    NHWC here) and returns the same loss-dict keys. Crop loops are batched.
    """

    def __init__(self, cfg, extractor: ext.VitExtractor):
        self.cfg = cfg
        self.extractor = extractor
        self.ssim_layer = extractor.cfg.depth - 1
        self.lambdas = lambdas_for_step(cfg, 0)

    def update_lambda_config(self, step: int) -> None:
        """API parity with the reference's stateful schedule update
        (reference losses.py:34-44); __call__ recomputes from the step
        anyway, so this only refreshes the inspectable `lambdas` dict."""
        self.lambdas = lambdas_for_step(self.cfg, step)

    def _transform(self, x):
        y = img_ops.dino_global_resize(
            x, self.cfg.dino_global_patch_size, self.cfg.dino_global_max_size,
            antialias=self.cfg.antialias)
        return img_ops.imagenet_normalize(y)

    def calculate_global_ssim_loss(self, outputs, inputs):
        g = self.extractor.get_keys_from_input(self._transform(outputs),
                                               self.ssim_layer)
        t = self.extractor.get_keys_from_input(self._transform(inputs),
                                               self.ssim_layer)
        return structure_loss(g, t)

    def calculate_crop_cls_loss(self, outputs, inputs):
        # reference losses.py:87 zips the two crop stacks — unequal
        # counts truncate to the shorter one (the fused path does the
        # same with nm = min(n, m)).
        nm = min(outputs.shape[0], inputs.shape[0])
        g = self.extractor.get_cls_token_from_input(
            self._transform(outputs[:nm]))
        t = self.extractor.get_cls_token_from_input(
            self._transform(inputs[:nm]))
        return appearance_loss(g, t)

    def calculate_global_id_loss(self, outputs, inputs):
        g = self.extractor.get_keys_from_input(self._transform(outputs),
                                               self.ssim_layer)
        t = self.extractor.get_keys_from_input(self._transform(inputs),
                                               self.ssim_layer)
        return identity_loss(g, t)

    def __call__(self, outputs: Dict[str, jax.Array],
                 inputs: Dict[str, Any]) -> Dict[str, jax.Array]:
        step = int(inputs["step"])
        lam = lambdas_for_step(self.cfg, step)
        losses: Dict[str, jax.Array] = {}
        if lam["lambda_global_ssim"] > 0:
            losses["loss_global_ssim"] = self.calculate_global_ssim_loss(
                outputs["x_global"], inputs["A_global"])
        if lam["lambda_entire_ssim"] > 0:
            losses["loss_entire_ssim"] = self.calculate_global_ssim_loss(
                outputs["x_entire"], inputs["A"])
        if lam["lambda_entire_cls"] > 0:
            # zip(x_entire, B_global) truncates at the single entire image
            # (reference losses.py:87) — only the first B crop participates.
            losses["loss_entire_cls"] = self.calculate_crop_cls_loss(
                outputs["x_entire"][:1], inputs["B_global"][:1])
        if lam["lambda_global_cls"] > 0:
            losses["loss_global_cls"] = self.calculate_crop_cls_loss(
                outputs["x_global"], inputs["B_global"])
        if lam["lambda_global_identity"] > 0:
            losses["loss_global_id_B"] = self.calculate_global_id_loss(
                outputs["y_global"], inputs["B_global"])
        losses["loss"] = weighted_total(
            {k: v for k, v in losses.items() if k != "loss"}, lam)
        return losses
