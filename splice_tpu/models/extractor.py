"""Functional feature-extraction API over the ViT, mirroring the reference's
`VitExtractor` surface (reference models/extractor.py:12-163) without its
48-hooks-per-call machinery: each accessor runs ONE forward that returns only
the requested tap, inside whatever jit/grad context the caller is in.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from splice_tpu.models import vit as vit_lib
from splice_tpu.models.vit import VitConfig


def attn_cosine_sim(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Cosine-similarity Gram matrix (reference models/extractor.py:4-9).

    x: [..., T, D] -> [..., T, T]. Denominator is clamped at eps exactly like
    the reference (torch.clamp(norm @ norm.T, min=eps)). fp32 throughout —
    the Gram feeds an MSE loss and is precision-sensitive.

    Unlike the reference free function — which strips a leading dim with
    `x[0]` forcing callers to wrap inputs as [None, None, ...] (reference
    extractor.py:5,162) — this operates on the given trailing [T, D] axes
    and broadcasts over any leading axes.
    """
    x = x.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST    # the Gram feeds an MSE loss: exact fp32
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)            # [..., T, 1]
    factor = jnp.clip(
        jnp.matmul(norm, jnp.swapaxes(norm, -1, -2), precision=hi),
        a_min=eps)
    return jnp.matmul(x, jnp.swapaxes(x, -1, -2), precision=hi) / factor


def qkv_split(qkv: jax.Array, num_heads: int) -> Tuple[jax.Array, ...]:
    """[..., N, 3D] -> (q, k, v) each [..., H, N, dh].

    The reference reshapes [N, 3D] -> [N, 3, H, dh] -> permute
    (extractor.py:139-144); identical index math here, batched.
    """
    *lead, N, threeD = qkv.shape
    D = threeD // 3
    dh = D // num_heads
    x = qkv.reshape(*lead, N, 3, num_heads, dh)
    perm = list(range(len(lead))) + [len(lead) + 1, len(lead) + 2,
                                     len(lead) + 0, len(lead) + 3]
    x = jnp.transpose(x, perm)                                   # [...,3,H,N,dh]
    return x[..., 0, :, :, :], x[..., 1, :, :, :], x[..., 2, :, :, :]


def keys_from_qkv(qkv: jax.Array, num_heads: int) -> jax.Array:
    """[..., N, 3D] -> keys [..., H, N, dh] (reference extractor.py:139-144)."""
    return qkv_split(qkv, num_heads)[1]


def concat_heads(keys: jax.Array) -> jax.Array:
    """[..., H, N, dh] -> [..., N, H*dh] (reference extractor.py:160-161)."""
    x = jnp.swapaxes(keys, -3, -2)                               # [..., N, H, dh]
    return x.reshape(*x.shape[:-2], x.shape[-2] * x.shape[-1])


def keys_self_sim(keys: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Head-concatenated cosine-sim Gram of keys, CLS row included
    (reference extractor.py:158-163): [..., H, N, dh] -> [..., N, N]."""
    return attn_cosine_sim(concat_heads(keys), eps)


@dataclasses.dataclass
class VitExtractor:
    """Stateless, functional mirror of the reference VitExtractor
    (reference models/extractor.py:12-163). Holds frozen params + config;
    every accessor is a pure function of the input image batch and is safe
    to call under jit/grad/vmap.

    Images are NHWC float, already resized+ImageNet-normalized (the caller
    owns preprocessing, as in the reference where LossG does it,
    losses.py:17-24).
    """
    params: Dict[str, Any]
    cfg: VitConfig
    model_name: str = "dino_vitb8"
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False
    remat: bool = False
    tp_axis: Any = None      # mesh axis name for ViT tensor parallelism
    # mesh axis name for MANUAL tp inside a fully-manual shard_map region
    # (params must be the permuted local slices; keeps Pallas kernels alive
    # under tp>1 — see vit._block tp_manual)
    tp_manual: Any = None

    def _run(self, images, taps, final_norm=False):
        return vit_lib.vit_forward(
            self.params, images, self.cfg, taps,
            compute_dtype=self.compute_dtype, use_pallas=self.use_pallas,
            remat=self.remat, final_norm=final_norm, tp_axis=self.tp_axis,
            tp_manual=self.tp_manual)

    # -- geometry helpers (reference extractor.py:105-130) --
    def get_patch_size(self) -> int:
        return self.cfg.patch_size

    def get_width_patch_num(self, input_shape) -> int:
        return input_shape[-2] // self.cfg.patch_size   # NHWC: W at -2

    def get_height_patch_num(self, input_shape) -> int:
        return input_shape[-3] // self.cfg.patch_size

    def get_patch_num(self, input_shape) -> int:
        return 1 + (self.get_height_patch_num(input_shape)
                    * self.get_width_patch_num(input_shape))

    def get_head_num(self) -> int:
        return self.cfg.num_heads

    def get_embedding_dim(self) -> int:
        return self.cfg.embed_dim

    # -- feature accessors --
    def get_feature_from_input(self, images) -> List[jax.Array]:
        """All block outputs, list of [B, N, D] (reference extractor.py:81-87).
        Block outputs are pre-final-norm, matching the reference hooks."""
        out = self._run(images, {"block": tuple(range(self.cfg.depth))})
        return [out["block"][i] for i in range(self.cfg.depth)]

    def get_qkv_feature_from_input(self, images) -> List[jax.Array]:
        out = self._run(images, {"qkv": tuple(range(self.cfg.depth))})
        return [out["qkv"][i] for i in range(self.cfg.depth)]

    def get_attn_feature_from_input(self, images) -> List[jax.Array]:
        out = self._run(images, {"attn_probs": tuple(range(self.cfg.depth))})
        return [out["attn_probs"][i] for i in range(self.cfg.depth)]

    def get_keys_from_input(self, images, layer_num: int) -> jax.Array:
        """Keys of one layer: [B, H, N, dh] (reference extractor.py:153-156
        returns [H, N, dh] for batch 1; we keep the batch axis)."""
        out = self._run(images, {"qkv": (layer_num,)})
        return keys_from_qkv(out["qkv"][layer_num], self.cfg.num_heads)

    def get_keys_self_sim_from_input(self, images, layer_num: int) -> jax.Array:
        """[B, N, N] keys self-similarity (reference extractor.py:158-163)."""
        return keys_self_sim(self.get_keys_from_input(images, layer_num))

    def get_cls_token_from_input(self, images) -> jax.Array:
        """Last-block CLS token [B, D] — what the appearance loss consumes
        (reference losses.py:90: get_feature_from_input(...)[-1][0, 0, :])."""
        out = self._run(images, {"block": (self.cfg.depth - 1,)})
        return out["block"][self.cfg.depth - 1][:, 0, :]


def make_extractor(model_name: str, params=None, key=None,
                   compute_dtype=jnp.float32, use_pallas: bool = False,
                   remat: bool = False) -> VitExtractor:
    cfg = vit_lib.get_vit_config(model_name)
    if params is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        params = vit_lib.init_vit_params(key, cfg)
    return VitExtractor(params=params, cfg=cfg, model_name=model_name,
                        compute_dtype=compute_dtype, use_pallas=use_pallas,
                        remat=remat)
