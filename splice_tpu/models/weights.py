"""ViT weight porting and loading.

The reference downloads its frozen backbone at runtime via
torch.hub.load('facebookresearch/dino:main', name) (reference
models/extractor.py:20). This framework owns its backbone instead: weights
live in a local .npz produced once by `tools/port_dino_weights.py` from any
torch DINO/DINOv2 state_dict. With no checkpoint available the ViT falls
back to deterministic random init so the full pipeline stays runnable
offline (feature quality then reflects the random prior, not DINO).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from splice_tpu.models import vit as vit_lib
from splice_tpu.models.vit import VitConfig


def port_torch_state_dict(state: Mapping[str, np.ndarray],
                          cfg: VitConfig) -> Dict[str, Any]:
    """Map a facebookresearch/dino (or dinov2) torch state_dict onto our
    param pytree. Conventions converted:
      * Linear weights [out, in] -> [in, out]
      * patch-embed conv [D, 3, p, p] -> HWIO [p, p, 3, D]
    Expected torch keys: cls_token, pos_embed, patch_embed.proj.{weight,bias},
    blocks.{i}.{norm1,norm2}.{weight,bias}, blocks.{i}.attn.{qkv,proj}.*,
    blocks.{i}.mlp.{fc1,fc2}.*, norm.{weight,bias}; dinov2 adds
    blocks.{i}.ls{1,2}.gamma and register_tokens.
    """
    s = {k: np.asarray(v, np.float32) for k, v in state.items()}

    def ln(prefix):
        return {"scale": jnp.asarray(s[f"{prefix}.weight"]),
                "bias": jnp.asarray(s[f"{prefix}.bias"])}

    def linear(prefix):
        return {"kernel": jnp.asarray(s[f"{prefix}.weight"].T),
                "bias": jnp.asarray(s[f"{prefix}.bias"])}

    params: Dict[str, Any] = {
        "cls_token": jnp.asarray(s["cls_token"]),
        "pos_embed": jnp.asarray(s["pos_embed"]),
        "patch_embed": {
            "kernel": jnp.asarray(
                s["patch_embed.proj.weight"].transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(s["patch_embed.proj.bias"]),
        },
        "norm": ln("norm"),
        "blocks": [],
    }
    if ("register_tokens" in s) != bool(cfg.num_register_tokens):
        raise ValueError(
            "register-token mismatch: the checkpoint "
            f"{'has' if 'register_tokens' in s else 'lacks'} register_tokens "
            f"but the config expects {cfg.num_register_tokens}; use the "
            "matching model name (e.g. dinov2_vitb14_reg for a "
            "with-registers checkpoint) — silently dropping registers "
            "would run the ViT on a token layout it was never trained on")
    if "register_tokens" in s:
        params["register_tokens"] = jnp.asarray(s["register_tokens"])
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        blk = {
            "norm1": ln(f"{p}.norm1"),
            "attn": {"qkv": linear(f"{p}.attn.qkv"),
                     "proj": linear(f"{p}.attn.proj")},
            "norm2": ln(f"{p}.norm2"),
            "mlp": {"fc1": linear(f"{p}.mlp.fc1"),
                    "fc2": linear(f"{p}.mlp.fc2")},
        }
        if f"{p}.ls1.gamma" in s:
            blk["ls1"] = jnp.asarray(s[f"{p}.ls1.gamma"])
            blk["ls2"] = jnp.asarray(s[f"{p}.ls2.gamma"])
        elif cfg.layerscale_init is not None:
            blk["ls1"] = jnp.full((cfg.embed_dim,), cfg.layerscale_init)
            blk["ls2"] = jnp.full((cfg.embed_dim,), cfg.layerscale_init)
        params["blocks"].append(blk)
    return params


# ---------------------------------------------------------------------------
# Flat npz serialization of the param pytree
# ---------------------------------------------------------------------------

def _flatten(params: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in params.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, name + "."))
        elif isinstance(v, list):
            for i, item in enumerate(v):
                flat.update(_flatten(item, f"{name}.{i}."))
        else:
            flat[name] = np.asarray(v)
    return flat


def save_vit_params(path: str, params: Dict[str, Any],
                    model_name: str) -> None:
    flat = _flatten(params)
    flat["__model_name__"] = np.asarray(model_name)
    np.savez(path, **flat)


def load_vit_params(path: str,
                    model_name: Optional[str] = None) -> Dict[str, Any]:
    data = np.load(path, allow_pickle=False)
    stored = str(data["__model_name__"]) if "__model_name__" in data else None
    name = model_name or stored
    if model_name and stored and model_name != stored:
        raise ValueError(f"checkpoint is for {stored}, requested {model_name}")
    cfg = vit_lib.get_vit_config(name)
    params: Dict[str, Any] = {
        "cls_token": jnp.asarray(data["cls_token"]),
        "pos_embed": jnp.asarray(data["pos_embed"]),
        "patch_embed": {"kernel": jnp.asarray(data["patch_embed.kernel"]),
                        "bias": jnp.asarray(data["patch_embed.bias"])},
        "norm": {"scale": jnp.asarray(data["norm.scale"]),
                 "bias": jnp.asarray(data["norm.bias"])},
        "blocks": [],
    }
    if ("register_tokens" in data) != bool(cfg.num_register_tokens):
        raise ValueError(
            "register-token mismatch between checkpoint "
            f"{path!r} and model {name!r} (expects "
            f"{cfg.num_register_tokens} registers); use the matching "
            "model name (e.g. dinov2_vitb14_reg)")
    if "register_tokens" in data:
        params["register_tokens"] = jnp.asarray(data["register_tokens"])
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        blk = {
            "norm1": {"scale": jnp.asarray(data[f"{p}.norm1.scale"]),
                      "bias": jnp.asarray(data[f"{p}.norm1.bias"])},
            "attn": {
                "qkv": {"kernel": jnp.asarray(data[f"{p}.attn.qkv.kernel"]),
                        "bias": jnp.asarray(data[f"{p}.attn.qkv.bias"])},
                "proj": {"kernel": jnp.asarray(data[f"{p}.attn.proj.kernel"]),
                         "bias": jnp.asarray(data[f"{p}.attn.proj.bias"])},
            },
            "norm2": {"scale": jnp.asarray(data[f"{p}.norm2.scale"]),
                      "bias": jnp.asarray(data[f"{p}.norm2.bias"])},
            "mlp": {
                "fc1": {"kernel": jnp.asarray(data[f"{p}.mlp.fc1.kernel"]),
                        "bias": jnp.asarray(data[f"{p}.mlp.fc1.bias"])},
                "fc2": {"kernel": jnp.asarray(data[f"{p}.mlp.fc2.kernel"]),
                        "bias": jnp.asarray(data[f"{p}.mlp.fc2.bias"])},
            },
        }
        if f"{p}.ls1" in data:
            blk["ls1"] = jnp.asarray(data[f"{p}.ls1"])
            blk["ls2"] = jnp.asarray(data[f"{p}.ls2"])
        params["blocks"].append(blk)
    return params


def load_or_init_vit_params(model_name: str, weights_path: Optional[str],
                            seed: int = 0) -> Dict[str, Any]:
    cfg = vit_lib.get_vit_config(model_name)
    if weights_path and os.path.exists(weights_path):
        return load_vit_params(weights_path, model_name)
    if weights_path:
        raise FileNotFoundError(
            f"vit_weights={weights_path!r} not found; run "
            f"tools/port_dino_weights.py to create it")
    return vit_lib.init_vit_params(jax.random.PRNGKey(seed), cfg)
