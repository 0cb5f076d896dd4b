"""Device mesh + sharding helpers.

The reference is strictly single-process/single-device (SURVEY.md §2
parallelism statement: no torch.distributed anywhere). Scale-out here is a
new, TPU-native capability: a ("dp", "tp") jax.sharding.Mesh where

  * dp shards independent image pairs (each pair's generator + optimizer
    state lives on its dp shard; the workload is embarrassingly parallel
    across pairs, so dp collectives are only in XLA's bookkeeping), and
  * tp shards the frozen ViT tower Megatron-style over attention heads /
    MLP hidden (qkv and fc1 column-parallel, proj and fc2 row-parallel),
    letting one big pair's ViT forwards ride several chips' MXUs over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None and dp * tp == len(jax.devices()):
        # Topology-aware placement: create_device_mesh keeps each tp
        # group on ICI-adjacent chips, so the per-block row-parallel
        # all-reduces ride neighbor links (raw jax.devices() enumeration
        # order carries no such guarantee on real slices).
        try:
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_device_mesh((dp, tp))
            return Mesh(arr, axis_names=("dp", "tp"))
        except Exception:
            pass    # odd shapes/backends: fall through to list order
    devices = list(devices if devices is not None else jax.devices())
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def vit_param_pspecs(params) -> dict:
    """PartitionSpec tree for the frozen ViT params: Megatron layout over
    the 'tp' axis, replicated over 'dp'.

    qkv/fc1 kernels are column-parallel (output dim sharded), proj/fc2
    row-parallel (input dim sharded); everything else replicated.
    """
    def spec_for(path: Tuple[str, ...], leaf) -> P:
        names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        flat = ".".join(str(n) for n in names)
        if flat.endswith("qkv.kernel") or flat.endswith("fc1.kernel"):
            return P(None, "tp")
        if flat.endswith("qkv.bias") or flat.endswith("fc1.bias"):
            return P("tp")
        if flat.endswith("proj.kernel") or flat.endswith("fc2.kernel"):
            return P("tp", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_vit_params(params, mesh: Mesh):
    """Place ViT params on the mesh with the Megatron tp layout."""
    specs = vit_param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def manual_tp_permute_vit_params(params, cfg, tp: int):
    """Column-permute the fused qkv weights shard-major for MANUAL tensor
    parallelism (vit._block tp_manual).

    The stored qkv kernel is [D, 3D] with columns [q(all heads) | k | v].
    A contiguous P(None, 'tp') slice of that mixes q/k/v of unrelated
    heads; manual shard_map needs each shard's slice to be its own
    [q_local | k_local | v_local] over a head GROUP. Regrouping
    [D,3,H,dh] -> [D,tp,3,H/tp,dh] makes the contiguous 1/tp column chunk
    exactly that. proj/fc1/fc2 need no permute: proj's input rows are
    already head-major, fc1/fc2's hidden dim is homogeneous.
    """
    if tp == 1:
        return params
    H, dh, D = cfg.num_heads, cfg.head_dim, cfg.embed_dim
    if H % tp:
        raise ValueError(f"manual tp={tp} must divide num_heads={H}")

    def permute_block(blk):
        qkv = blk["attn"]["qkv"]
        k = qkv["kernel"].reshape(D, 3, tp, H // tp, dh) \
            .transpose(0, 2, 1, 3, 4).reshape(D, 3 * D)
        b = qkv["bias"].reshape(3, tp, H // tp, dh) \
            .transpose(1, 0, 2, 3).reshape(3 * D)
        return {**blk, "attn": {**blk["attn"],
                                "qkv": {"kernel": k, "bias": b}}}

    out = dict(params)
    out["blocks"] = [permute_block(b) for b in params["blocks"]]
    return out


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def dp_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over dp (for pair-stacked arrays/state)."""
    return NamedSharding(mesh, P("dp"))
