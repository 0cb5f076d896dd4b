"""Typed configuration for splice_tpu.

Mirrors the reference flat YAML key set (reference: conf/default/config.yaml:1-39,
loaded at train.py:16-22) so reference configs load unchanged, while adding
TPU-specific knobs (precision, crop canvas policy, mesh axes, checkpointing).

Unlike the reference — which hardcodes the config path and only lets the CLI
override ``dataroot`` (reference train.py:16-22) — every key here is overridable
from the CLI (``--key value``) and from YAML.
"""
from __future__ import annotations

import dataclasses
import pathlib
from typing import Any, Optional, Sequence

import yaml


@dataclasses.dataclass
class Config:
    # --- reference-parity keys (conf/default/config.yaml) ---
    seed: int = -1                      # -1 → random seed (reference train.py:25-27)
    dataroot: str = "./datasets/splicing/cows"
    direction: str = "AtoB"             # AtoB | BtoA (reference Dataset.py:53-54)
    A_resize: int = -1                  # shorter-side resize of A, -1 = off
    B_resize: int = -1
    use_augmentations: bool = True

    global_A_crops_n_crops: int = 1
    global_A_crops_min_cover: float = 0.95
    global_B_crops_n_crops: int = 1
    global_B_crops_min_cover: float = 0.95

    init_type: str = "xavier"           # normal | xavier | kaiming | orthogonal
    init_gain: float = 0.02

    lambda_global_cls: float = 10.0
    lambda_global_ssim: float = 1.0
    lambda_global_identity: float = 1.0
    entire_A_every: int = 75
    lambda_entire_cls: float = 10.0
    lambda_entire_ssim: float = 1.0

    dino_model_name: str = "dino_vitb8"
    dino_global_patch_size: int = 224   # loss-side resize target (reference losses.py:20)

    cls_warmup: int = 1
    n_epochs: int = 10000
    scheduler_policy: str = "none"      # linear | step | plateau | cosine | none
    scheduler_n_epochs_decay: int = 8
    scheduler_lr_decay_iters: int = 300

    optimizer: str = "adam"             # adam | rmsprop | sgd
    optimizer_beta1: float = 0.0
    optimizer_beta2: float = 0.99
    lr: float = 2e-3

    log_images_freq: int = 10

    # --- TPU-native additions ---
    # Frozen-ViT weights: path to a ported checkpoint (.npz, see
    # tools/port_dino_weights.py). None → deterministic random init (the
    # pipeline still runs end to end; feature quality needs real weights).
    vit_weights: Optional[str] = None
    # Compute dtype for the frozen ViT tower ("bfloat16" rides the MXU at 2x;
    # layernorm/softmax/gram stay fp32 regardless). With "float32" the Pallas
    # attention kernels decline and attention rides XLA — the kernels' VMEM
    # tiling is sized for bf16 and fp32 spills it (measured 6.5x e2e slower
    # on the fp32 inversion path; see ops/attention.py _kernel_dtype_ok).
    vit_compute_dtype: str = "bfloat16"
    # Compute dtype for the generator convs. fp32 conv is ~8x slower on the
    # TPU MXU and the full-res generator dominates the step; params stay
    # fp32 masters and BatchNorm statistics are fp32 either way.
    generator_compute_dtype: str = "bfloat16"
    # Generator layout: "chw" computes the U-Net in [B,C,H,W] with convs as
    # shifted channel-contraction matmuls — ~2x faster than NHWC on TPU for
    # these tiny channel counts (lane padding waste). "nhwc" is the
    # torch-layout reference path used by the parity tests.
    generator_layout: str = "chw"
    # Conv implementation for the CHW generator: "auto" (default) picks per
    # conv site between the XLA shifted-dot formulation and the fused Pallas
    # TPU kernel (ops/conv_pallas.py) from v5e measurements; "xla"/"pallas"
    # force one impl everywhere (CPU always uses the XLA formulation).
    generator_conv: str = "auto"
    # Use the Pallas fused-attention kernel inside the ViT (fallback: XLA).
    use_pallas_attention: bool = True
    # Static crop canvas. The reference samples a fresh crop size every step
    # (reference transforms.py:22-23) which would retrigger XLA compilation; we
    # instead crop-and-resize on device onto a static square canvas of side
    # `crop_canvas` (0 → auto: min(H, W) rounded down to a multiple of 32).
    crop_canvas: int = 0
    # Resize antialiasing. Old torchvision tensor-Resize (the reference era)
    # did not antialias; modern versions do. True is higher quality.
    antialias: bool = True
    # Image-side resize cap, reference losses.py:20 Resize(224, max_size=480).
    dino_global_max_size: int = 480
    # Checkpointing (new capability; the reference never saves weights,
    # SURVEY.md §5). 0 disables.
    checkpoint_every: int = 0
    checkpoint_dir: Optional[str] = None
    resume_from: Optional[str] = None
    # Elastic recovery (new capability; a crash loses the whole run in the
    # reference, SURVEY.md §5): with max_restarts > 0 (and checkpointing
    # enabled) the train.py CLI runs the optimization in a child process
    # and relaunches it from the latest checkpoint after a crash — e.g. a
    # remote-device tunnel dropping mid-run — up to this many times.
    max_restarts: int = 0
    # Fault injection for testing the recovery path: raise RuntimeError
    # after crossing this step, on the FIRST attempt only (restarted
    # children see SPLICE_RESTART_ATTEMPT > 0 and run through). -1 = off.
    fault_inject_step: int = -1
    # Metrics JSONL path (None → <dataroot>/out/metrics.jsonl).
    metrics_path: Optional[str] = None
    # Pin the jax platform ("cpu"/"tpu"): applied via jax.config.update
    # BEFORE backend init (the env var is not enough for plugin backends
    # that register regardless of JAX_PLATFORMS). None = default device.
    jax_platform: Optional[str] = None
    # Remat the ViT blocks under a save-the-matmuls policy (the expensive
    # intermediates are kept, elementwise/LN recompute; models/vit.py:335).
    # ON by default: every published benchmark runs this way, and at the
    # default full-res workload (896px crop canvas) the non-remat program
    # blows XLA compile past 10 minutes. Turn off only for small canvases
    # where compile memory is not a concern.
    remat_vit: bool = True
    # Multi-pair scale-out: optimize `n_pairs` independent image pairs inside
    # one compiled step, sharded over the `dp` mesh axis (SURVEY.md §5).
    n_pairs: int = 1
    mesh_dp: int = 1                    # data-parallel axis size (pairs)
    mesh_tp: int = 1                    # tensor-parallel axis size (ViT heads)
    # Video mode: treat dataroot/A as a frame directory; warm-start each
    # frame's generator from the previous frame (BASELINE.json config 4).
    video_mode: bool = False
    # Warm video frames render/log once at frame end (intra-frame dumps'
    # async d2h drains contend with the next frame's dispatch stream
    # through a remote-TPU tunnel); set False to keep log_images_freq
    # cadence inside every frame.
    video_log_frames_only: bool = True
    # Profiling (new; the reference has no tracing at all, SURVEY.md §5):
    # capture a jax.profiler device trace of steps
    # [profile_start_step, profile_start_step + profile_n_steps).
    profile_dir: Optional[str] = None
    profile_start_step: int = 20
    profile_n_steps: int = 5
    # Persistent XLA compile cache. Each step-class/shape variant costs a
    # multi-minute TPU compile; the cache makes repeat CLI runs (and the
    # every-run tiny programs like render/init) near-instant. "" disables.
    compile_cache_dir: Optional[str] = "~/.cache/splice_tpu/xla"

    def validate(self) -> "Config":
        assert self.direction in ("AtoB", "BtoA"), self.direction
        assert self.init_type in ("normal", "xavier", "kaiming", "orthogonal")
        assert self.scheduler_policy in ("linear", "step", "plateau", "cosine", "none")
        assert self.optimizer in ("adam", "rmsprop", "sgd")
        assert self.vit_compute_dtype in ("bfloat16", "float32")
        assert self.generator_compute_dtype in ("bfloat16", "float32")
        assert self.generator_layout in ("chw", "nhwc")
        assert self.generator_conv in ("pallas", "xla", "auto", "fused")
        assert self.global_A_crops_n_crops >= 1 and self.global_B_crops_n_crops >= 1
        assert 0.0 < self.global_A_crops_min_cover <= 1.0
        assert 0.0 < self.global_B_crops_min_cover <= 1.0
        return self


_FIELDS = {f.name: f for f in dataclasses.fields(Config)}


def _coerce(name: str, value: Any) -> Any:
    f = _FIELDS[name]
    if value is None:
        # YAML 'key:' with no value parses to null — only legal for
        # Optional fields; for 'int'/'bool'/... it would surface as a
        # confusing crash deep inside the run (e.g. PRNGKey(None)).
        t = str(f.type)
        if "Optional" not in t and not t.startswith("str | None"):
            raise ValueError(
                f"config key {name!r} is null (empty YAML value) but has "
                f"non-optional type {t}; give it a value or remove it")
        return None
    t = f.type
    if t in ("int", int):
        return int(value)
    if t in ("float", float):
        return float(value)
    if t in ("bool", bool):
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        return bool(value)
    if t in ("str", str):
        return str(value)
    return value  # Optional[str] etc.


def load_config(path: Optional[str] = None,
                overrides: Optional[dict] = None) -> Config:
    """Build a Config from (optional) YAML + (optional) override dict."""
    data: dict = {}
    if path is not None:
        with open(path) as f:
            data.update(yaml.safe_load(f) or {})
    if overrides:
        data.update({k: v for k, v in overrides.items() if v is not None})
    unknown = set(data) - set(_FIELDS)
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    return Config(**{k: _coerce(k, v) for k, v in data.items()}).validate()


def add_cli_args(parser) -> None:
    """Register every config field as a --flag (CLI > YAML > default)."""
    for f in dataclasses.fields(Config):
        parser.add_argument(f"--{f.name}", type=str, default=None)


def config_from_cli(args, config_path: Optional[str] = None) -> Config:
    overrides = {f.name: getattr(args, f.name, None)
                 for f in dataclasses.fields(Config)}
    path = config_path
    default = pathlib.Path("conf/default/config.yaml")
    if path is None and default.exists():
        path = str(default)
    return load_config(path, overrides)
