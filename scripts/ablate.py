"""Single-flag ablation bench: 200-step window, 1 seed, warm cache.
Usage: python scripts/ablate.py [mode ...]   (unknown modes ->
unet.STRIDE2_CONV_MODE). Several modes combine, e.g.
`ablate.py nosamekern kw512`.
"""
import pathlib as _pathlib
import sys as _sys
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from splice_tpu.models import unet, vit
from splice_tpu.ops import attention, conv_pallas
label = "default"
cfg_extra = {}
for mode in sys.argv[1:]:
    label = "+".join(sys.argv[1:])
    if mode in ("slice", "major", "permdot"):
        unet.STRIDE2_PHASE_MODE = mode
    elif mode in ("ln_save", "ln_nosave", "ln_inv", "ln_mean"):
        vit.SAVE_LN_STATS = {"ln_save": True, "ln_nosave": False,
                             "ln_inv": "inv", "ln_mean": "mean"}[mode]
    elif mode == "fused":
        cfg_extra["generator_conv"] = "fused"
    elif mode == "nopack":
        attention.PACK_QK_K128 = False
    elif mode == "nosamekern":
        # disables the SAME-border kernels -> falls back to the
        # pre-padded VALID kernel path
        conv_pallas.SAME_BORDER_KERNELS = False
    elif mode.startswith("kw"):
        unet.PALLAS_MIN_WIDTH = int(mode[2:])
    elif mode == "nodwtap":
        conv_pallas.DW_TAP_ON_N = False
    elif mode == "padstream":
        vit.PAD_TOKEN_STREAM = True
    elif mode == "xlaattn":
        cfg_extra["use_pallas_attention"] = False
    elif mode.startswith("cu"):
        pass  # applied below, after trainer import
    elif mode.startswith("bu"):
        vit.BLOCK_SCAN_UNROLL = int(mode[2:])
    elif mode.startswith("tb"):
        conv_pallas.TILE_BUDGET_BYTES = int(mode[2:]) * 1024 * 1024
    else:
        unet.STRIDE2_CONV_MODE = mode

from splice_tpu import trainer
from splice_tpu.config import load_config
from splice_tpu.data import load_pair

for mode in sys.argv[1:]:
    if mode.startswith("cu"):
        trainer.CHUNK_SCAN_UNROLL = int(mode[2:])

cfg = load_config(None, {**dict(
    dataroot="datasets/splicing/cows", seed=3,
    vit_compute_dtype="bfloat16", use_pallas_attention=True,
    remat_vit=True), **cfg_extra})
pair = load_pair(cfg)
extractor = trainer.make_extractor_from_config(cfg)
program = trainer.build_program(cfg, pair, extractor)
state = program.init_state(jax.random.PRNGKey(3))
key = jax.random.PRNGKey(4)
lam = jnp.asarray(trainer.lambdas_vec(cfg, 5))
CH = 10
state, parts = program.step_chunk(state, pair.A, pair.B, jnp.int32(1),
                                  key, lam, CH)
_ = float(parts["loss"])
t0 = time.perf_counter()
i = 1 + CH
for _n in range(20):
    state, parts = program.step_chunk(state, pair.A, pair.B, jnp.int32(i),
                                      key, lam, CH)
    i += CH
loss = float(parts["loss"])
wall = time.perf_counter() - t0
print(f"mode={label}: {200/wall:.2f} steps/s  loss={loss:.4f}")
