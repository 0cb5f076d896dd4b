#!/usr/bin/env python
"""Feature inversion tool (capability parity with reference inversion.py
:12-94): reconstruct an image whose DINO feature — last-layer CLS token or
layer-L keys — matches a target image's, by optimizing a deeper 6-scale
reflection-pad skip net fed a fixed random noise tensor.

TPU-native design: the whole iteration (noise perturbation -> generator ->
ViT feature -> MSE -> grad -> Adam) is ONE jitted step, and `log_freq`
iterations run as a single `lax.scan` chunk per dispatch — through a
remote-TPU tunnel each dispatch is a network roundtrip, so the reference's
20k-iteration loop (inversion.py:49-74) would pay 20k roundtrips where this
pays n_iter/log_freq. The staged noise magnitude schedule (10 -> 2 -> 0.5 at
the stage-1/stage-2 iteration marks, reference inversion.py:56-62) is a
branchless in-trace function of the step index, so all stages share one
compiled program.

Usage:
    python -m splice_tpu.tools.inversion --feature cls \
        --image_path datasets/feature_visualization/limes.jpeg \
        --save_path out/inv.png [--n_iter 20000] [--layer 11]
"""
import functools
import time
from argparse import ArgumentParser

import numpy as np


def invert(image_path: str, save_path: str, feature: str = "cls",
           layer: int = 11, dino_model_name: str = "dino_vitb8",
           vit_weights=None, input_depth: int = 32, lr: float = 0.01,
           n_iter: int = 20000, noise_stage_1: int = 10000,
           noise_stage_2: int = 15000, log_freq: int = 100,
           seed: int = 0, resize: int = 224,
           callback=None, compute_dtype: str = "bfloat16",
           generator_layout: str = "nhwc",
           generator_conv: str = "auto",
           use_pallas_attention=None) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from splice_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from splice_tpu.data import load_image
    from splice_tpu.models import extractor as ext_lib, unet
    from splice_tpu.models.weights import load_or_init_vit_params
    from splice_tpu.ops import image as img_ops
    from splice_tpu.utils.io import AsyncImageSaver, save_image

    assert feature in ("cls", "keys"), feature
    img = load_image(image_path, resize)
    target_img = jnp.asarray(img)[None]
    h, w = img.shape[0], img.shape[1]

    import dataclasses as _dc
    # bf16 MXU compute + the Pallas attention kernel, like the trainer.
    # Unlike the trainer the generator DEFAULTS to the NHWC native-conv
    # path: the inversion net's 7x7/5x5 filters (reference inversion.py
    # :21-25) make the CHW shifted-dot formulation read its input k^2 =
    # 25-49 times per site — measured 5x slower than NHWC here, the
    # opposite of the k=3 training net. fp32 is one flag away.
    dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    if use_pallas_attention is None:
        use_pallas_attention = jax.default_backend() != "cpu"
    vparams = load_or_init_vit_params(dino_model_name, vit_weights)
    extractor = ext_lib.make_extractor(dino_model_name, params=vparams,
                                       compute_dtype=dt,
                                       use_pallas=use_pallas_attention)

    gcfg = unet.inversion_skip_config(input_depth)

    def g_apply(p, x):
        if generator_layout == "chw":
            return unet.skip_apply_chw(p, gcfg, x, dt,
                                       conv_impl=generator_conv)
        return unet.skip_apply(p, gcfg, x, dt)
    key = jax.random.PRNGKey(seed)
    k_init, k_noise, k_steps = jax.random.split(key, 3)
    params = unet.init_skip_params(k_init, gcfg)
    base_noise = jax.random.normal(k_noise, (1, h, w, input_depth))

    def preprocess(x):
        # Aspect-preserving Resize(224), no max_size (reference
        # inversion.py:29-31): identity when the shorter side is already
        # 224 — load_image(resize=224) guarantees that, so a 224x300
        # input flows through the ViT at 224x300, not squashed square.
        shape = img_ops.dino_resize_shape(x.shape[1], x.shape[2], 224, None)
        y = x if shape == (x.shape[1], x.shape[2]) else \
            img_ops.resize(x, shape)
        return img_ops.imagenet_normalize(y)

    def extract(vp, x):
        # vp passed as an argument: closure-captured ViT params would be
        # baked into the HLO as literals (huge programs, slow compiles).
        ext = _dc.replace(extractor, params=vp)
        x = preprocess(x)
        if feature == "cls":
            feats = ext._run(x, {"block": (layer,)})
            return feats["block"][layer][:, 0, :]
        return ext.get_keys_from_input(x, layer)

    ref_feature = jax.lax.stop_gradient(
        jax.jit(extract)(vparams, target_img))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def noise_mag_at(i):
        """Staged noise magnitude as a branchless function of the (traced)
        step index (reference inversion.py:56-62)."""
        if feature != "cls":
            return jnp.float32(0.0)
        return jnp.where(i < noise_stage_1, 10.0,
                         jnp.where(i < noise_stage_2, 2.0, 0.5)
                         ).astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames="n")
    def step_chunk(params, opt_state, vp, ref, noise0, key, i0, n):
        """n optimization steps in one lax.scan dispatch."""

        def body(carry, i):
            params, opt_state = carry
            noise = noise0 + noise_mag_at(i) * jax.random.normal(
                jax.random.fold_in(key, i), noise0.shape)

            def loss_fn(p):
                out = g_apply(p, noise)
                f = extract(vp, out)
                return jnp.mean(jnp.square(f.astype(jnp.float32) -
                                           ref.astype(jnp.float32)))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), i0 + jnp.arange(n))
        return params, opt_state, losses[-1]

    @jax.jit
    def render(params, noise0, step_key, noise_mag):
        noise = noise0 + noise_mag * jax.random.normal(
            step_key, noise0.shape)
        return jnp.clip(g_apply(params, noise)[0], 0.0, 1.0)

    render_u8 = jax.jit(
        lambda p, n0, k, m: img_ops.tensor2im(render(p, n0, k, m)))
    to_u8 = jax.jit(img_ops.tensor2im)  # elementwise; reuses a render

    saver = AsyncImageSaver()
    t0 = time.perf_counter()
    loss = None
    i = 0
    while i < n_iter:
        # Stop each chunk right after a step index that is ≡ 0 (mod
        # log_freq) — the reference's log cadence (inversion.py:71) — so
        # only chunk sizes {1, log_freq, remainder} ever compile.
        end = (i // log_freq) * log_freq + 1
        if end <= i:
            end += log_freq
        end = min(end, n_iter)
        params, opt_state, loss = step_chunk(
            params, opt_state, vparams, ref_feature, base_noise, k_steps,
            jnp.int32(i), end - i)
        i = end
        last = i - 1
        if last % log_freq == 0:
            sk = jax.random.fold_in(k_steps, last)
            mag = noise_mag_at(jnp.int32(last))
            # uint8 on device + the d2h in the saver thread: the dispatch
            # loop never blocks on the image transfer.
            if callback is None:
                saver.save(render_u8(params, base_noise, sk, mag),
                           save_path)
            else:
                # One full render serves both consumers (the u8 convert
                # is elementwise, not a second generator+noise forward).
                img = render(params, base_noise, sk, mag)
                saver.save(to_u8(img), save_path)
                callback(last, float(loss), img)
    out = render(params, base_noise, jax.random.fold_in(k_steps, n_iter),
                 jnp.float32(0.0))
    saver.close()
    save_image(np.asarray(out), save_path)
    return {"loss": float(loss) if loss is not None else None,
            "wall_time": time.perf_counter() - t0, "params": params,
            # geometry the frozen ViT actually saw (aspect-preserving
            # Resize(224), reference inversion.py:29-31)
            "dino_input_hw": img_ops.dino_resize_shape(h, w, 224, None)}


def main():
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--feature", type=str, default="cls",
                        help="cls | keys")
    parser.add_argument("--layer", type=int, default=11)
    parser.add_argument("--dino_model_name", type=str, default="dino_vitb8")
    parser.add_argument("--vit_weights", type=str, default=None)
    parser.add_argument("--image_path", type=str,
                        default="datasets/feature_visualization/limes.jpeg")
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--log_freq", type=int, default=100)
    parser.add_argument("--input_depth", type=int, default=32)
    parser.add_argument("--LR", type=float, default=0.01)
    parser.add_argument("--n_iter", type=int, default=20000)
    parser.add_argument("--reduce_noise_stage_1_iter", type=int,
                        default=10000)
    parser.add_argument("--reduce_noise_stage_2_iter", type=int,
                        default=15000)
    parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                        help="bfloat16 | float32 (generator + ViT)")
    parser.add_argument("--generator_layout", type=str, default="nhwc",
                        help="nhwc (native convs; best for the k7/k5 "
                             "inversion net) | chw (shifted-dot path)")
    parser.add_argument("--generator_conv", type=str, default="auto",
                        help="auto | xla | pallas | fused")
    args = parser.parse_args()
    res = invert(args.image_path, args.save_path, args.feature, args.layer,
                 args.dino_model_name, args.vit_weights, args.input_depth,
                 args.LR, args.n_iter, args.reduce_noise_stage_1_iter,
                 args.reduce_noise_stage_2_iter, args.log_freq,
                 compute_dtype=args.compute_dtype,
                 generator_layout=args.generator_layout,
                 generator_conv=args.generator_conv)
    loss_txt = ("n/a" if res["loss"] is None   # zero-iteration run
                else f"{res['loss']:.6f}")
    print(f"done: final loss {loss_txt}, "
          f"{res['wall_time']:.1f}s -> {args.save_path}")


if __name__ == "__main__":
    main()
