#!/usr/bin/env python
"""Feature inversion tool (capability parity with reference inversion.py
:12-94): reconstruct an image whose DINO feature — last-layer CLS token or
layer-L keys — matches a target image's, by optimizing a deeper 6-scale
reflection-pad skip net fed a fixed random noise tensor.

TPU-native design: the whole iteration (noise perturbation -> generator ->
ViT feature -> MSE -> grad -> Adam) is ONE jitted step; the staged noise
magnitude schedule (10 -> 2 -> 0.5 at the stage-1/stage-2 iteration marks,
reference inversion.py:56-62) is passed in as a traced scalar so all stages
share a single compiled program.

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
           callback=None) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from splice_tpu.data import load_image
    from splice_tpu.models import extractor as ext_lib, unet
    from splice_tpu.models.weights import load_or_init_vit_params
    from splice_tpu.ops import image as img_ops
    from splice_tpu.utils.io import save_image

    assert feature in ("cls", "keys"), feature
    img = load_image(image_path, resize)
    target_img = jnp.asarray(img)[None]
    h, w = img.shape[0], img.shape[1]

    import dataclasses as _dc
    vparams = load_or_init_vit_params(dino_model_name, vit_weights)
    extractor = ext_lib.make_extractor(dino_model_name, params=vparams)

    gcfg = unet.inversion_skip_config(input_depth)
    key = jax.random.PRNGKey(seed)
    k_init, k_noise, k_steps = jax.random.split(key, 3)
    params = unet.init_skip_params(k_init, gcfg)
    base_noise = jax.random.normal(k_noise, (1, h, w, input_depth))

    def preprocess(x):
        y = img_ops.resize(x, (224, 224) if min(h, w) == 224 else
                           img_ops.dino_resize_shape(x.shape[1], x.shape[2],
                                                     224, None))
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

    @jax.jit
    def step(params, opt_state, vp, ref, noise0, step_key, noise_mag):
        noise = noise0 + noise_mag * jax.random.normal(
            step_key, noise0.shape)

        def loss_fn(p):
            out = unet.skip_apply(p, gcfg, noise)
            f = extract(vp, out)
            return jnp.mean(jnp.square(f - ref))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def render(params, noise0, step_key, noise_mag):
        noise = noise0 + noise_mag * jax.random.normal(
            step_key, noise0.shape)
        return jnp.clip(unet.skip_apply(params, gcfg, noise)[0], 0.0, 1.0)

    t0 = time.perf_counter()
    loss = None
    for i in range(n_iter):
        if feature == "cls":
            mag = 10.0 if i < noise_stage_1 else \
                (2.0 if i < noise_stage_2 else 0.5)
        else:
            mag = 0.0
        sk = jax.random.fold_in(k_steps, i)
        params, opt_state, loss = step(params, opt_state, vparams,
                                       ref_feature, base_noise, sk,
                                       jnp.float32(mag))
        if i % log_freq == 0:
            out = render(params, base_noise, sk, jnp.float32(mag))
            save_image(np.asarray(out), save_path)
            if callback is not None:
                callback(i, float(loss), out)
    out = render(params, base_noise, jax.random.fold_in(k_steps, n_iter),
                 jnp.float32(0.0))
    save_image(np.asarray(out), save_path)
    return {"loss": float(loss) if loss is not None else None,
            "wall_time": time.perf_counter() - t0, "params": params}


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
    args = parser.parse_args()
    res = invert(args.image_path, args.save_path, args.feature, args.layer,
                 args.dino_model_name, args.vit_weights, args.input_depth,
                 args.LR, args.n_iter, args.reduce_noise_stage_1_iter,
                 args.reduce_noise_stage_2_iter, args.log_freq)
    print(f"done: final loss {res['loss']:.6f}, "
          f"{res['wall_time']:.1f}s -> {args.save_path}")


if __name__ == "__main__":
    main()
