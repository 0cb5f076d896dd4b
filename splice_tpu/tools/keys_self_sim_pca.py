#!/usr/bin/env python
"""Keys self-similarity PCA visualizer (capability parity with reference
keys_self_sim_pca.py:12-59): compute the layer-L keys self-sim Gram of an
image, project to 3 PCA components, render as an RGB heat image.

TPU-native differences: the Gram comes from one jitted ViT forward (no
hooks), and PCA is a 40-line SVD on the host (no sklearn dependency).

Usage:
    python -m splice_tpu.tools.keys_self_sim_pca \
        --image_path datasets/feature_visualization/limes.jpeg \
        --save_path out/pca.png [--layer 11] [--dino_model_name dino_vitb8]
"""
from argparse import ArgumentParser

import numpy as np


def pca_project(x: np.ndarray, n_components: int = 3) -> np.ndarray:
    """PCA via SVD of the centered matrix: x [N, D] -> [N, n_components]."""
    mu = x.mean(axis=0, keepdims=True)
    xc = x - mu
    u, s, vt = np.linalg.svd(xc, full_matrices=False)
    return xc @ vt[:n_components].T


def visualize(image_path: str, save_path: str, layer: int = 11,
              dino_model_name: str = "dino_vitb8",
              vit_weights=None, resize: int = 224) -> str:
    import jax.numpy as jnp
    from PIL import Image

    from splice_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from splice_tpu.data import load_image
    from splice_tpu.models import extractor as ext_lib
    from splice_tpu.models.weights import load_or_init_vit_params
    from splice_tpu.ops import image as img_ops

    img = load_image(image_path, resize)
    x = img_ops.imagenet_normalize(jnp.asarray(img))[None]

    params = load_or_init_vit_params(dino_model_name, vit_weights)
    e = ext_lib.make_extractor(dino_model_name, params=params)
    ssim = np.asarray(e.get_keys_self_sim_from_input(x, layer)[0])  # [N,N]

    reduced = pca_project(ssim, 3)
    p = e.get_patch_size()
    gh, gw = img.shape[0] // p, img.shape[1] // p
    # drop the CLS row (reference keys_self_sim_pca.py:40), grid-reshape
    grid = reduced[1:].reshape(gh, gw, 3)
    grid = (grid - grid.min()) / max(grid.max() - grid.min(), 1e-12)
    out = Image.fromarray(np.uint8(grid * 255)).resize(
        (gw * p, gh * p), Image.BILINEAR)
    import pathlib
    pathlib.Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    out.save(save_path)
    return save_path


def main():
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--image_path", type=str,
                        default="datasets/feature_visualization/limes.jpeg")
    parser.add_argument("--layer", type=int, default=11)
    parser.add_argument("--dino_model_name", type=str, default="dino_vitb8")
    parser.add_argument("--vit_weights", type=str, default=None)
    parser.add_argument("--save_path", type=str, required=True)
    args = parser.parse_args()
    path = visualize(args.image_path, args.save_path, args.layer,
                     args.dino_model_name, args.vit_weights)
    print(f"saved {path}")


if __name__ == "__main__":
    main()
