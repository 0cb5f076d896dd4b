"""Unit tests for on-device preprocessing ops (splice_tpu/ops/image.py),
with golden values from torch functional ops where cross-checkable."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splice_tpu.ops import image as im


class TestDinoResizeShape:
    def test_square(self):
        assert im.dino_resize_shape(256, 256) == (224, 224)

    def test_landscape(self):
        # 900x1200: shorter 900 -> 224, longer int(298.67) = 298 (<480);
        # torchvision truncates (int(), not round()).
        assert im.dino_resize_shape(900, 1200) == (224, 298)

    def test_max_size_cap(self):
        # 200x1000: plain resize would give (224, 1120) -> cap long to 480
        h, w = im.dino_resize_shape(200, 1000)
        assert w == 480 and h == round(480 * 224 / 1120)

    def test_portrait(self):
        assert im.dino_resize_shape(1200, 900) == (298, 224)


class TestResizeVsTorch:
    def test_bilinear_matches_torch_no_antialias(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        rng = np.random.default_rng(0)
        x = rng.random((1, 32, 48, 3), np.float32)
        ours = im.resize(jnp.asarray(x), (64, 96), antialias=False)
        theirs = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                               size=(64, 96), mode="bilinear",
                               align_corners=False)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_downscale_antialias_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        rng = np.random.default_rng(1)
        x = rng.random((1, 64, 64, 3), np.float32)
        ours = im.resize(jnp.asarray(x), (32, 32), antialias=True)
        theirs = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                               size=(32, 32), mode="bilinear",
                               align_corners=False, antialias=True)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


class TestNormalize:
    def test_imagenet(self):
        x = jnp.ones((2, 4, 4, 3)) * 0.5
        y = im.imagenet_normalize(x)
        expect = (0.5 - np.array(im.IMAGENET_MEAN)) / np.array(im.IMAGENET_STD)
        np.testing.assert_allclose(np.asarray(y[0, 0, 0]), expect, atol=1e-6)


class TestCropAndResize:
    def test_identity_window(self):
        """Full-image window at canvas == image size is the identity."""
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.random((32, 32, 3), np.float32))
        out = im.crop_and_resize(x, 0.0, 0.0, 32.0, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_integer_crop_no_resize(self):
        """Integer window whose size equals the canvas == plain slicing."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((40, 40, 3), np.float32))
        out = im.crop_and_resize(x, 5.0, 7.0, 16.0, 16)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(x[5:21, 7:23]), atol=1e-5)

    def test_crop_then_upscale_matches_two_step_interior(self):
        """Fused crop+resize == crop-then-resize except the outermost output
        ring, where the fused path samples true neighboring image pixels
        instead of edge-clamping at the crop border."""
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.random((40, 40, 3), np.float32))
        fused = im.crop_and_resize(x, 8.0, 8.0, 16.0, 32, antialias=False)
        two_step = im.resize(x[8:24, 8:24][None], (32, 32),
                             antialias=False)[0]
        np.testing.assert_allclose(np.asarray(fused)[1:-1, 1:-1],
                                   np.asarray(two_step)[1:-1, 1:-1],
                                   atol=1e-5)

    def test_window_at_image_border_no_zero_bleed(self):
        """A crop window flush against the image edge must not darken."""
        x = jnp.ones((32, 32, 3))
        out = im.crop_and_resize(x, 0.0, 0.0, 31.5, 32)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


class TestGlobalCrops:
    def test_shapes_and_range(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.random((64, 96, 3), np.float32))
        out = im.global_crops(x, jax.random.PRNGKey(0), n_crops=3,
                              min_cover=0.95, canvas=64)
        assert out.shape == (3, 64, 64, 3)
        assert float(out.min()) >= -1e-4 and float(out.max()) <= 1 + 1e-4

    def test_crop_side_distribution(self):
        """Crop side within [min_cover*h, h], clipped to width."""
        x = jnp.zeros((100, 97, 3))
        # side in [95, 100] clipped to 97 -> always <= 97
        for s in range(4):
            out = im.global_crops(x, jax.random.PRNGKey(s), 1, 0.95, 64)
            assert out.shape == (1, 64, 64, 3)

    def test_jittable(self):
        x = jnp.zeros((64, 64, 3))
        f = jax.jit(lambda k: im.global_crops(x, k, 2, 0.95, 32))
        out = f(jax.random.PRNGKey(0))
        assert out.shape == (2, 32, 32, 3)


class TestAugmentations:
    def test_hflip(self):
        x = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
        x = jnp.broadcast_to(x, (2, 4, 3))
        # find keys that flip and don't
        flipped = im.random_hflip(x, jax.random.PRNGKey(0), p=1.0)
        np.testing.assert_allclose(np.asarray(flipped),
                                   np.asarray(x[:, ::-1, :]))
        same = im.random_hflip(x, jax.random.PRNGKey(0), p=0.0)
        np.testing.assert_allclose(np.asarray(same), np.asarray(x))

    def test_brightness_matches_torch_definition(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.random((8, 8, 3), np.float32))
        y = im.adjust_brightness(x, 1.2)
        np.testing.assert_allclose(np.asarray(y),
                                   np.clip(np.asarray(x) * 1.2, 0, 1),
                                   atol=1e-6)

    def test_hue_roundtrip(self):
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.random((8, 8, 3), np.float32))
        y = im.adjust_hue(x, 0.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)
        # shifting by 1.0 wraps around
        y2 = im.adjust_hue(x, 1.0)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(x), atol=1e-4)

    def test_saturation_gray_fixed_point(self):
        gray = jnp.full((4, 4, 3), 0.5)
        y = im.adjust_saturation(gray, 3.0)
        np.testing.assert_allclose(np.asarray(y), 0.5, atol=1e-6)

    def test_gaussian_blur_matches_numpy_reference(self):
        rng = np.random.default_rng(8)
        xn = rng.random((16, 16, 3), np.float32)
        sigma = 1.0
        k = np.exp(-np.array([-1.0, 0.0, 1.0]) ** 2 / (2 * sigma ** 2))
        k = k / k.sum()
        pad = np.pad(xn, ((1, 1), (1, 1), (0, 0)), mode="reflect")
        expect = np.zeros_like(xn)
        for dy in range(3):
            for dx in range(3):
                expect += (k[dy] * k[dx]
                           * pad[dy:dy + 16, dx:dx + 16])
        y = im.gaussian_blur3(jnp.asarray(xn), jnp.float32(sigma))
        assert y.shape == xn.shape
        np.testing.assert_allclose(np.asarray(y), expect, atol=1e-5)

    def test_blur_constant_invariant(self):
        x = jnp.full((8, 8, 3), 0.7)
        y = im.gaussian_blur3(x, jnp.float32(0.5))
        np.testing.assert_allclose(np.asarray(y), 0.7, atol=1e-5)

    def test_structure_augment_jittable(self):
        x = jnp.zeros((32, 32, 3))
        f = jax.jit(im.structure_augment)
        y = f(x, jax.random.PRNGKey(0))
        assert y.shape == x.shape

    def test_color_jitter_identity_ranges(self):
        """With zero jitter amplitudes, output == input."""
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.random((8, 8, 3), np.float32) * 0.8 + 0.1)
        y = im.color_jitter(x, jax.random.PRNGKey(3), 0.0, 0.0, 0.0, 0.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


class TestTensor2Im:
    def test_clamp_and_dtype(self):
        x = jnp.asarray([[[-0.5, 0.5, 1.5]]])
        y = im.tensor2im(x)
        assert y.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(y), [[[0, 127, 255]]])
