"""Skip U-Net generator tests: building-block golden values vs torch
functional ops, topology invariants, init statistics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splice_tpu.models import unet


class TestBuildingBlocks:
    def test_batch_norm_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        rng = np.random.default_rng(0)
        x = rng.standard_normal((4, 6, 5, 3)).astype(np.float32)
        gamma = rng.standard_normal(3).astype(np.float32)
        beta = rng.standard_normal(3).astype(np.float32)
        ours = unet.batch_norm(jnp.asarray(x),
                               {"scale": jnp.asarray(gamma),
                                "bias": jnp.asarray(beta)})
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.batch_norm(tx, None, None, torch.from_numpy(gamma),
                           torch.from_numpy(beta), training=True)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    @pytest.mark.parametrize("k,stride", [(3, 1), (3, 2), (5, 1), (7, 2),
                                          (1, 1)])
    def test_conv_matches_torch_padding(self, k, stride):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        rng = np.random.default_rng(k * 10 + stride)
        x = rng.standard_normal((2, 13, 17, 4)).astype(np.float32)
        w = rng.standard_normal((k, k, 4, 6)).astype(np.float32) * 0.1
        b = rng.standard_normal(6).astype(np.float32)
        ours = unet.conv2d(jnp.asarray(x), {"kernel": jnp.asarray(w),
                                            "bias": jnp.asarray(b)}, stride)
        tw = torch.from_numpy(w).permute(3, 2, 0, 1)
        ref = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), tw,
                       torch.from_numpy(b), stride=stride,
                       padding=(k - 1) // 2)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4,
                                   rtol=1e-4)

    def test_reflection_pad_conv_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        rng = np.random.default_rng(3)
        x = rng.standard_normal((1, 9, 9, 2)).astype(np.float32)
        w = rng.standard_normal((5, 5, 2, 3)).astype(np.float32) * 0.1
        ours = unet.conv2d(jnp.asarray(x), {"kernel": jnp.asarray(w)},
                           1, pad="reflection")
        tx = F.pad(torch.from_numpy(x).permute(0, 3, 1, 2), (2, 2, 2, 2),
                   mode="reflect")
        ref = F.conv2d(tx, torch.from_numpy(w).permute(3, 2, 0, 1))
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4,
                                   rtol=1e-4)

    def test_upsample_matches_torch_bilinear(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        rng = np.random.default_rng(4)
        x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
        ours = unet.upsample2(jnp.asarray(x), "bilinear")
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                            scale_factor=2, mode="bilinear",
                            align_corners=False)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_concat_crop_center(self):
        a = jnp.arange(2 * 5 * 6 * 1, dtype=jnp.float32).reshape(2, 5, 6, 1)
        b = jnp.zeros((2, 4, 4, 2))
        out = unet.concat_crop([a, b])
        assert out.shape == (2, 4, 4, 3)
        # a cropped by (5-4)//2=0 rows from top, (6-4)//2=1 col from left
        np.testing.assert_allclose(np.asarray(out[..., 0]),
                                   np.asarray(a[:, 0:4, 1:5, 0]))

    def test_leaky_relu_slope(self):
        x = jnp.asarray([-1.0, 2.0])
        np.testing.assert_allclose(np.asarray(unet.act(x, "LeakyReLU")),
                                   [-0.2, 2.0])

    def test_downsamplers(self):
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        avg = unet.downsample(x, "avg")
        assert avg.shape == (1, 2, 2, 1)
        np.testing.assert_allclose(float(avg[0, 0, 0, 0]),
                                   np.mean([0, 1, 4, 5]))
        mx = unet.downsample(x, "max")
        np.testing.assert_allclose(float(mx[0, 0, 0, 0]), 5.0)
        lz = unet.downsample(jnp.ones((1, 8, 8, 3)), "lanczos2")
        assert lz.shape == (1, 4, 4, 3)
        np.testing.assert_allclose(np.asarray(lz), 1.0, atol=1e-4)


class TestSkipNet:
    def test_output_shape_preserved(self):
        """down ceil(H/2) + x2 upsample + center-crop => output == input
        spatial shape for ANY size (incl. odd), like the reference net."""
        cfg = unet.SkipConfig()
        params = unet.init_skip_params(jax.random.PRNGKey(0), cfg)
        for hw in [(64, 64), (96, 128), (67, 93)]:
            x = jnp.zeros((1, *hw, 3))
            y = unet.skip_apply(params, cfg, x)
            assert y.shape == (1, *hw, 3), (hw, y.shape)

    def test_output_range_sigmoid(self):
        cfg = unet.SkipConfig()
        params = unet.init_skip_params(jax.random.PRNGKey(1), cfg)
        x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)),
                        jnp.float32)
        y = unet.skip_apply(params, cfg, x)
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0

    def test_param_count_matches_reference_exactly(self):
        """The reference skip() has exactly 1,037,523 parameters (measured:
        sum(p.numel()) over reference models/unet/skip.py default net).
        Identical topology => identical count."""
        cfg = unet.SkipConfig()
        params = unet.init_skip_params(jax.random.PRNGKey(0), cfg)
        assert unet.param_count(params) == 1037523

    def test_inversion_variant_runs(self):
        cfg = unet.inversion_skip_config(8)
        params = unet.init_skip_params(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((1, 64, 64, 8))
        y = unet.skip_apply(params, cfg, x)
        assert y.shape == (1, 64, 64, 3)

    def test_gradients_flow(self):
        cfg = unet.SkipConfig()
        params = unet.init_skip_params(jax.random.PRNGKey(0), cfg)
        x = jnp.ones((1, 32, 32, 3)) * 0.5

        def loss(p):
            return jnp.mean(unet.skip_apply(p, cfg, x) ** 2)

        grads = jax.grad(loss)(params)
        gnorms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
        assert all(np.isfinite(gnorms))
        assert sum(g > 0 for g in gnorms) > len(gnorms) * 0.8

    def test_jit_and_batch(self):
        cfg = unet.SkipConfig()
        params = unet.init_skip_params(jax.random.PRNGKey(0), cfg)
        f = jax.jit(lambda p, x: unet.skip_apply(p, cfg, x))
        y = f(params, jnp.zeros((3, 32, 32, 3)))
        assert y.shape == (3, 32, 32, 3)


class TestInit:
    def test_xavier_std(self):
        key = jax.random.PRNGKey(0)
        w = unet._init_conv_kernel(key, (3, 3, 64, 64), "xavier", 0.02)
        expect = 0.02 * np.sqrt(2.0 / (3 * 3 * 64 * 2))
        assert abs(float(jnp.std(w)) - expect) / expect < 0.1

    def test_kaiming_std(self):
        w = unet._init_conv_kernel(jax.random.PRNGKey(0), (3, 3, 64, 64),
                                   "kaiming", 0.02)
        expect = np.sqrt(2.0 / (3 * 3 * 64))
        assert abs(float(jnp.std(w)) - expect) / expect < 0.1

    def test_orthogonal(self):
        w = unet._init_conv_kernel(jax.random.PRNGKey(0), (1, 1, 32, 16),
                                   "orthogonal", 1.0)
        m = np.asarray(w).reshape(32, 16)
        np.testing.assert_allclose(m.T @ m, np.eye(16), atol=1e-4)

    def test_orthogonal_wide(self):
        """cout > fan_in (e.g. the default 1x1 skip conv: cin=3, cout=4):
        torch orthogonal_ orthogonalizes the transpose; the old code
        crashed reshaping a reduced-QR q of the wrong size."""
        w = unet._init_conv_kernel(jax.random.PRNGKey(0), (1, 1, 3, 4),
                                   "orthogonal", 1.0)
        m = np.asarray(w).reshape(3, 4)
        # rows of the [cout, fan_in] matrix are orthonormal -> m m^T = I_3
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-4)

    def test_orthogonal_full_net_init(self):
        params = unet.init_skip_params(jax.random.PRNGKey(1),
                                       unet.SkipConfig(), "orthogonal", 1.0)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(params))

    def test_bn_init_stats(self):
        p = unet._bn_params(jax.random.PRNGKey(0), 1000, 0.02)
        assert abs(float(jnp.mean(p["scale"])) - 1.0) < 0.01
        assert abs(float(jnp.std(p["scale"])) - 0.02) < 0.005
        np.testing.assert_allclose(np.asarray(p["bias"]), 0.0)


class TestChwLayout:
    def test_chw_matches_nhwc(self):
        """The CHW fast path must match the NHWC reference path."""
        cfg = unet.SkipConfig()
        params = unet.init_skip_params(jax.random.PRNGKey(3), cfg)
        x = jnp.asarray(np.random.default_rng(5).random((2, 64, 96, 3)),
                        jnp.float32)
        a = unet.skip_apply(params, cfg, x)
        b = unet.skip_apply_chw(params, cfg, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=1e-2)

    def test_chw_auto_dispatch_matches_nhwc(self):
        """conv_impl='auto' (per-site XLA/Pallas dispatch on TPU, XLA dots
        on CPU) must agree with the NHWC reference path."""
        cfg = unet.SkipConfig()
        params = unet.init_skip_params(jax.random.PRNGKey(3), cfg)
        x = jnp.asarray(np.random.default_rng(11).random((2, 64, 96, 3)),
                        jnp.float32)
        a = unet.skip_apply(params, cfg, x)
        b = unet.skip_apply_chw(params, cfg, x, conv_impl="auto")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=1e-2)

    def test_chw_conv_matches_nhwc_conv(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((1, 13, 17, 4)), jnp.float32)
        p = {"kernel": jnp.asarray(rng.standard_normal((3, 3, 4, 6)),
                                   jnp.float32) * 0.1,
             "bias": jnp.asarray(rng.standard_normal(6), jnp.float32)}
        for stride in (1, 2):
            a = unet.conv2d(x, p, stride)
            b = unet.conv2d_chw(jnp.transpose(x, (0, 3, 1, 2)), p, stride)
            b = jnp.transpose(b, (0, 2, 3, 1))
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4,
                                       err_msg=f"stride {stride}")

    def test_chw_conv_odd_size_stride2(self):
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((1, 15, 11, 3)), jnp.float32)
        p = {"kernel": jnp.asarray(rng.standard_normal((3, 3, 3, 5)),
                                   jnp.float32) * 0.1}
        a = unet.conv2d(x, p, 2)
        b = jnp.transpose(unet.conv2d_chw(
            jnp.transpose(x, (0, 3, 1, 2)), p, 2), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)

    def test_chw_reflection_pad(self):
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((1, 9, 9, 2)), jnp.float32)
        p = {"kernel": jnp.asarray(rng.standard_normal((5, 5, 2, 3)),
                                   jnp.float32) * 0.1}
        a = unet.conv2d(x, p, 1, pad="reflection")
        b = jnp.transpose(unet.conv2d_chw(
            jnp.transpose(x, (0, 3, 1, 2)), p, 1, pad="reflection"),
            (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)

    def test_chw_grads_match(self):
        cfg = unet.SkipConfig()
        params = unet.init_skip_params(jax.random.PRNGKey(4), cfg)
        x = jnp.asarray(np.random.default_rng(9).random((1, 32, 32, 3)),
                        jnp.float32)

        g1 = jax.grad(lambda p: jnp.sum(unet.skip_apply(p, cfg, x) ** 2))(
            params)
        g2 = jax.grad(
            lambda p: jnp.sum(unet.skip_apply_chw(p, cfg, x) ** 2))(params)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-2)

    @pytest.fixture()
    def force_fused_kernels(self):
        """Exercise the fused interpret-mode kernels on CPU (the size
        gate would otherwise route everything to the XLA fallback)."""
        unet.FORCE_FUSED_KERNELS_ON_CPU = True
        yield
        unet.FORCE_FUSED_KERNELS_ON_CPU = False

    def test_fused_deferred_bn_matches_nhwc(self, force_fused_kernels):
        """conv_impl='fused' (BN apply + act in the conv kernels'
        prologue) must match the NHWC reference path, including the
        zero-pad borders (padded with the prologue's pre-image of 0)."""
        cfg = unet.SkipConfig()
        params = unet.init_skip_params(jax.random.PRNGKey(3), cfg)
        x = jnp.asarray(np.random.default_rng(13).random((2, 64, 96, 3)),
                        jnp.float32)
        a = unet.skip_apply(params, cfg, x)
        b = unet.skip_apply_chw(params, cfg, x, conv_impl="fused")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=1e-2)

    def test_fused_grads_match(self, force_fused_kernels):
        cfg = unet.SkipConfig()
        params = unet.init_skip_params(jax.random.PRNGKey(4), cfg)
        x = jnp.asarray(np.random.default_rng(14).random((1, 32, 32, 3)),
                        jnp.float32)
        g1 = jax.grad(lambda p: jnp.sum(unet.skip_apply(p, cfg, x) ** 2))(
            params)
        g2 = jax.grad(lambda p: jnp.sum(unet.skip_apply_chw(
            p, cfg, x, conv_impl="fused") ** 2))(params)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(g1),
                jax.tree_util.tree_leaves_with_path(g2)):
            a, b = np.asarray(a), np.asarray(b)
            # atol scales with the leaf's magnitude: the packed dw dot
            # sums taps in one fp32 contraction (different order than the
            # XLA per-tap sums), so near-zero components carry
            # reduction-order noise proportional to the large ones.
            np.testing.assert_allclose(
                a, b, atol=5e-3 + 1e-3 * np.abs(a).max(), rtol=5e-2,
                err_msg=jax.tree_util.keystr(ka))

    def test_fused_reflection_pad_matches(self, force_fused_kernels):
        cfg = unet.SkipConfig(pad="reflection")
        params = unet.init_skip_params(jax.random.PRNGKey(6), cfg)
        x = jnp.asarray(np.random.default_rng(15).random((1, 32, 32, 3)),
                        jnp.float32)
        a = unet.skip_apply(params, cfg, x)
        b = unet.skip_apply_chw(params, cfg, x, conv_impl="fused")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=1e-2)


class TestStride2PhaseModes:
    @pytest.mark.parametrize("mode", ["major", "permdot"])
    @pytest.mark.parametrize("hw", [(20, 24), (15, 11), (17, 18)])
    def test_modes_match_slice_fwd_bwd(self, hw, mode):
        """Every STRIDE2_PHASE_MODE ('major' = one materialized
        phase-major relayout; 'permdot' = phase separation via constant
        0/1 permutation matmuls, the production default) must be
        numerically identical to the per-tap 6-D slicing form, forward
        and backward (both input and weight grads)."""
        rng = np.random.default_rng(51)
        x = jnp.asarray(rng.standard_normal((2, 5, *hw)), jnp.float32)
        p = {"kernel": jnp.asarray(
            rng.standard_normal((3, 3, 5, 7)), jnp.float32) * 0.1,
            "bias": jnp.asarray(rng.standard_normal(7), jnp.float32)}

        def run():
            y = unet.conv2d_chw(x, p, stride=2)
            gx, gw = jax.grad(lambda x, p: jnp.sum(
                unet.conv2d_chw(x, p, stride=2) ** 2),
                argnums=(0, 1))(x, p)
            return np.asarray(y), np.asarray(gx), np.asarray(gw["kernel"])

        prev = unet.STRIDE2_PHASE_MODE
        try:
            unet.STRIDE2_PHASE_MODE = "slice"
            ya, ga, gwa = run()
            unet.STRIDE2_PHASE_MODE = mode
            yb, gb, gwb = run()
        finally:
            unet.STRIDE2_PHASE_MODE = prev
        np.testing.assert_allclose(ya, yb, atol=1e-6)
        np.testing.assert_allclose(ga, gb, atol=1e-5)
        np.testing.assert_allclose(gwa, gwb, atol=1e-4)


class TestLanczosReferenceParity:
    @staticmethod
    def _reference_kernel(factor, support):
        """Independent re-derivation of the DIP get_kernel for
        phase=0.5 lanczos (reference downsampler.py:73-135):
        kernel_width = 2*support*factor + 1, actual size kernel_width-1,
        center keeps the ORIGINAL kernel_width."""
        kernel_width = 2 * support * factor + 1
        k = np.zeros((kernel_width - 1, kernel_width - 1))
        center = (kernel_width + 1) / 2.0
        for i in range(1, k.shape[0] + 1):
            for j in range(1, k.shape[1] + 1):
                di = abs(i + 0.5 - center) / factor
                dj = abs(j + 0.5 - center) / factor
                val = 1.0
                for d in (di, dj):
                    if d != 0:
                        val *= (support * np.sin(np.pi * d)
                                * np.sin(np.pi * d / support)
                                / (np.pi * np.pi * d * d))
                    if d >= support:
                        val = 0.0
                k[i - 1, j - 1] = val
        return k / k.sum()

    @pytest.mark.parametrize("mode,factor", [("lanczos2", 2),
                                             ("lanczos3", 2)])
    def test_kernel_matches_reference(self, mode, factor):
        ours = unet._downsampler_kernel(mode, factor)
        ref = self._reference_kernel(factor, int(mode[-1]))
        assert ours.shape == ref.shape == (2 * int(mode[-1]) * factor,) * 2
        np.testing.assert_allclose(ours, ref, atol=1e-12)

    def test_downsample_matches_torch_reference_conv(self):
        """downsample(..., 'lanczos2') == the reference Downsampler
        (replication-pad (k-factor)/2, stride-factor depthwise conv)."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(11)
        x = rng.random((1, 12, 12, 3)).astype(np.float32)
        ours = np.asarray(unet.downsample(jnp.asarray(x), "lanczos2", 2))
        kern = self._reference_kernel(2, 2)
        pad = (kern.shape[0] - 2) // 2
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        xt = torch.nn.functional.pad(xt, (pad,) * 4, mode="replicate")
        wt = torch.zeros(3, 3, *kern.shape, dtype=torch.float32)
        for c in range(3):
            wt[c, c] = torch.from_numpy(kern.astype(np.float32))
        out = torch.nn.functional.conv2d(xt, wt, stride=2)
        out = out.permute(0, 2, 3, 1).numpy()
        assert ours.shape == out.shape == (1, 6, 6, 3)
        np.testing.assert_allclose(ours, out, atol=1e-5)


def test_gen_noise_shape_dtype_determinism():
    """GenNoise parity stub (reference common.py:45-60): input's spatial
    shape, requested channel count, input dtype; same key -> same noise."""
    import jax

    x = jnp.zeros((2, 5, 7, 3), jnp.bfloat16)
    k = jax.random.PRNGKey(0)
    n1 = unet.gen_noise(k, x, dim2=4)
    n2 = unet.gen_noise(k, x, dim2=4)
    assert n1.shape == (2, 5, 7, 4) and n1.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    assert float(jnp.std(n1.astype(jnp.float32))) > 0.5
