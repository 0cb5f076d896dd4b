"""Loss-system tests: golden values for the loss kernels, lambda schedule
parity (step-0 / warmup / every-75 behavior, SURVEY.md §2), fused-vs-LossG
equivalence."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splice_tpu import losses as losses_lib
from splice_tpu.config import Config
from splice_tpu.models import extractor as ext_lib
from splice_tpu.models import vit as vit_lib


def tiny_extractor(seed=0):
    cfg = vit_lib.VitConfig(patch_size=8, embed_dim=96, depth=3,
                            num_heads=4, img_size=32)
    params = vit_lib.init_vit_params(jax.random.PRNGKey(seed), cfg)
    return ext_lib.VitExtractor(params=params, cfg=cfg, model_name="tiny")


class TestLambdaSchedule:
    def cfg(self, **kw):
        return Config(**kw)

    def test_step0(self):
        """First step: cls + entire on, ssim/identity off (reference
        losses.py:26-44 with the dataset's 0-based counter)."""
        lam = losses_lib.lambdas_for_step(self.cfg(), 0)
        assert lam["lambda_global_cls"] == 10.0
        assert lam["lambda_global_ssim"] == 0.0
        assert lam["lambda_global_identity"] == 0.0
        assert lam["lambda_entire_cls"] == 10.0
        assert lam["lambda_entire_ssim"] == 1.0

    def test_after_warmup(self):
        lam = losses_lib.lambdas_for_step(self.cfg(), 1)
        assert lam["lambda_global_ssim"] == 1.0
        assert lam["lambda_global_identity"] == 1.0
        assert lam["lambda_entire_cls"] == 0.0

    def test_entire_every_75(self):
        for step in (75, 150, 300):
            lam = losses_lib.lambdas_for_step(self.cfg(), step)
            assert lam["lambda_entire_ssim"] == 1.0
        lam = losses_lib.lambdas_for_step(self.cfg(), 74)
        assert lam["lambda_entire_ssim"] == 0.0

    def test_entire_gating_asymmetry_fixed(self):
        """reference gates x_entire on lambda_entire_ssim only (model.py:19)
        but loss_entire_cls also needs it — we gate on either (SURVEY.md
        §2)."""
        cfg = self.cfg(lambda_entire_ssim=0.0, lambda_entire_cls=10.0)
        assert losses_lib.is_entire_step(cfg, 0)
        cfg2 = self.cfg(lambda_entire_ssim=0.0, lambda_entire_cls=0.0)
        assert not losses_lib.is_entire_step(cfg2, 0)


class TestLossKernels:
    def test_per_crop_mse_sum_is_sum_not_mean(self):
        """reference accumulates `loss += mse` over crops (losses.py:76)."""
        a = jnp.ones((3, 4, 4))
        b = jnp.zeros((3, 4, 4))
        assert float(losses_lib.per_crop_mse_sum(a, b)) == pytest.approx(3.0)

    def test_structure_loss_zero_for_identical(self):
        keys = jnp.asarray(np.random.default_rng(0)
                           .standard_normal((2, 4, 9, 8)), jnp.float32)
        assert float(losses_lib.structure_loss(keys, keys)) < 1e-10

    def test_structure_loss_golden_small(self):
        """Hand-computed: 1 crop, 1 head, 2 tokens."""
        g = jnp.asarray([[[[1.0, 0.0], [0.0, 1.0]]]])   # [1,1,2,2]
        t = jnp.asarray([[[[1.0, 0.0], [1.0, 0.0]]]])
        # gram(g) = I; gram(t) = ones -> mse = mean(|I-1|^2 off-diag 2 of 4)
        val = float(losses_lib.structure_loss(g, t))
        assert val == pytest.approx(0.5, abs=1e-6)

    def test_identity_loss_is_raw_keys_mse(self):
        g = jnp.ones((2, 3, 5, 4))
        t = jnp.zeros((2, 3, 5, 4))
        assert float(losses_lib.identity_loss(g, t)) == pytest.approx(2.0)

    def test_target_stop_gradient(self):
        """Gradients flow through the generated branch only (reference
        losses.py:79-81 no_grad targets)."""
        rng = np.random.default_rng(1)
        keys = jnp.asarray(rng.standard_normal((1, 2, 5, 4)), jnp.float32)
        # NOTE: target must differ non-trivially — the cosine Gram is scale
        # invariant, so gram(k) == gram(2k) and the grad at that point is 0.
        other = jnp.asarray(rng.standard_normal((1, 2, 5, 4)), jnp.float32)

        g_gen = jax.grad(lambda k: losses_lib.structure_loss(k, other))(keys)
        assert float(jnp.abs(g_gen).sum()) > 0
        g_tgt = jax.grad(
            lambda k: losses_lib.structure_loss(keys, k))(other)
        np.testing.assert_allclose(np.asarray(g_tgt), 0.0)


class TestFusedVsLossG:
    def test_fused_matches_lossg_terms(self):
        """The fused batched path must equal per-branch LossG computation."""
        e = tiny_extractor()
        rng = np.random.default_rng(2)
        n = 2
        genA = jnp.asarray(rng.random((n, 32, 32, 3)), jnp.float32)
        cropsA = jnp.asarray(rng.random((n, 32, 32, 3)), jnp.float32)
        genB = jnp.asarray(rng.random((n, 32, 32, 3)), jnp.float32)
        cropsB = jnp.asarray(rng.random((n, 32, 32, 3)), jnp.float32)
        fused, aux = losses_lib.splice_losses_fused(
            e, genA, cropsA, genB, cropsB, ssim_layer=2)

        # manual per-branch computation through extractor accessors
        k_genA = e.get_keys_from_input(genA, 2)
        k_A = e.get_keys_from_input(cropsA, 2)
        ssim = losses_lib.structure_loss(k_genA, k_A)
        cls_g = e.get_cls_token_from_input(genA)
        cls_b = e.get_cls_token_from_input(cropsB)
        cls = losses_lib.appearance_loss(cls_g, cls_b)
        idl = losses_lib.identity_loss(e.get_keys_from_input(genB, 2),
                                       e.get_keys_from_input(cropsB, 2))
        np.testing.assert_allclose(float(fused["loss_global_ssim"]),
                                   float(ssim), rtol=1e-5)
        np.testing.assert_allclose(float(fused["loss_global_cls"]),
                                   float(cls), rtol=1e-5)
        np.testing.assert_allclose(float(fused["loss_global_id_B"]),
                                   float(idl), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(aux["cls_B"]),
                                   np.asarray(cls_b), rtol=1e-5, atol=1e-6)

    def test_weighted_total(self):
        losses = {"loss_global_cls": jnp.float32(2.0),
                  "loss_global_ssim": jnp.float32(3.0)}
        lam = {"lambda_global_cls": 10.0, "lambda_global_ssim": 1.0}
        assert float(losses_lib.weighted_total(losses, lam)) == 23.0

    def test_entire_cls_uses_first_B_crop_only(self):
        """zip(x_entire, B_global) truncates at 1 (reference losses.py:87)."""
        e = tiny_extractor()
        rng = np.random.default_rng(3)
        gen = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        entA = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        clsB = jnp.asarray(rng.standard_normal((3, 96)), jnp.float32)
        out = losses_lib.entire_losses_fused(e, gen, entA, clsB,
                                             ssim_layer=2)
        cls_gen = e.get_cls_token_from_input(gen)
        expect = float(jnp.mean(jnp.square(cls_gen[0] - clsB[0])))
        np.testing.assert_allclose(float(out["loss_entire_cls"]), expect,
                                   rtol=1e-5)


class TestLossGClass:
    def test_loss_dict_keys_and_total(self):
        cfg = Config(dino_global_patch_size=32, dino_global_max_size=64)
        e = tiny_extractor()
        lg = losses_lib.LossG(cfg, e)
        rng = np.random.default_rng(4)
        outputs = {
            "x_global": jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32),
            "x_entire": jnp.asarray(rng.random((1, 48, 48, 3)), jnp.float32),
            "y_global": jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32),
        }
        inputs = {
            "step": 0,
            "A": jnp.asarray(rng.random((1, 48, 48, 3)), jnp.float32),
            "A_global": jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32),
            "B_global": jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32),
        }
        out = lg(outputs, inputs)
        # step 0: cls + entire only (reference schedule)
        assert set(out) == {"loss_global_cls", "loss_entire_cls",
                            "loss_entire_ssim", "loss"}
        total = 10.0 * float(out["loss_global_cls"]) \
            + 10.0 * float(out["loss_entire_cls"]) \
            + 1.0 * float(out["loss_entire_ssim"])
        np.testing.assert_allclose(float(out["loss"]), total, rtol=1e-5)

        inputs["step"] = 1
        out1 = lg(outputs, inputs)
        assert set(out1) == {"loss_global_cls", "loss_global_ssim",
                             "loss_global_id_B", "loss"}
