"""Pallas fused attention vs XLA reference: forward and gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splice_tpu.ops import attention as att


def _rand_qkv(key, B=2, H=3, N=100, dh=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, N, dh), dtype)
    k = jax.random.normal(kk, (B, H, N, dh), dtype)
    v = jax.random.normal(kv, (B, H, N, dh), dtype)
    return q, k, v


class TestXlaAttention:
    def test_softmax_rows_sum_via_uniform_v(self):
        """With V = ones, attention output must be exactly ones."""
        q, k, _ = _rand_qkv(jax.random.PRNGKey(0))
        v = jnp.ones_like(q)
        out = att._xla_attention(q, k, v, 0.125)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)

    def test_identity_attention(self):
        """Huge scale + orthogonal-ish q=k makes attention ~diagonal."""
        N, dh = 8, 64
        q = jnp.eye(N, dh)[None, None] * 100.0
        k = q
        v = jax.random.normal(jax.random.PRNGKey(1), (1, 1, N, dh))
        out = att._xla_attention(q, k, v, 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-3)


class TestPallasMatchesXla:
    @pytest.mark.parametrize("N", [64, 100, 785])
    def test_forward(self, N):
        q, k, v = _rand_qkv(jax.random.PRNGKey(2), B=1, H=2, N=N)
        ours = att._pallas_attention(q, k, v, 0.125, 0)
        ref = att._xla_attention(q, k, v, 0.125)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5)

    def test_grads_match_xla(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(3), B=1, H=1, N=96)

        def loss_pallas(q, k, v):
            return jnp.sum(att._pallas_attention(q, k, v, 0.125, 0) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(att._xla_attention(q, k, v, 0.125) ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3)

    def test_dispatch_respects_flag(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(4), N=32)
        out1 = att.multi_head_attention(q, k, v, 0.125, use_pallas=True)
        out2 = att.multi_head_attention(q, k, v, 0.125, use_pallas=False)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=2e-5)

    def test_unsupported_head_dim_falls_back(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(5), dh=48)
        assert not att.pallas_attention_supported(q)
        out = att.multi_head_attention(q, k, v, 0.1, use_pallas=True)
        assert out.shape == q.shape


class TestPaddedTokenStream:
    """n_valid contract: a pre-padded token axis with masked keys must
    reproduce unpadded attention on the valid rows, forward and backward,
    on both the Pallas and XLA paths (vit_forward pads the stream once at
    embedding)."""

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_valid_rows_match_unpadded(self, use_pallas):
        N, PAD = 100, 128
        q, k, v = _rand_qkv(jax.random.PRNGKey(6), B=2, H=2, N=N)
        ref = att.multi_head_attention(q, k, v, 0.125, use_pallas=use_pallas)
        pad = [(0, 0), (0, 0), (0, PAD - N), (0, 0)]
        qp, kp, vp = (jnp.pad(t, pad) for t in (q, k, v))
        out = att.multi_head_attention(qp, kp, vp, 0.125,
                                       use_pallas=use_pallas, n_valid=N)
        np.testing.assert_allclose(np.asarray(out[:, :, :N]),
                                   np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_grads_match_unpadded(self, use_pallas):
        N, PAD = 96, 128
        q, k, v = _rand_qkv(jax.random.PRNGKey(7), B=1, H=1, N=N)
        pad = [(0, 0), (0, 0), (0, PAD - N), (0, 0)]

        def loss_padded(q, k, v):
            qp, kp, vp = (jnp.pad(t, pad) for t in (q, k, v))
            out = att.multi_head_attention(qp, kp, vp, 0.125,
                                           use_pallas=use_pallas, n_valid=N)
            # only valid rows are consumed (the vit taps slice them)
            return jnp.sum(out[:, :, :N] ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(att.multi_head_attention(
                q, k, v, 0.125, use_pallas=use_pallas) ** 2)

        gp = jax.grad(loss_padded, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3)
