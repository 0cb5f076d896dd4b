"""ViT numerics parity: our functional JAX ViT vs an independently written
torch implementation of the DINO ViT architecture (same layout the torch.hub
checkpoint uses), with shared random weights ported through
`port_torch_state_dict`. This validates the weight-port path end to end
without network access (SURVEY.md §4 item 2): when a real DINO checkpoint is
ported with the same script, features match the reference extractor's.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from splice_tpu.models import extractor as ext
from splice_tpu.models import vit as vit_lib
from splice_tpu.models import weights as w_lib


# --- Minimal torch ViT in the facebookresearch/dino state-dict layout -------
# (written from the public architecture spec: pre-LN blocks, fused qkv,
# GELU MLP, CLS token, learned pos embeddings; NOT copied from any repo)

class TorchAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, D // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(out)


class TorchBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        hidden = int(dim * mlp_ratio)
        self.mlp = nn.ModuleDict({
            "fc1": nn.Linear(dim, hidden),
            "fc2": nn.Linear(hidden, dim),
        })

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        h = self.mlp["fc2"](F.gelu(self.mlp["fc1"](self.norm2(x))))
        return x + h


class TorchDinoVit(nn.Module):
    def __init__(self, patch=8, dim=96, depth=3, heads=4, img_size=32):
        super().__init__()
        grid = img_size // patch
        self.patch = patch
        self.patch_embed = nn.ModuleDict(
            {"proj": nn.Conv2d(3, dim, patch, patch)})
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, 1 + grid * grid, dim)
                                      * 0.02)
        self.blocks = nn.ModuleList(
            [TorchBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward_collect(self, x):
        """Returns (per-block outputs, per-block qkv linear outputs) — the
        tensors the reference hooks collect (reference extractor.py:41-49)."""
        B = x.shape[0]
        x = self.patch_embed["proj"](x)                 # [B, D, gh, gw]
        x = x.flatten(2).transpose(1, 2)                # [B, N, D]
        cls = self.cls_token.expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        blocks_out, qkv_out = [], []
        for blk in self.blocks:
            q = blk.attn.qkv(blk.norm1(x))
            qkv_out.append(q)
            x = blk(x)
            blocks_out.append(x)
        return blocks_out, qkv_out

    def forward_probs(self, x, layer):
        """Per-head softmax attention probabilities of one block — the
        reference's ATTN hook tensor (reference extractor.py:44,48 taps
        attn_drop's output, which in eval mode IS the softmax output).
        Separate from forward_collect so bench.py's torch-CPU baseline
        proxy (which times forward_collect) is untouched."""
        B = x.shape[0]
        x = self.patch_embed["proj"](x)
        x = x.flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for i, blk in enumerate(self.blocks):
            if i == layer:
                a = blk.attn
                h = blk.norm1(x)
                B_, N, D = h.shape
                qkv = a.qkv(h).reshape(B_, N, 3, a.heads, D // a.heads)
                qkv = qkv.permute(2, 0, 3, 1, 4)
                q, k = qkv[0], qkv[1]
                return ((q @ k.transpose(-2, -1)) * a.scale).softmax(dim=-1)
            x = blk(x)
        raise ValueError(layer)


def _tiny_cfg():
    return vit_lib.VitConfig(patch_size=8, embed_dim=96, depth=3, num_heads=4,
                             img_size=32)


@pytest.fixture(scope="module")
def ported():
    torch.manual_seed(0)
    tmodel = TorchDinoVit().eval()
    cfg = _tiny_cfg()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    # rename mlp.fc1 keys from ModuleDict ("mlp.fc1.weight") — already match
    params = w_lib.port_torch_state_dict(state, cfg)
    return tmodel, cfg, params


class TestPortParity:
    def test_block_and_qkv_taps_match(self, ported):
        tmodel, cfg, params = ported
        rng = np.random.default_rng(0)
        img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            t_blocks, t_qkv = tmodel.forward_collect(
                torch.from_numpy(img).permute(0, 3, 1, 2))
        out = vit_lib.vit_forward(
            params, jnp.asarray(img), cfg,
            taps={"block": (0, 1, 2), "qkv": (0, 1, 2)})
        for i in range(cfg.depth):
            np.testing.assert_allclose(
                np.asarray(out["block"][i]), t_blocks[i].numpy(),
                atol=2e-5, rtol=1e-4,
                err_msg=f"block {i} mismatch")
            np.testing.assert_allclose(
                np.asarray(out["qkv"][i]), t_qkv[i].numpy(),
                atol=2e-5, rtol=1e-4,
                err_msg=f"qkv {i} mismatch")

    def test_attn_probs_tap_matches_torch(self, ported):
        """The ATTN tap (reference extractor.py:44,48): per-head softmax
        probabilities of a block, vs torch softmax on the same weights.
        Covers the plain (un-padded, un-sharded) branch of vit.py's
        attn_probs materialization."""
        tmodel, cfg, params = ported
        rng = np.random.default_rng(7)
        img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            t_probs = tmodel.forward_probs(
                torch.from_numpy(img).permute(0, 3, 1, 2), layer=1)
        out = vit_lib.vit_forward(params, jnp.asarray(img), cfg,
                                  taps={"attn_probs": (1,)})
        probs = np.asarray(out["attn_probs"][1])
        assert probs.shape == t_probs.shape     # [B, H, N, N]
        np.testing.assert_allclose(probs, t_probs.numpy(),
                                   atol=2e-6, rtol=1e-5)
        # rows are probability distributions
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)

    def test_attn_probs_tap_masked_n_valid(self, ported):
        """attn_probs with a pre-padded token stream (n_valid masking +
        slice-back, vit.py's padded branch) == the unpadded tap."""
        tmodel, cfg, params = ported
        rng = np.random.default_rng(8)
        img = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
        ref = vit_lib.vit_forward(params, jnp.asarray(img), cfg,
                                  taps={"attn_probs": (1,)})
        # Drive the same padded path vit_forward uses for PAD_TOKEN_STREAM
        # at block level: pad the embedded stream and pass n_valid.
        from splice_tpu.models.vit import _block, interpolate_pos_embed
        x = jax.lax.conv_general_dilated(
            jnp.asarray(img), params["patch_embed"]["kernel"],
            (cfg.patch_size, cfg.patch_size), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        x = x + params["patch_embed"]["bias"]
        x = x.reshape(1, -1, cfg.embed_dim)
        x = jnp.concatenate(
            [jnp.broadcast_to(params["cls_token"], (1, 1, cfg.embed_dim)),
             x], axis=1)
        x = x + interpolate_pos_embed(params["pos_embed"], cfg, 4, 4)
        n = x.shape[1]                                        # 17
        xp = jnp.pad(x, ((0, 0), (0, 128 - n), (0, 0)))
        xp, _ = _block(xp, params["blocks"][0], cfg, False, (),
                       n_valid=n)
        _, taps = _block(xp, params["blocks"][1], cfg, False,
                         ("attn_probs",), n_valid=n)
        np.testing.assert_allclose(np.asarray(taps["attn_probs"]),
                                   np.asarray(ref["attn_probs"][1]),
                                   atol=1e-5, rtol=1e-5)

    def test_pallas_path_matches_torch(self, ported):
        tmodel, cfg, params = ported
        rng = np.random.default_rng(1)
        img = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            t_blocks, _ = tmodel.forward_collect(
                torch.from_numpy(img).permute(0, 3, 1, 2))
        out = vit_lib.vit_forward(params, jnp.asarray(img), cfg,
                                  taps={"block": (2,)}, use_pallas=True)
        np.testing.assert_allclose(np.asarray(out["block"][2]),
                                   t_blocks[2].numpy(), atol=5e-5, rtol=1e-3)

    def test_keys_extraction_matches_reference_math(self, ported):
        """keys_from_qkv must equal the reference's reshape/permute/index-1
        recipe (reference extractor.py:139-144)."""
        tmodel, cfg, params = ported
        rng = np.random.default_rng(2)
        qkv = rng.standard_normal((1, 17, 3 * cfg.embed_dim)) \
            .astype(np.float32)
        ours = ext.keys_from_qkv(jnp.asarray(qkv), cfg.num_heads)
        tq = torch.from_numpy(qkv[0])
        theirs = tq.reshape(17, 3, cfg.num_heads,
                            cfg.embed_dim // cfg.num_heads) \
            .permute(1, 2, 0, 3)[1]
        np.testing.assert_allclose(np.asarray(ours[0]), theirs.numpy(),
                                   atol=1e-6)

    def test_remat_matches(self, ported):
        tmodel, cfg, params = ported
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
        a = vit_lib.vit_forward(params, img, cfg, taps={"block": (2,)})
        b = vit_lib.vit_forward(params, img, cfg, taps={"block": (2,)},
                                remat=True)
        np.testing.assert_allclose(np.asarray(a["block"][2]),
                                   np.asarray(b["block"][2]), atol=1e-5)

    def test_npz_roundtrip(self, ported, tmp_path):
        tmodel, cfg, params = ported
        path = str(tmp_path / "vit.npz")
        # register tiny config under a temp name for roundtrip
        vit_lib.VIT_CONFIGS["_tiny_test"] = cfg
        try:
            w_lib.save_vit_params(path, params, "_tiny_test")
            loaded = w_lib.load_vit_params(path)
            for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        finally:
            del vit_lib.VIT_CONFIGS["_tiny_test"]


class TestFullScaleParity:
    """Production-dimension dino_vitb8 (embed 768, depth 12, heads 12,
    patch 8) with weights ported through the SAME script a real checkpoint
    uses: exercises the fused-qkv split at 2304 wide, the scanned block
    path (taps only at layer 11 -> lax.scan over blocks 0..10), and the
    unscanned path (tap at layer 0). Reference semantics: extractor.py:
    41-49 hooks at production width/depth. Runs at 128px (257 tokens) —
    the 224px/785-token version proved the same numerics but dominated
    single-core suite wall-clock; the real 28-base-grid geometry is still
    covered by test_pos_embed_dino_offset_at_real_grid below and by the
    full-scale golden fixtures (tests/test_vit_golden.py)."""

    @pytest.fixture(scope="class")
    def full(self):
        import dataclasses as dc
        torch.manual_seed(7)
        cfg = dc.replace(vit_lib.get_vit_config("dino_vitb8"),
                         img_size=128)
        tmodel = TorchDinoVit(patch=8, dim=768, depth=12, heads=12,
                              img_size=128).eval()
        state = {k: v.detach().numpy()
                 for k, v in tmodel.state_dict().items()}
        params = w_lib.port_torch_state_dict(state, cfg)
        rng = np.random.default_rng(10)
        img = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
        with torch.no_grad():
            t_blocks, t_qkv = tmodel.forward_collect(
                torch.from_numpy(img).permute(0, 3, 1, 2))
        return cfg, params, img, t_blocks, t_qkv

    def test_layer11_taps_match_scan_path(self, full):
        """Taps only at layer 11 -> blocks 0..10 run under lax.scan."""
        cfg, params, img, t_blocks, t_qkv = full
        out = vit_lib.vit_forward(params, jnp.asarray(img), cfg,
                                  taps={"block": (11,), "qkv": (11,)})
        assert out["block"][11].shape == (1, 257, 768)
        assert out["qkv"][11].shape == (1, 257, 2304)
        np.testing.assert_allclose(np.asarray(out["qkv"][11]),
                                   t_qkv[11].numpy(), atol=2e-5,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out["block"][11]),
                                   t_blocks[11].numpy(), atol=2e-5,
                                   rtol=1e-4)

    def test_early_tap_unscanned_path(self, full):
        """first_tap < 2 disables the scan; both ends must still match."""
        cfg, params, img, t_blocks, t_qkv = full
        out = vit_lib.vit_forward(params, jnp.asarray(img), cfg,
                                  taps={"block": (0, 11)})
        np.testing.assert_allclose(np.asarray(out["block"][0]),
                                   t_blocks[0].numpy(), atol=2e-5,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out["block"][11]),
                                   t_blocks[11].numpy(), atol=2e-5,
                                   rtol=1e-4)

    def test_pos_embed_dino_offset_at_real_grid(self):
        """DINO's +0.1 interpolate_offset at the real 28-base grid vs
        torch F.interpolate(scale_factor=..., recompute_scale_factor=
        False) — the exact mode upstream DINO uses (vision_transformer.py
        interpolate_pos_encoding). Non-square targets cover the
        Resize(224, max_size=480) crop geometries."""
        cfg = vit_lib.get_vit_config("dino_vitb8")
        assert cfg.base_grid == 28 and cfg.interpolate_offset == 0.1
        rng = np.random.default_rng(5)
        pe = rng.standard_normal((1, 1 + 784, 768)).astype(np.float32)
        for gh, gw in [(30, 26), (60, 44), (28, 33)]:
            ours = vit_lib.interpolate_pos_embed(jnp.asarray(pe), cfg,
                                                 gh, gw)
            patch = torch.from_numpy(
                pe[:, 1:].reshape(1, 28, 28, 768)).permute(0, 3, 1, 2)
            ref = F.interpolate(
                patch, scale_factor=((gh + 0.1) / 28, (gw + 0.1) / 28),
                mode="bicubic", align_corners=False,
                recompute_scale_factor=False)
            assert ref.shape[-2:] == (gh, gw)
            ref = ref.permute(0, 2, 3, 1).reshape(1, gh * gw, 768).numpy()
            np.testing.assert_allclose(np.asarray(ours)[:, 1:], ref,
                                       atol=5e-5, rtol=1e-4,
                                       err_msg=f"grid ({gh},{gw})")


class TestPosEmbedInterpolation:
    def test_same_grid_identity(self):
        cfg = _tiny_cfg()
        pe = jnp.asarray(np.random.default_rng(4)
                         .standard_normal((1, 17, 96)), jnp.float32)
        out = vit_lib.interpolate_pos_embed(pe, cfg, 4, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(pe))

    def test_interpolated_shape(self):
        cfg = _tiny_cfg()
        pe = jnp.zeros((1, 17, 96))
        out = vit_lib.interpolate_pos_embed(pe, cfg, 6, 8)
        assert out.shape == (1, 1 + 48, 96)

    def test_matches_torch_bicubic_dinov2_style(self):
        """offset=0 path vs torch F.interpolate bicubic."""
        cfg = vit_lib.VitConfig(patch_size=8, embed_dim=16, depth=1,
                                num_heads=2, img_size=32,
                                interpolate_offset=0.0)
        rng = np.random.default_rng(5)
        pe = rng.standard_normal((1, 17, 16)).astype(np.float32)
        ours = vit_lib.interpolate_pos_embed(jnp.asarray(pe), cfg, 7, 5)
        patch = torch.from_numpy(pe[:, 1:].reshape(1, 4, 4, 16)) \
            .permute(0, 3, 1, 2)
        ref = F.interpolate(patch, size=(7, 5), mode="bicubic",
                            align_corners=False, antialias=False)
        ref = ref.permute(0, 2, 3, 1).reshape(1, 35, 16).numpy()
        np.testing.assert_allclose(np.asarray(ours)[:, 1:], ref,
                                   atol=2e-2, rtol=2e-2)


class TestExtractorApi:
    def test_accessors_shapes(self):
        cfg = _tiny_cfg()
        params = vit_lib.init_vit_params(jax.random.PRNGKey(0), cfg)
        e = ext.VitExtractor(params=params, cfg=cfg, model_name="tiny")
        img = jnp.zeros((2, 32, 32, 3))
        feats = e.get_feature_from_input(img)
        assert len(feats) == 3 and feats[0].shape == (2, 17, 96)
        keys = e.get_keys_from_input(img, 2)
        assert keys.shape == (2, 4, 17, 24)
        ssim = e.get_keys_self_sim_from_input(img, 2)
        assert ssim.shape == (2, 17, 17)
        cls = e.get_cls_token_from_input(img)
        assert cls.shape == (2, 96)
        assert e.get_patch_num((2, 32, 32, 3)) == 17

    def test_cosine_sim_reference_semantics(self):
        """attn_cosine_sim: diagonal == 1, eps clamp for zero rows
        (reference extractor.py:4-9)."""
        x = jnp.asarray([[1.0, 0.0], [0.0, 2.0], [0.0, 0.0]])
        sim = ext.attn_cosine_sim(x)
        np.testing.assert_allclose(np.asarray(jnp.diag(sim))[:2], 1.0,
                                   atol=1e-6)
        np.testing.assert_allclose(float(sim[0, 1]), 0.0, atol=1e-6)
        # zero row: numerator 0, denominator clamped -> 0, no NaN
        assert not np.any(np.isnan(np.asarray(sim)))

    def test_cosine_sim_matches_torch_formula(self):
        rng = np.random.default_rng(6)
        x = rng.standard_normal((5, 7)).astype(np.float32)
        ours = ext.attn_cosine_sim(jnp.asarray(x))
        tx = torch.from_numpy(x)
        norm = tx.norm(dim=1, keepdim=True)
        factor = torch.clamp(norm @ norm.T, min=1e-8)
        ref = (tx @ tx.T) / factor
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


class TestRegisterTokens:
    def test_layout_matches_upstream_dinov2_reg(self):
        """pos_embed covers cls + patches ONLY; registers are inserted
        between cls and patches AFTER the pos-add and carry no positional
        embedding (upstream dinov2 prepare_tokens_with_masks)."""
        R = 2
        cfg = vit_lib.VitConfig(patch_size=8, embed_dim=32, depth=1,
                                num_heads=2, img_size=32,
                                num_register_tokens=R,
                                interpolate_offset=0.0)
        params = vit_lib.init_vit_params(jax.random.PRNGKey(0), cfg)
        g = cfg.img_size // cfg.patch_size
        # a ported dinov2-reg checkpoint stores [1, 1+g^2, D] — no
        # register rows
        assert params["pos_embed"].shape == (1, 1 + g * g, 32)
        assert params["register_tokens"].shape == (1, R, 32)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        out = vit_lib.vit_forward(params, x, cfg,
                                   taps={"block": [0]})["block"][0]
        assert out.shape == (1, 1 + R + g * g, 32)
        # shifting the register params must move the register rows
        p2 = dict(params)
        p2["register_tokens"] = params["register_tokens"] + 7.0
        out2 = vit_lib.vit_forward(p2, x, cfg,
                                   taps={"block": [0]})["block"][0]
        assert not np.allclose(np.asarray(out[:, 1:1 + R]),
                               np.asarray(out2[:, 1:1 + R]))
