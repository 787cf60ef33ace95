"""Pallas flash-attention vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trace_tpu.kernels.flash_attention import flash_attention, xla_attention


def _qkv(B, H, Hkv, Tq, Tk, hd, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, H, Tq, hd), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, Tk, hd), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, Tk, hd), jnp.float32)
    return q, k, v


@pytest.mark.parametrize(
    "B,H,Hkv,T,hd,causal",
    [
        (1, 2, 2, 128, 64, False),   # ViT-like (MHA, bidirectional)
        (2, 4, 2, 256, 128, True),   # LM-like (GQA, causal)
        (1, 2, 1, 200, 64, True),    # non-multiple Tq/Tk padding
    ],
)
def test_matches_xla(B, H, Hkv, T, hd, causal):
    q, k, v = _qkv(B, H, Hkv, T, T, hd)
    ref = xla_attention(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_padding_mask():
    B, H, T, hd = 2, 2, 128, 64
    q, k, v = _qkv(B, H, H, T, T, hd, seed=1)
    # left-pad row 0 by 10, right-pad row 1 by 20
    bias = np.zeros((B, T), np.float32)
    bias[0, :10] = -1e30
    bias[1, -20:] = -1e30
    bias = jnp.asarray(bias)

    ref = xla_attention(q, k, v, bias, causal=True)
    out = flash_attention(q, k, v, bias, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fully_masked_rows_are_finite():
    B, H, T, hd = 1, 1, 128, 64
    q, k, v = _qkv(B, H, H, T, T, hd, seed=2)
    bias = jnp.full((B, T), -1e30, jnp.float32)
    out = flash_attention(q, k, v, bias, causal=False, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


class TestVitBtdAttention:
    """[B, T, D]-layout ViT attention kernel (lane-sliced heads)."""

    def test_interpret_matches_reference(self):
        from trace_tpu.kernels.flash_attention import (
            vit_attention_btd,
            vit_attention_btd_reference,
        )

        B, P, NH, HD, TQ = 2, 64, 4, 64, 57
        D = NH * HD
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, (B, P, D), jnp.float32) for kk in ks)
        got = vit_attention_btd(q, k, v, tq=TQ, num_heads=NH, interpret=True)
        want = vit_attention_btd_reference(q, k, v, tq=TQ, num_heads=NH)
        # pad rows are unspecified; compare the real rows
        np.testing.assert_allclose(
            np.asarray(got[:, :TQ]), np.asarray(want[:, :TQ]), atol=2e-5
        )

    def test_padded_vit_forward_matches_unpadded(self):
        """use_flash pads tokens 577->592 through the whole stack; the
        output over real tokens must match the unpadded einsum path."""
        from trace_tpu.model.config import VisionConfig
        from trace_tpu.model.vit import init_vit_params, vit_forward

        cfg = VisionConfig(
            image_size=56, patch_size=8, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4,
        )  # 49 patches + CLS = 50 tokens -> pads to 64
        params = init_vit_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
        imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 56, 56, 3), jnp.float32)
        want = vit_forward(params, cfg, imgs, use_flash=False)
        got = vit_forward(params, cfg, imgs, use_flash=True)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)
