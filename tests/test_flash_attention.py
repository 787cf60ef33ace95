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
