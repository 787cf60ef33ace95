"""Pallas int8 matmul kernel vs reference dequant matmul (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trace_tpu.kernels.quant_matmul import quant_apply, quant_matmul
from trace_tpu.model.quantize import _quantize_axis, dequantize


@pytest.mark.parametrize("M,K,N", [(8, 128, 256), (3, 256, 128), (130, 384, 512)])
def test_matches_dequant_reference(M, K, N):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (M, K), jnp.float32) * 0.5
    w = jax.random.normal(kw, (K, N), jnp.float32) * 0.05
    qw = _quantize_axis(w, (0,))  # scale [1, N]

    ref = x @ np.asarray(dequantize(qw, jnp.float32))
    out = quant_matmul(
        x, qw["q"], qw["s"], out_dtype=jnp.float32,
        bm=64, bn=128, bk=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


def test_quant_apply_multidim():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    B, T, D, NH, HD = 2, 4, 64, 4, 16
    x = jax.random.normal(kx, (B, T, D), jnp.float32) * 0.3
    w = jax.random.normal(kw, (D, NH, HD), jnp.float32) * 0.05
    qw = _quantize_axis(w, (0,))  # scale [1, NH, HD]

    ref = jnp.einsum("btd,dnh->btnh", x, dequantize(qw, jnp.float32))
    out = quant_apply(x, qw, (NH, HD), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_plain_array_passthrough():
    x = jnp.ones((2, 8))
    w = jnp.full((8, 4), 0.5)
    out = quant_apply(x, w, (4,))
    np.testing.assert_allclose(np.asarray(out), np.full((2, 4), 4.0), rtol=1e-6)
