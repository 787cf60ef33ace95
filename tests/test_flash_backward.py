"""Pallas flash-attention backward vs XLA autodiff reference."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trace_tpu.kernels.flash_attention import xla_attention
from trace_tpu.kernels.flash_backward import (
    flash_attention_bwd,
    flash_attention_fwd_res,
)

B, H, NKV, HD = 2, 4, 2, 64
TQ = TK = 256


def _inputs(key, causal):
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (B, H, TQ, HD), jnp.float32) * 0.5
    k = jax.random.normal(ks[1], (B, NKV, TK, HD), jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (B, NKV, TK, HD), jnp.float32) * 0.5
    # left-padded rows of different lengths
    valid = jnp.arange(TK)[None, :] >= jnp.array([[3], [60]])
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)
    do = jax.random.normal(ks[3], (B, H, TQ, HD), jnp.float32)
    # zero cotangents on padded query rows (loss ignores padding)
    do = do * valid[:, None, :TQ, None]
    return q, k, v, bias, do


@pytest.mark.parametrize("causal", [False, True])
def test_grads_match_xla(causal):
    q, k, v, bias, do = _inputs(jax.random.PRNGKey(0), causal)

    o, lse = flash_attention_fwd_res(q, k, v, bias, causal=causal, interpret=True)
    o_ref = xla_attention(q, k, v, bias, causal=causal)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), rtol=2e-5, atol=2e-5)

    dq, dk, dv = flash_attention_bwd(
        q, k, v, bias, o, lse, do, causal=causal, interpret=True
    )
    _, vjp = jax.vjp(
        lambda q_, k_, v_: xla_attention(q_, k_, v_, bias, causal=causal), q, k, v
    )
    dq_ref, dk_ref, dv_ref = vjp(do)
    for got, want, name in ((dq, dq_ref, "dq"), (dk, dk_ref, "dk"), (dv, dv_ref, "dv")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_trainable_wrapper_grad():
    """flash_attention_trainable's custom_vjp end-to-end on CPU interpret."""
    from trace_tpu.kernels import flash_backward as fb
    from trace_tpu.kernels.flash_attention import flash_attention_trainable

    q, k, v, bias, do = _inputs(jax.random.PRNGKey(1), True)

    orig_fwd, orig_bwd = fb.flash_attention_fwd_res, fb.flash_attention_bwd
    fb.flash_attention_fwd_res = functools.partial(orig_fwd, interpret=True)
    fb.flash_attention_bwd = functools.partial(orig_bwd, interpret=True)
    try:
        def loss(q_, k_, v_):
            return jnp.sum(flash_attention_trainable(q_, k_, v_, bias, True) * do)

        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        fb.flash_attention_fwd_res, fb.flash_attention_bwd = orig_fwd, orig_bwd

    def loss_ref(q_, k_, v_):
        return jnp.sum(xla_attention(q_, k_, v_, bias, causal=True) * do)

    dq_r, dk_r, dv_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want in ((dq, dq_r), (dk, dk_r), (dv, dv_r)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )
