"""flash_attention_trainable: gradients match the pure-XLA attention."""

import jax
import jax.numpy as jnp
import numpy as np

from trace_tpu.kernels import flash_attention as FA


def test_grads_match_xla(monkeypatch):
    # run the Pallas kernels in interpret mode on CPU
    from trace_tpu.kernels import flash_backward as FB

    orig = FA.flash_attention
    monkeypatch.setattr(
        FA, "flash_attention",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )
    orig_fwd, orig_bwd = FB.flash_attention_fwd_res, FB.flash_attention_bwd
    monkeypatch.setattr(
        FB, "flash_attention_fwd_res",
        lambda *a, **kw: orig_fwd(*a, **{**kw, "interpret": True}),
    )
    monkeypatch.setattr(
        FB, "flash_attention_bwd",
        lambda *a, **kw: orig_bwd(*a, **{**kw, "interpret": True}),
    )

    B, H, T, hd = 1, 2, 128, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, T, hd))
    k = jax.random.normal(ks[1], (B, H, T, hd))
    v = jax.random.normal(ks[2], (B, H, T, hd))
    bias = jnp.zeros((B, T))

    def loss_flash(q, k, v):
        return jnp.sum(FA.flash_attention_trainable(q, k, v, bias, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(FA.xla_attention(q, k, v, bias, causal=True) ** 2)

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
