"""Pallas decode-attention kernel vs the XLA slice-then-attend reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trace_tpu.kernels.decode_attention import (
    decode_attention,
    decode_attention_supported,
)
from trace_tpu.model.mistral import _attention, _quantize_kv

L, B, NKV, G, S, HD = 3, 2, 2, 4, 256, 128
H = NKV * G


def _random_case(key, quant):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, H, 1, HD), jnp.float32)
    k = jax.random.normal(ks[1], (L, B, NKV, S, HD), jnp.float32)
    v = jax.random.normal(ks[2], (L, B, NKV, S, HD), jnp.float32)
    # valid-prefix mask rows of differing lengths per batch row
    valid = jnp.arange(S)[None, :] < jnp.array([[97], [180]])
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)
    if quant:
        kq, kscale = _quantize_kv(k.reshape(L * B, NKV, S, HD))
        vq, vscale = _quantize_kv(v.reshape(L * B, NKV, S, HD))
        cache = {
            "kq": kq.reshape(L, B, NKV, S, HD),
            "ks": kscale.reshape(L, B, NKV, 1, S),
            "vq": vq.reshape(L, B, NKV, S, HD),
            "vs": vscale.reshape(L, B, NKV, 1, S),
        }
        # the XLA reference attends over the dequantized cache
        k_ref = cache["kq"].astype(jnp.float32) * jnp.swapaxes(
            cache["ks"], -1, -2
        ).astype(jnp.float32)
        v_ref = cache["vq"].astype(jnp.float32) * jnp.swapaxes(
            cache["vs"], -1, -2
        ).astype(jnp.float32)
    else:
        cache = (k, v)
        k_ref, v_ref = k, v
    return q, cache, bias, k_ref, v_ref


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("li", [0, 2])
def test_matches_xla_reference(quant, li):
    q, cache, bias, k_ref, v_ref = _random_case(jax.random.PRNGKey(li), quant)
    assert decode_attention_supported(q, cache)

    got = decode_attention(
        q, cache, jnp.int32(li), bias, interpret=True
    )
    want = _attention(
        q, k_ref[li], v_ref[li], bias[:, None, None, :]
    )
    tol = 2e-2 if quant else 1e-5
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol,
    )


@pytest.mark.parametrize("li", [0, 1])
def test_s8dot_matches_dequant_kernel(monkeypatch, li):
    """The s8xs8-dot int8 kernel (q/probability row-quant, MXU int8 dots)
    vs the dequant-in-register kernel: both approximate the same math; the
    extra error from the two row quantizations is ~1/254 per operand."""
    q, cache, bias, k_ref, v_ref = _random_case(jax.random.PRNGKey(li), True)
    monkeypatch.setenv("TRACE_TPU_DECODE_ATTN_S8", "1")
    got_s8 = decode_attention(q, cache, jnp.int32(li), bias, interpret=True)
    monkeypatch.setenv("TRACE_TPU_DECODE_ATTN_S8", "2")
    got_stacked = decode_attention(q, cache, jnp.int32(li), bias, interpret=True)
    monkeypatch.setenv("TRACE_TPU_DECODE_ATTN_S8", "0")
    got_deq = decode_attention(q, cache, jnp.int32(li), bias, interpret=True)
    want = _attention(q, k_ref[li], v_ref[li], bias[:, None, None, :])
    for got in (got_s8, got_stacked, got_deq):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2,
        )
    # the two kernels agree with each other at the same tolerance
    np.testing.assert_allclose(
        np.asarray(got_s8, np.float32), np.asarray(got_deq, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    # stacked is the same math as per-head s8dot, only the op batching
    # differs — elementwise identical up to f32 noise
    np.testing.assert_allclose(
        np.asarray(got_stacked, np.float32), np.asarray(got_s8, np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_bf16_inputs():
    q, cache, bias, k_ref, v_ref = _random_case(jax.random.PRNGKey(7), False)
    qb = q.astype(jnp.bfloat16)
    cb = (cache[0].astype(jnp.bfloat16), cache[1].astype(jnp.bfloat16))
    got = decode_attention(qb, cb, jnp.int32(1), bias, interpret=True)
    want = _attention(qb, cb[0][1], cb[1][1], bias[:, None, None, :])
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_supported_gate():
    q = jnp.zeros((1, 4, 1, 64))  # hd 64 not tile-legal
    cache = (jnp.zeros((2, 1, 2, 256, 64)),) * 2
    assert not decode_attention_supported(q, cache)
    q2 = jnp.zeros((1, 4, 2, 128))  # T=2 not a decode step
    cache2 = (jnp.zeros((2, 1, 2, 256, 128)),) * 2
    assert not decode_attention_supported(q2, cache2)


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_decoder_forward_integration(monkeypatch, kv_dtype):
    """Full _layer routing: force-mode kernel step == default XLA step."""
    import dataclasses

    from trace_tpu.model.config import DecoderConfig
    from trace_tpu.model.mistral import (
        decoder_forward,
        init_decoder_params,
        init_kv_cache,
    )

    cfg = dataclasses.replace(
        DecoderConfig.tiny(), num_heads=4, num_kv_heads=2, head_dim=128,
        hidden_size=128, kv_cache_dtype=kv_dtype,
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    Bx, P, Sx = 2, 5, 128
    x = jax.random.normal(jax.random.PRNGKey(1), (Bx, P + 1, cfg.hidden_size)) * 0.1
    pos = jnp.broadcast_to(jnp.arange(P + 1), (Bx, P + 1))

    def one_step():
        cache = init_kv_cache(cfg, Bx, Sx)
        _, cache = decoder_forward(
            params, cfg, x[:, :P], jnp.ones((Bx, P), bool), pos[:, :P],
            cache=cache, cache_index=jnp.int32(0),
            cache_mask=jnp.zeros((Bx, Sx), bool),
        )
        mask = jnp.zeros((Bx, Sx), bool).at[:, :P].set(True)
        h, _ = decoder_forward(
            params, cfg, x[:, P:], jnp.ones((Bx, 1), bool), pos[:, P:],
            cache=cache, cache_index=jnp.int32(P), cache_mask=mask,
        )
        return h

    monkeypatch.setenv("TRACE_TPU_DECODE_ATTN", "xla")
    h_xla = one_step()
    monkeypatch.setenv("TRACE_TPU_DECODE_ATTN", "force")
    h_pallas = one_step()
    np.testing.assert_allclose(
        np.asarray(h_pallas, np.float32), np.asarray(h_xla, np.float32),
        rtol=2e-2 if kv_dtype == "int8" else 5e-3,
        atol=2e-2 if kv_dtype == "int8" else 5e-3,
    )
