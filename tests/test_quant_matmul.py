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


class TestStackedQuantMatmul:
    """Layer-stacked in-place weight reads (quant_matmul_stacked): the
    decode-step path that avoids per-layer weight-slice temps."""

    def test_matches_per_layer_apply(self):
        from trace_tpu.kernels.quant_matmul import quant_apply_stacked

        L, K, N, M = 3, 128, 256, 8
        kx, kw = jax.random.split(jax.random.PRNGKey(2))
        x = jax.random.normal(kx, (M, K), jnp.float32) * 0.3
        w = jax.random.normal(kw, (L, K, N), jnp.float32) * 0.05
        leaf = _quantize_axis(w, (1,))  # scale [L, 1, N]
        for li in range(L):
            per_layer = {"q": leaf["q"][li], "s": leaf["s"][li]}
            want = quant_apply(x, per_layer, (N,), out_dtype=jnp.float32,
                               interpret=True)
            got = quant_apply_stacked(
                x, leaf, jnp.int32(li), (N,), out_dtype=jnp.float32,
                interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
            )

    def test_multidim_out_shape(self):
        from trace_tpu.kernels.quant_matmul import quant_apply_stacked

        L, B, D, NH, HD = 2, 4, 128, 2, 128
        kx, kw = jax.random.split(jax.random.PRNGKey(3))
        x = jax.random.normal(kx, (B, 1, D), jnp.float32) * 0.3
        w = jax.random.normal(kw, (L, D, NH, HD), jnp.float32) * 0.05
        leaf = _quantize_axis(w, (1,))
        got = quant_apply_stacked(x, leaf, jnp.int32(1), (NH, HD), interpret=True)
        ref = jnp.einsum("btd,dnh->btnh", x, dequantize(
            {"q": leaf["q"][1], "s": leaf["s"][1]}, jnp.float32))
        assert got.shape == (B, 1, NH, HD)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2
        )


class TestStackedDecodePath:
    """decoder_forward routes single-token int8 decode through
    _decode_layer_stacked; outputs must match the per-layer-slice path."""

    def _cfg(self):
        from trace_tpu.model.config import DecoderConfig

        # head_dim 128 (the kernel's lane requirement) at tiny widths
        return DecoderConfig(
            vocab_size=384, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=2, num_kv_heads=2, head_dim=128,
            max_seq_len=128, kv_cache_dtype="int8",
        )

    def test_decode_step_matches_sliced_path(self, monkeypatch):
        from trace_tpu.model.config import DecoderConfig
        from trace_tpu.model.mistral import (
            decoder_forward,
            init_decoder_params,
            init_kv_cache,
        )
        from trace_tpu.model.quantize import quantize_decoder_params

        cfg = self._cfg()
        params = quantize_decoder_params(
            init_decoder_params(cfg, jax.random.PRNGKey(4))
        )
        cache = init_kv_cache(cfg, 2, 16)
        B, S = 2, 16
        x = jax.random.normal(jax.random.PRNGKey(5), (B, 1, cfg.hidden_size)) * 0.2
        mask = jnp.ones((B, 1), bool)
        pos = jnp.full((B, 1), 3, jnp.int32)
        cache_mask = jnp.zeros((B, S), bool).at[:, :3].set(True)

        # force the pallas interpret kernels on CPU for the stacked route
        monkeypatch.setenv("TRACE_TPU_DECODE_ATTN", "force")
        monkeypatch.setenv("TRACE_TPU_STACKED_QMM", "1")
        h_stacked, c_stacked = decoder_forward(
            params, cfg, x, mask, pos,
            cache=cache, cache_index=jnp.int32(3), cache_mask=cache_mask,
        )
        monkeypatch.setenv("TRACE_TPU_STACKED_QMM", "0")
        h_ref, c_ref = decoder_forward(
            params, cfg, x, mask, pos,
            cache=cache, cache_index=jnp.int32(3), cache_mask=cache_mask,
        )
        np.testing.assert_allclose(
            np.asarray(h_stacked), np.asarray(h_ref), rtol=2e-2, atol=2e-3
        )
        for ka in ("kq", "ks", "vq", "vs"):
            np.testing.assert_allclose(
                np.asarray(c_stacked[ka]), np.asarray(c_ref[ka]),
                rtol=1e-2, atol=1,
            )
