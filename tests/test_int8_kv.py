"""int8 KV cache: decode outputs close to the bf16-cache path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import (
    decoder_forward,
    init_decoder_params,
    init_kv_cache,
)

CFG = DecoderConfig.tiny()
CFG_INT8 = dataclasses.replace(CFG, kv_cache_dtype="int8")


def _run(cfg, cache):
    params = init_decoder_params(CFG, jax.random.PRNGKey(0))
    B, P = 1, 10
    x = jax.random.normal(jax.random.PRNGKey(1), (B, P + 1, CFG.hidden_size)) * 0.1
    pos = jnp.broadcast_to(jnp.arange(P + 1), (B, P + 1))

    _, cache = decoder_forward(
        params, cfg, x[:, :P], jnp.ones((B, P), bool), pos[:, :P],
        cache=cache, cache_index=jnp.int32(0),
        cache_mask=jnp.zeros((B, 32), bool),
    )
    mask = jnp.zeros((B, 32), bool).at[:, :P].set(True)
    h, _ = decoder_forward(
        params, cfg, x[:, P:], jnp.ones((B, 1), bool), pos[:, P:],
        cache=cache, cache_index=jnp.int32(P), cache_mask=mask,
    )
    return np.asarray(h[:, 0])


def test_int8_cache_close_to_bf16():
    out_fp = _run(CFG, init_kv_cache(CFG, 1, 32, dtype=jnp.float32))
    out_q = _run(CFG_INT8, init_kv_cache(CFG_INT8, 1, 32))
    # per-slot-per-head int8 quantization: small relative error
    denom = np.abs(out_fp).max()
    assert np.abs(out_fp - out_q).max() / denom < 0.05


def test_int8_cache_structure():
    c = init_kv_cache(CFG_INT8, 2, 16)
    assert set(c.keys()) == {"kq", "ks", "vq", "vs"}
    assert c["kq"].dtype == jnp.int8
    # scales keep the slot axis in the LANE dim ([.., 1, S]): a trailing
    # singleton pads 128x under TPU (8,128) tiling
    assert c["ks"].shape == c["kq"].shape[:-2] + (1, c["kq"].shape[-2])
