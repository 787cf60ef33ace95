"""Full Mixtral-family decoder: forward, cache parity, FSM generation."""

import jax
import jax.numpy as jnp
import numpy as np

from trace_tpu.model.mistral import (
    compute_logits,
    decoder_forward,
    init_kv_cache,
)
from trace_tpu.model.moe import MoEConfig, init_moe_decoder_params
from trace_tpu.runtime.generate import build_combined_embedding, generate

CFG = MoEConfig.tiny_moe()


def test_forward_and_logits():
    params = init_moe_decoder_params(CFG, jax.random.PRNGKey(0))
    assert "router" in params["layers"]
    B, T = 2, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, CFG.hidden_size)) * 0.1
    h, _ = decoder_forward(
        params, CFG, x, jnp.ones((B, T), bool),
        jnp.broadcast_to(jnp.arange(T), (B, T)),
    )
    logits = compute_logits(params, h)
    assert logits.shape == (B, T, CFG.combined_vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_decode_step_matches_full_forward():
    params = init_moe_decoder_params(CFG, jax.random.PRNGKey(2))
    B, P, S = 1, 6, 16
    x = jax.random.normal(jax.random.PRNGKey(3), (B, P + 1, CFG.hidden_size)) * 0.1
    pos = jnp.broadcast_to(jnp.arange(P + 1), (B, P + 1))

    h_full, _ = decoder_forward(params, CFG, x, jnp.ones((B, P + 1), bool), pos)

    cache = init_kv_cache(CFG, B, S, dtype=jnp.float32)
    _, cache = decoder_forward(
        params, CFG, x[:, :P], jnp.ones((B, P), bool), pos[:, :P],
        cache=cache, cache_index=jnp.int32(0),
        cache_mask=jnp.zeros((B, S), bool),
    )
    mask = jnp.zeros((B, S), bool).at[:, :P].set(True)
    h_step, _ = decoder_forward(
        params, CFG, x[:, P:], jnp.ones((B, 1), bool), pos[:, P:],
        cache=cache, cache_index=jnp.int32(P), cache_mask=mask,
    )
    np.testing.assert_allclose(
        np.asarray(h_full[:, -1]), np.asarray(h_step[:, 0]), rtol=1e-4, atol=1e-4
    )


def test_fsm_generation_runs():
    params = init_moe_decoder_params(CFG, jax.random.PRNGKey(4))
    prefix = jax.random.normal(jax.random.PRNGKey(5), (1, 4, CFG.hidden_size)) * 0.05
    emb = build_combined_embedding(
        params["embed"], jnp.zeros((1, CFG.hidden_size)),
        jnp.zeros((CFG.time_vocab_size, CFG.hidden_size)),
        jnp.zeros((CFG.score_vocab_size, CFG.hidden_size)),
    )
    out = generate(
        params, CFG, prefix, jnp.ones((1, 4), bool), emb,
        max_new_tokens=10, initial_head=1, pad_to_multiple=4,
    )
    assert out.tokens.shape == (1, 10)
