"""Early EOS exit: the decode loop stops when every row emits EOS."""

import jax
import jax.numpy as jnp
import numpy as np

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import init_decoder_params
from trace_tpu.runtime.generate import PAD_OUTPUT_ID, build_combined_embedding, generate_jit

CFG = DecoderConfig.tiny()


def test_eos_stops_generation():
    params = init_decoder_params(CFG, jax.random.PRNGKey(0))
    # bias the text head hard toward EOS (id 2)
    params = dict(params)
    params["lm_head"] = params["lm_head"].at[:, 2].set(100.0)

    B, P = 2, 8
    prefix = jax.random.normal(jax.random.PRNGKey(1), (B, P, CFG.hidden_size)) * 0.05
    emb = build_combined_embedding(
        params["embed"], jnp.zeros((1, CFG.hidden_size)),
        jnp.zeros((CFG.time_vocab_size, CFG.hidden_size)),
        jnp.zeros((CFG.score_vocab_size, CFG.hidden_size)),
    )
    tokens, num = generate_jit(
        params, CFG, prefix, jnp.ones((B, P), bool), emb,
        jnp.zeros((B,), jnp.int32),  # start on the text head
        max_new_tokens=16, cache_len=64, rng=jax.random.PRNGKey(2),
    )
    tokens = np.asarray(tokens)
    assert (tokens[:, 0] == 2).all()
    assert (tokens[:, 1:] == PAD_OUTPUT_ID).all()
    assert (np.asarray(num) == 1).all()
