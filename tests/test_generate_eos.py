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
    B, P = 1, 8
    prefix = jax.random.normal(jax.random.PRNGKey(1), (B, P, CFG.hidden_size)) * 0.05
    emb = build_combined_embedding(
        params["embed"], jnp.zeros((1, CFG.hidden_size)),
        jnp.zeros((CFG.time_vocab_size, CFG.hidden_size)),
        jnp.zeros((CFG.score_vocab_size, CFG.hidden_size)),
    )

    def run(eos_id):
        return generate_jit(
            params, CFG, prefix, jnp.ones((B, P), bool), emb,
            jnp.zeros((B,), jnp.int32),  # start on the text head
            max_new_tokens=16, cache_len=64, eos_id=eos_id,
            rng=jax.random.PRNGKey(2),
        )

    # first pass with an impossible EOS: find what greedy emits first
    tokens, num = run(eos_id=-5)
    first = int(np.asarray(tokens)[0, 0])
    assert int(np.asarray(num)[0]) == 16  # ran to the token budget

    # second pass treating that token as EOS: must stop after one token
    tokens, num = run(eos_id=first)
    tokens = np.asarray(tokens)
    assert tokens[0, 0] == first
    assert (tokens[0, 1:] == PAD_OUTPUT_ID).all()
    assert int(np.asarray(num)[0]) == 1
