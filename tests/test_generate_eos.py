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


def test_stop_sequence_stops_generation():
    """A stop-id sequence compiled into the loop ends decode at the match."""
    params = init_decoder_params(CFG, jax.random.PRNGKey(0))
    B, P = 1, 8
    prefix = jax.random.normal(jax.random.PRNGKey(1), (B, P, CFG.hidden_size)) * 0.05
    emb = build_combined_embedding(
        params["embed"], jnp.zeros((1, CFG.hidden_size)),
        jnp.zeros((CFG.time_vocab_size, CFG.hidden_size)),
        jnp.zeros((CFG.score_vocab_size, CFG.hidden_size)),
    )

    def run(stop_ids=None):
        return generate_jit(
            params, CFG, prefix, jnp.ones((B, P), bool), emb,
            jnp.zeros((B,), jnp.int32),
            max_new_tokens=16, cache_len=64, eos_id=-5,
            rng=jax.random.PRNGKey(2), stop_ids=stop_ids,
        )

    # unconstrained pass: record the greedy stream
    tokens, num = run()
    stream = np.asarray(tokens)[0]
    assert int(np.asarray(num)[0]) == 16

    # stop at the bigram (stream[2], stream[3]): the match tokens are still
    # emitted, everything after is PAD
    stop = jnp.asarray([[int(stream[2]), int(stream[3])]], jnp.int32)
    tokens, num = run(stop_ids=stop)
    tokens = np.asarray(tokens)[0]
    assert (tokens[:4] == stream[:4]).all()
    assert (tokens[4:] == PAD_OUTPUT_ID).all()
    assert int(np.asarray(num)[0]) == 4

    # a non-matching stop sequence changes nothing (negative ids are the
    # padding convention, so use an out-of-vocab positive id)
    nv = CFG.combined_vocab_size + 7
    stop = jnp.asarray([[nv, nv]], jnp.int32)
    tokens, num = run(stop_ids=stop)
    assert int(np.asarray(num)[0]) == 16

    # single-token stop hit at step 0
    stop = jnp.asarray([[int(stream[0])]], jnp.int32)
    tokens, num = run(stop_ids=stop)
    tokens = np.asarray(tokens)[0]
    assert tokens[0] == stream[0]
    assert (tokens[1:] == PAD_OUTPUT_ID).all()


def test_stop_sequence_batched_rows_independent():
    """Rows hit stops independently; finished rows pad while others run."""
    params = init_decoder_params(CFG, jax.random.PRNGKey(0))
    B, P = 2, 8
    prefix = jnp.stack([
        jax.random.normal(jax.random.PRNGKey(i), (P, CFG.hidden_size)) * 0.05
        for i in (1, 7)
    ])
    emb = build_combined_embedding(
        params["embed"], jnp.zeros((1, CFG.hidden_size)),
        jnp.zeros((CFG.time_vocab_size, CFG.hidden_size)),
        jnp.zeros((CFG.score_vocab_size, CFG.hidden_size)),
    )

    def run(stop_ids=None):
        return generate_jit(
            params, CFG, prefix, jnp.ones((B, P), bool), emb,
            jnp.zeros((B,), jnp.int32),
            max_new_tokens=12, cache_len=64, eos_id=-5,
            rng=jax.random.PRNGKey(2), stop_ids=stop_ids,
        )

    tokens, _ = run()
    free = np.asarray(tokens)
    # pick a stop that matches row 0's position-1 token but (almost surely)
    # not row 1's stream at the same place
    stop = jnp.asarray([[int(free[0, 1])]], jnp.int32)
    tokens, num = run(stop_ids=stop)
    tokens, num = np.asarray(tokens), np.asarray(num)
    assert num[0] == 2
    assert (tokens[0, 2:] == PAD_OUTPUT_ID).all()
    if int(free[1, 1]) != int(free[0, 1]):
        assert num[1] > 2  # row 1 kept decoding
