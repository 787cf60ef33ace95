"""trace-retrieval constrained decoding: emitted timestamps must equal one of
the input frame timestamps."""

import jax
import jax.numpy as jnp
import numpy as np

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import init_decoder_params
from trace_tpu.runtime.generate import (
    PAD_OUTPUT_ID,
    build_combined_embedding,
    generate_jit,
)
from trace_tpu.tokenizers.event_codec import TIME_CODEC

CFG = DecoderConfig.tiny()


def _emb(params, key):
    return build_combined_embedding(
        params["embed"],
        jax.random.normal(key, (1, CFG.hidden_size)) * 0.02,
        jax.random.normal(key, (CFG.time_vocab_size, CFG.hidden_size)) * 0.02,
        jax.random.normal(key, (CFG.score_vocab_size, CFG.hidden_size)) * 0.02,
    )


def test_constrained_timestamps_match_frames():
    params = init_decoder_params(CFG, jax.random.PRNGKey(3))
    B, P = 2, 8
    prefix = jax.random.normal(jax.random.PRNGKey(4), (B, P, CFG.hidden_size)) * 0.05
    frame_ts = [0.0, 12.5, 47.3, 103.9]
    frame_ids = jnp.asarray(
        np.stack([TIME_CODEC.encode_value(t) for t in frame_ts])
    )[None].repeat(B, axis=0)  # [B, T, 6]

    tokens, _ = generate_jit(
        params, CFG,
        prefix, jnp.ones((B, P), bool),
        _emb(params, jax.random.PRNGKey(5)),
        jnp.full((B,), 1, jnp.int32),
        max_new_tokens=60, cache_len=128, temperature=1.0,
        constrain_time=True, frame_time_ids=frame_ids,
        rng=jax.random.PRNGKey(6),
    )
    tokens = np.asarray(tokens)

    v, vt = CFG.vocab_size, CFG.time_vocab_size
    allowed = set(frame_ts)
    for b in range(B):
        chars = []
        for tok in tokens[b]:
            tok = int(tok)
            if tok in (PAD_OUTPUT_ID, 2):
                break
            if v + 1 <= tok < v + 1 + vt:
                local = tok - (v + 1)
                if local >= 2:  # digit or '.'
                    chars.append(TIME_CODEC.token_str(local))
                else:  # sep or sync flush a complete value
                    if chars:
                        value = float("".join(chars))
                        assert value in allowed, (value, allowed)
                        assert len(chars) == 6
                    chars = []
        if chars:
            assert float("".join(chars)) in allowed
