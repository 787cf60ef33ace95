"""Decoder correctness: shapes, cache-vs-full-attention parity, head FSM."""

import jax
import jax.numpy as jnp
import numpy as np

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import (
    compute_logits,
    decoder_forward,
    init_decoder_params,
    init_kv_cache,
)
from trace_tpu.runtime.generate import (
    PAD_OUTPUT_ID,
    build_combined_embedding,
    generate,
    head_mask_table,
    swap_heads,
)

CFG = DecoderConfig.tiny()


def _params(seed=0):
    return init_decoder_params(CFG, jax.random.PRNGKey(seed))


def _embeds(seed, B, T):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, T, CFG.hidden_size)) * 0.1


class TestForward:
    def test_shapes(self):
        params = _params()
        B, T = 2, 16
        x = _embeds(1, B, T)
        mask = jnp.ones((B, T), bool)
        pos = jnp.broadcast_to(jnp.arange(T), (B, T))
        hidden, _ = decoder_forward(params, CFG, x, mask, pos)
        assert hidden.shape == (B, T, CFG.hidden_size)
        logits = compute_logits(params, hidden)
        assert logits.shape == (B, T, CFG.combined_vocab_size)
        assert logits.dtype == jnp.float32

    def test_causality(self):
        """Changing a future token must not affect earlier positions."""
        params = _params()
        B, T = 1, 8
        x = _embeds(2, B, T)
        mask = jnp.ones((B, T), bool)
        pos = jnp.broadcast_to(jnp.arange(T), (B, T))
        h1, _ = decoder_forward(params, CFG, x, mask, pos)
        x2 = x.at[:, -1].add(1.0)
        h2, _ = decoder_forward(params, CFG, x2, mask, pos)
        np.testing.assert_allclose(h1[:, :-1], h2[:, :-1], rtol=1e-5, atol=1e-5)
        assert not np.allclose(h1[:, -1], h2[:, -1])

    def test_prefill_matches_full_forward(self):
        params = _params()
        B, T, S = 2, 12, 32
        x = _embeds(3, B, T)
        mask = jnp.ones((B, T), bool)
        pos = jnp.broadcast_to(jnp.arange(T), (B, T))

        h_full, _ = decoder_forward(params, CFG, x, mask, pos)

        cache = init_kv_cache(CFG, B, S, dtype=jnp.float32)
        h_pre, _ = decoder_forward(
            params, CFG, x, mask, pos,
            cache=cache, cache_index=jnp.int32(0),
            cache_mask=jnp.zeros((B, S), bool),
        )
        np.testing.assert_allclose(h_full, h_pre, rtol=1e-5, atol=1e-5)

    def test_decode_step_matches_full_forward(self):
        """prefill(P) + one cached decode step == full forward over P+1."""
        params = _params()
        B, P, S = 2, 10, 32
        x = _embeds(4, B, P + 1)
        pos = jnp.broadcast_to(jnp.arange(P + 1), (B, P + 1))

        h_full, _ = decoder_forward(
            params, CFG, x, jnp.ones((B, P + 1), bool), pos
        )

        cache = init_kv_cache(CFG, B, S, dtype=jnp.float32)
        _, cache = decoder_forward(
            params, CFG, x[:, :P], jnp.ones((B, P), bool), pos[:, :P],
            cache=cache, cache_index=jnp.int32(0),
            cache_mask=jnp.zeros((B, S), bool),
        )
        cache_mask = jnp.zeros((B, S), bool).at[:, :P].set(True)
        h_step, _ = decoder_forward(
            params, CFG, x[:, P:], jnp.ones((B, 1), bool), pos[:, P:],
            cache=cache, cache_index=jnp.int32(P), cache_mask=cache_mask,
        )
        np.testing.assert_allclose(h_full[:, -1], h_step[:, 0], rtol=1e-4, atol=1e-4)

    def test_left_padding_ignored(self):
        """A left-padded prefix must give the same last-position output."""
        params = _params()
        T, PAD = 8, 4
        x = _embeds(5, 1, T)
        pos = jnp.arange(T)[None, :]
        h_ref, _ = decoder_forward(params, CFG, x, jnp.ones((1, T), bool), pos)

        xp = jnp.pad(x, ((0, 0), (PAD, 0), (0, 0)))
        maskp = jnp.pad(jnp.ones((1, T), bool), ((0, 0), (PAD, 0)))
        posp = jnp.maximum(jnp.cumsum(maskp.astype(jnp.int32), axis=1) - 1, 0)
        S = 32
        cache = init_kv_cache(CFG, 1, S, dtype=jnp.float32)
        h_pad, _ = decoder_forward(
            params, CFG, xp, maskp, posp,
            cache=cache, cache_index=jnp.int32(0),
            cache_mask=jnp.zeros((1, S), bool),
        )
        np.testing.assert_allclose(h_ref[:, -1], h_pad[:, -1], rtol=1e-4, atol=1e-4)


class TestHeadFSM:
    def test_mask_table_slices(self):
        t = np.asarray(head_mask_table(CFG))
        v, vt, vs = CFG.vocab_size, CFG.time_vocab_size, CFG.score_vocab_size
        assert (t[0, : v + 1] == 0).all() and (t[0, v + 1 :] < -1e29).all()
        assert (t[1, v + 1 : v + 1 + vt] == 0).all()
        assert (t[2, v + 1 + vt :] == 0).all()

    def test_swap_rules(self):
        v, vt = CFG.vocab_size, CFG.time_vocab_size
        head = jnp.array([0, 1, 2, 0], jnp.int32)
        tok = jnp.array([v, v + 1, v + 1 + vt, 5], jnp.int32)
        out = np.asarray(swap_heads(CFG, head, tok))
        assert out.tolist() == [1, 2, 0, 0]

    def test_generated_stream_obeys_grammar(self):
        """Random weights + FSM masking => stream must follow the event grammar."""
        params = _params(7)
        B, P = 2, 6
        prefix = _embeds(8, B, P) * 0.05
        mask = jnp.ones((B, P), bool)
        key = jax.random.PRNGKey(9)
        emb = build_combined_embedding(
            params["embed"],
            jax.random.normal(key, (1, CFG.hidden_size)) * 0.02,
            jax.random.normal(key, (CFG.time_vocab_size, CFG.hidden_size)) * 0.02,
            jax.random.normal(key, (CFG.score_vocab_size, CFG.hidden_size)) * 0.02,
        )
        out = generate(
            params, CFG, prefix, mask, emb,
            max_new_tokens=40, initial_head=1, temperature=1.0,
            pad_to_multiple=8,
        )
        v, vt, vs = CFG.vocab_size, CFG.time_vocab_size, CFG.score_vocab_size

        for b in range(B):
            head = 1
            for tok in out.tokens[b]:
                tok = int(tok)
                if tok == PAD_OUTPUT_ID:
                    break
                if tok == 2:  # eos (text block) — row finished
                    assert head == 0
                    break
                if head == 0:
                    assert 0 <= tok <= v
                elif head == 1:
                    assert v + 1 <= tok < v + 1 + vt
                else:
                    assert v + 1 + vt <= tok < v + 1 + vt + vs
                if tok == v:
                    head = 1
                elif tok == v + 1:
                    head = 2
                elif tok == v + 1 + vt:
                    head = 0

    def test_greedy_deterministic(self):
        params = _params(11)
        prefix = _embeds(12, 1, 4)
        mask = jnp.ones((1, 4), bool)
        emb = build_combined_embedding(
            params["embed"],
            jnp.zeros((1, CFG.hidden_size)),
            jnp.zeros((CFG.time_vocab_size, CFG.hidden_size)),
            jnp.zeros((CFG.score_vocab_size, CFG.hidden_size)),
        )
        a = generate(params, CFG, prefix, mask, emb, max_new_tokens=12, pad_to_multiple=8)
        b = generate(params, CFG, prefix, mask, emb, max_new_tokens=12, pad_to_multiple=8)
        assert (a.tokens == b.tokens).all()
