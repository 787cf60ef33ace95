"""Serving-style prefill/decode split == monolithic generate_jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import init_decoder_params, init_kv_cache
from trace_tpu.runtime.generate import (
    build_combined_embedding,
    decode_jit,
    generate_jit,
    merge_cache_rows,
    prefill_jit,
)

CFG = DecoderConfig.tiny()


def _setup(key):
    params = init_decoder_params(CFG, key)
    emb = build_combined_embedding(
        params["embed"], jnp.zeros((1, CFG.hidden_size)),
        jnp.zeros((CFG.time_vocab_size, CFG.hidden_size)),
        jnp.zeros((CFG.score_vocab_size, CFG.hidden_size)),
    )
    B, P, new = 4, 8, 12
    prefix = jax.random.normal(jax.random.PRNGKey(7), (B, P, CFG.hidden_size)) * 0.1
    # two rows left-padded to different real lengths
    mask = jnp.ones((B, P), bool).at[0, :3].set(False).at[2, :1].set(False)
    return params, emb, prefix, mask, B, P, new


@pytest.mark.parametrize("sub", [2, 4])
def test_split_matches_monolithic(sub):
    params, emb, prefix, mask, B, P, new = _setup(jax.random.PRNGKey(0))
    S = P + new
    heads = jnp.ones((B,), jnp.int32)

    want_tokens, want_num = generate_jit(
        params, CFG, prefix, mask, emb, heads,
        max_new_tokens=new, cache_len=S, rng=jax.random.PRNGKey(0),
    )

    # prefill in sub-batches, merge into the big cache, decode once
    big = init_kv_cache(CFG, B, S, dtype=prefix.dtype)
    cms, lhs, nps = [], [], []
    for r in range(0, B, sub):
        cache, cm, lh, np_ = prefill_jit(
            params, CFG, prefix[r : r + sub], mask[r : r + sub],
            cache_len=S, use_flash=False,
        )
        big = merge_cache_rows(big, cache, jnp.int32(r))
        cms.append(cm)
        lhs.append(lh)
        nps.append(np_)

    got_tokens, got_num, _ = decode_jit(
        params, CFG, big, jnp.concatenate(cms), jnp.concatenate(lhs),
        jnp.concatenate(nps), emb, heads,
        prefix_len=P, max_new_tokens=new, rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_array_equal(np.asarray(got_tokens), np.asarray(want_tokens))
    np.testing.assert_array_equal(np.asarray(got_num), np.asarray(want_num))


def test_split_int8_cache():
    import dataclasses

    cfg = dataclasses.replace(CFG, kv_cache_dtype="int8")
    params = init_decoder_params(cfg, jax.random.PRNGKey(1))
    emb = build_combined_embedding(
        params["embed"], jnp.zeros((1, cfg.hidden_size)),
        jnp.zeros((cfg.time_vocab_size, cfg.hidden_size)),
        jnp.zeros((cfg.score_vocab_size, cfg.hidden_size)),
    )
    B, P, new = 2, 8, 6
    S = P + new
    prefix = jax.random.normal(jax.random.PRNGKey(2), (B, P, cfg.hidden_size)) * 0.1
    mask = jnp.ones((B, P), bool)
    heads = jnp.ones((B,), jnp.int32)

    want, _ = generate_jit(
        params, cfg, prefix, mask, emb, heads,
        max_new_tokens=new, cache_len=S, rng=jax.random.PRNGKey(0),
    )
    big = init_kv_cache(cfg, B, S)
    cache, cm, lh, np_ = prefill_jit(
        params, cfg, prefix, mask, cache_len=S, use_flash=False
    )
    big = merge_cache_rows(big, cache, jnp.int32(0))
    got, _, _ = decode_jit(
        params, cfg, big, cm, lh, np_, emb, heads,
        prefix_len=P, max_new_tokens=new, rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("pb", [1, 2, 3])
def test_fused_subbatch_prefill_matches(pb):
    """generate_jit(prefill_batch=...) — in-program sub-batched prefill."""
    params, emb, prefix, mask, B, P, new = _setup(jax.random.PRNGKey(3))
    S = P + new
    heads = jnp.ones((B,), jnp.int32)
    want, want_n = generate_jit(
        params, CFG, prefix, mask, emb, heads,
        max_new_tokens=new, cache_len=S, rng=jax.random.PRNGKey(0),
    )
    got, got_n = generate_jit(
        params, CFG, prefix, mask, emb, heads,
        max_new_tokens=new, cache_len=S, rng=jax.random.PRNGKey(0),
        prefill_batch=pb,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got_n), np.asarray(want_n))


def test_generate_split_arena_reuse():
    """A recycled KV arena (stale contents from a previous batch) must not
    change tokens: prefill_into overwrites every row's full slot range."""
    from trace_tpu.runtime.generate import generate_split

    params, emb, prefix, mask, B, P, new = _setup(jax.random.PRNGKey(4))
    prefix2 = (
        jax.random.normal(jax.random.PRNGKey(11), prefix.shape) * 0.1
    ).astype(prefix.dtype)

    want = generate_split(
        params, CFG, prefix2, mask, emb,
        prefill_batch=2, max_new_tokens=new, seed=0, use_flash=False,
    )

    first = generate_split(
        params, CFG, prefix, mask, emb,
        prefill_batch=2, max_new_tokens=new, seed=0, use_flash=False,
    )
    assert first.cache is not None
    got = generate_split(
        params, CFG, prefix2, mask, emb,
        prefill_batch=2, max_new_tokens=new, seed=0, use_flash=False,
        cache=first.cache,
    )
    np.testing.assert_array_equal(got.tokens, want.tokens)

    # shape-mismatched arena falls back to a fresh allocation
    bad = init_kv_cache(CFG, B, P + new + 128, dtype=prefix.dtype)
    got2 = generate_split(
        params, CFG, prefix2, mask, emb,
        prefill_batch=2, max_new_tokens=new, seed=0, use_flash=False,
        cache=bad,
    )
    np.testing.assert_array_equal(got2.tokens, want.tokens)


def test_token_budget_shares_executable_and_matches():
    """token_budget sizes the cache/buffers for the larger budget while a
    traced max_steps stops at max_new_tokens: tokens must match the
    unbudgeted run, the token buffer is budget-wide (PAD beyond the stop),
    and the 'short' and 'budget-length' calls reuse ONE decode trace."""
    from trace_tpu.runtime.generate import decode_jit as dj
    from trace_tpu.runtime.generate import generate_split

    params, emb, prefix, mask, B, P, new = _setup(jax.random.PRNGKey(5))
    budget = new + 8

    want = generate_split(
        params, CFG, prefix, mask, emb,
        prefill_batch=2, max_new_tokens=new, seed=0, use_flash=False,
    )

    short = generate_split(
        params, CFG, prefix, mask, emb,
        prefill_batch=2, max_new_tokens=new, seed=0, use_flash=False,
        token_budget=budget,
    )
    # budget-wide buffer, PAD-filled past the stop point
    assert short.tokens.shape == (B, budget)
    np.testing.assert_array_equal(short.tokens[:, :new], want.tokens)
    from trace_tpu.runtime.generate import PAD_OUTPUT_ID

    assert (short.tokens[:, new:] == PAD_OUTPUT_ID).all()

    # the full-budget call must hit the same compiled decode executable
    traces_before = dj._cache_size()
    long = generate_split(
        params, CFG, prefix, mask, emb,
        prefill_batch=2, max_new_tokens=budget, seed=0, use_flash=False,
        token_budget=budget, cache=short.cache,
    )
    assert dj._cache_size() == traces_before, "budget run re-traced decode_jit"
    assert long.tokens.shape == (B, budget)
    # the first `new` steps of the longer run decode the same ids (greedy)
    got_alive = long.tokens[:, :new]
    np.testing.assert_array_equal(got_alive, want.tokens)
