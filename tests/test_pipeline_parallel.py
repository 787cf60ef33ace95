"""GPipe pipeline-parallel decoder vs the sequential forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import decoder_forward, init_decoder_params
from trace_tpu.parallel.pipeline import build_pp_mesh, pp_decoder_forward

CFG = dataclasses.replace(DecoderConfig.tiny(), num_layers=4)


@pytest.mark.parametrize("stages,micro", [(4, 2), (2, 4), (1, 2)])
def test_matches_sequential(stages, micro):
    if len(jax.devices()) < stages:
        pytest.skip("not enough devices")
    params = init_decoder_params(CFG, jax.random.PRNGKey(0))
    B, T = 4, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, CFG.hidden_size)) * 0.1
    mask = jnp.ones((B, T), bool).at[0, -3:].set(False)
    pos = jnp.maximum(jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1, 0)

    want, _ = decoder_forward(params, CFG, x, mask, pos)

    mesh = build_pp_mesh(stages)
    got = pp_decoder_forward(
        params, CFG, x, mask, pos, mesh=mesh, num_microbatches=micro
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_jit_compiles_with_dp_composition():
    """PP under jit; stage mesh built over a subset of the 8 CPU devices."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    params = init_decoder_params(CFG, jax.random.PRNGKey(2))
    B, T = 8, 8
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, CFG.hidden_size)) * 0.1
    mask = jnp.ones((B, T), bool)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))
    mesh = build_pp_mesh(4)

    @jax.jit
    def run(p, x):
        return pp_decoder_forward(p, CFG, x, mask, pos, mesh=mesh, num_microbatches=4)

    got = run(params, x)
    want, _ = decoder_forward(params, CFG, x, mask, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
