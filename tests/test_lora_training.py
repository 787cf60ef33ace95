"""LoRA adapters: identity at init, forward effect, merge, freeze policy."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.lora import add_lora_params, merge_lora_into_base
from trace_tpu.model.mistral import decoder_forward, init_decoder_params
from trace_tpu.train.train import param_group

CFG = dataclasses.replace(DecoderConfig.tiny(), lora_r=4, lora_alpha=8.0)


def _forward(params, x):
    B, T = x.shape[:2]
    h, _ = decoder_forward(
        params, CFG, x, jnp.ones((B, T), bool),
        jnp.broadcast_to(jnp.arange(T), (B, T)),
    )
    return h


def test_zero_b_init_is_identity():
    base = init_decoder_params(CFG, jax.random.PRNGKey(0))
    lora = add_lora_params(base, CFG, jax.random.PRNGKey(1),
                           targets=("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, CFG.hidden_size)) * 0.1
    np.testing.assert_allclose(
        np.asarray(_forward(base, x)), np.asarray(_forward(lora, x)),
        rtol=1e-6, atol=1e-6,
    )


def test_nonzero_b_changes_output_and_merge_matches():
    base = init_decoder_params(CFG, jax.random.PRNGKey(3))
    lora = add_lora_params(base, CFG, jax.random.PRNGKey(4), targets=("wq", "wv"))
    layers = dict(lora["layers"])
    layers["wq_lora_b"] = jax.random.normal(
        jax.random.PRNGKey(5), layers["wq_lora_b"].shape
    ) * 0.05
    lora = {**lora, "layers": layers}

    x = jax.random.normal(jax.random.PRNGKey(6), (1, 5, CFG.hidden_size)) * 0.1
    out_lora = _forward(lora, x)
    assert not np.allclose(np.asarray(out_lora), np.asarray(_forward(base, x)))

    merged = merge_lora_into_base(lora, CFG)
    assert "wq_lora_a" not in merged["layers"]
    np.testing.assert_allclose(
        np.asarray(_forward(merged, x)), np.asarray(out_lora),
        rtol=2e-5, atol=2e-5,
    )


def test_freeze_policy_lora_stage():
    assert param_group("decoder/layers/wq", "lora") == "frozen"
    assert param_group("decoder/layers/wq_lora_a", "lora") == "base"
    assert param_group("decoder/time_head", "lora") == "base"
    assert param_group("connector/slots", "lora") == "projector"
