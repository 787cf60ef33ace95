"""The served prefill program must run the path the config asks for.

Round-4 bug class: model_init configured W4A8/W8A8 (act_quant) but a
serving caller handed the prefill a config without it, so the bench
silently served weight-only prefill at ~60% of the s8xs8 MXU rate.  These
tests lower the ACTUAL serving prefill executable (prefill_all_into_jit —
the scan program generate_split dispatches) and assert the s8xs8 dots are
present exactly when configured, by grepping the StableHLO for dot_general
ops with two i8 operands.

Reference context: the reference pays prefill as an unbatched HF forward
inside generate() (/root/reference/trace/model/language_model/
trace_mistral.py:290-305); the quantized-prefill wiring is rebuild-only.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import init_decoder_params
from trace_tpu.model.quantize import (
    fuse_decoder_serving,
    quantize_decoder_params,
)
from trace_tpu.runtime import generate as gen

CFG = DecoderConfig.tiny()


def _i8_dot_count(hlo_text: str) -> int:
    """dot_general ops whose BOTH operands are i8 (the s8xs8 MXU form)."""
    n = 0
    for line in hlo_text.splitlines():
        if "dot_general" in line and line.count("xi8>") >= 2:
            n += 1
    return n


def _lower_serving_prefill(params, cfg, B=4, pb=2, P=16):
    cache_len = P + 8
    big = jax.eval_shape(
        lambda: gen.init_kv_cache(cfg, B, cache_len, dtype=jnp.bfloat16)
    )
    pe = jax.ShapeDtypeStruct((B, P, cfg.hidden_size), jnp.bfloat16)
    pm = jax.ShapeDtypeStruct((B, P), jnp.bool_)
    return gen.prefill_all_into_jit.lower(
        params, cfg, big, pe, pm,
        prefill_batch=pb, cache_len=cache_len, use_flash=False,
    ).as_text()


@pytest.fixture(scope="module")
def quant_params():
    params = init_decoder_params(CFG, jax.random.PRNGKey(0))
    return quantize_decoder_params(params)


def test_w8a8_engages_in_served_prefill_fused(quant_params):
    """model_init's serving shape: fused tree + act_quant=True -> exactly
    4 s8xs8 dots per layer body (qkv, wo, gate|up, down; layers are
    scan-stacked so the body appears once)."""
    cfg = dataclasses.replace(CFG, act_quant=True)
    fused = fuse_decoder_serving(quant_params)
    hlo = _lower_serving_prefill(fused, cfg)
    assert _i8_dot_count(hlo) == 4, _i8_dot_count(hlo)


def test_w8a8_engages_in_served_prefill_unfused(quant_params):
    cfg = dataclasses.replace(CFG, act_quant=True)
    hlo = _lower_serving_prefill(quant_params, cfg)
    assert _i8_dot_count(hlo) == 7, _i8_dot_count(hlo)


def test_weight_only_when_act_quant_off(quant_params):
    """act_quant=False must not sneak int8 activations in (quality-bearing:
    weight-only is the higher-precision mode)."""
    fused = fuse_decoder_serving(quant_params)
    hlo = _lower_serving_prefill(fused, CFG)
    assert _i8_dot_count(hlo) == 0, _i8_dot_count(hlo)


def test_w4a8_engages_for_int4p(quant_params):
    """Legacy per-channel int4p (group=0) prefills W4A8: two s8xs8 dots per
    projection (nibble halves) -> 8 in the fused body."""
    params = init_decoder_params(CFG, jax.random.PRNGKey(1))
    qp = quantize_decoder_params(params, bits=4, pack=True, group=0)
    fused = fuse_decoder_serving(qp)
    cfg = dataclasses.replace(CFG, act_quant=True)
    hlo = _lower_serving_prefill(fused, cfg)
    assert _i8_dot_count(hlo) == 8, _i8_dot_count(hlo)


def test_grouped_int4p_stays_weight_only(quant_params):
    """Group-scaled int4p has no s8xs8 form; act_quant must not break it."""
    params = init_decoder_params(CFG, jax.random.PRNGKey(2))
    cfg128 = dataclasses.replace(
        CFG, hidden_size=256, intermediate_size=256, num_heads=4,
        num_kv_heads=2, head_dim=64, act_quant=True,
    )
    p256 = init_decoder_params(cfg128, jax.random.PRNGKey(2))
    qp = quantize_decoder_params(p256, bits=4, pack=True, group=128)
    assert qp["layers"]["wq"]["s"].shape[1] == 2
    fused = fuse_decoder_serving(qp)
    hlo = _lower_serving_prefill(fused, cfg128)
    assert _i8_dot_count(hlo) == 0, _i8_dot_count(hlo)


def test_use_prefill_scan_shares_dispatch_decision(monkeypatch):
    """The prewarm compiles whichever prefill variant generate_split will
    dispatch; both consult this predicate."""
    monkeypatch.delenv("TRACE_TPU_PREFILL_SCAN", raising=False)
    assert gen.use_prefill_scan(24, 2)
    assert not gen.use_prefill_scan(24, 5)  # uneven split -> dispatch loop
    monkeypatch.setenv("TRACE_TPU_PREFILL_SCAN", "0")
    assert not gen.use_prefill_scan(24, 2)
