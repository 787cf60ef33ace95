"""Fused-QKV / gate|up serving layout: parity with the per-weight layout.

fuse_decoder_serving concatenates quantized projections along output
channels so a decode step runs 4 MXU dots per layer instead of 7 (the
step is per-dot-latency-bound at serving batch — benchmarks/
qmm_p4_sweep.py).  Column n of the fused dot is mathematically identical
to column n of the source weight's dot, so outputs must match to float
tolerance; these tests pin that for every quantized serving mode.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import decoder_forward, init_decoder_params
from trace_tpu.model.quantize import (
    fuse_decoder_serving,
    is_quantized,
    quantize_decoder_params,
)

CFG = DecoderConfig.tiny()


def _fwd(params, config, x, cache=None, cache_index=None, cache_mask=None):
    B, T, _ = x.shape
    mask = jnp.ones((B, T), bool)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T)) + (
        0 if cache_index is None else cache_index
    )
    return decoder_forward(
        params, config, x, mask, pos,
        cache=cache, cache_index=cache_index, cache_mask=cache_mask,
    )


@pytest.mark.parametrize("mode", ["int8", "int4p", "int8_w8a8"])
def test_fused_matches_unfused_forward(mode):
    params = init_decoder_params(CFG, jax.random.PRNGKey(0))
    bits, pack = (8, False) if mode.startswith("int8") else (4, True)
    qp = quantize_decoder_params(params, bits=bits, pack=pack)
    fused = fuse_decoder_serving(qp)
    assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
    assert "w_gateup" in fused["layers"]
    cfg = CFG
    if mode == "int8_w8a8":
        import dataclasses

        cfg = dataclasses.replace(CFG, act_quant=True)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, CFG.hidden_size)) * 0.1
    h_ref, _ = _fwd(qp, cfg, x)
    h_fused, _ = _fwd(fused, cfg, x)
    np.testing.assert_allclose(
        np.asarray(h_fused, np.float32), np.asarray(h_ref, np.float32),
        rtol=2e-2, atol=2e-3,
    )


def test_fused_decode_step_matches():
    """T=1 cached decode step (the latency-bound path the fusion targets)."""
    params = init_decoder_params(CFG, jax.random.PRNGKey(2))
    qp = quantize_decoder_params(params)
    fused = fuse_decoder_serving(qp)

    B, S = 2, 16
    L = CFG.num_layers
    cache = (
        jnp.zeros((L, B, CFG.num_kv_heads, S, CFG.head_dim), jnp.bfloat16),
        jnp.zeros((L, B, CFG.num_kv_heads, S, CFG.head_dim), jnp.bfloat16),
    )
    x0 = jax.random.normal(jax.random.PRNGKey(3), (B, 4, CFG.hidden_size)) * 0.1
    h_ref, c_ref = _fwd(qp, CFG, x0, cache=cache, cache_index=jnp.int32(0))
    h_f, c_f = _fwd(fused, CFG, x0, cache=cache, cache_index=jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(h_f, np.float32), np.asarray(h_ref, np.float32),
        rtol=2e-2, atol=2e-3,
    )

    x1 = jax.random.normal(jax.random.PRNGKey(4), (B, 1, CFG.hidden_size)) * 0.1
    cm = jnp.arange(S)[None, :] < 4
    cm = jnp.broadcast_to(cm, (B, S))
    h_ref1, _ = _fwd(qp, CFG, x1, cache=c_ref, cache_index=jnp.int32(4),
                     cache_mask=cm)
    h_f1, _ = _fwd(fused, CFG, x1, cache=c_f, cache_index=jnp.int32(4),
                   cache_mask=cm)
    np.testing.assert_allclose(
        np.asarray(h_f1, np.float32), np.asarray(h_ref1, np.float32),
        rtol=2e-2, atol=2e-3,
    )


def test_fusion_noops_on_ineligible_trees():
    params = init_decoder_params(CFG, jax.random.PRNGKey(5))
    # bf16 (unquantized): unchanged
    assert fuse_decoder_serving(params) is params
    # LoRA-augmented: unchanged
    qp = quantize_decoder_params(params)
    lora = dict(qp)
    lora["layers"] = dict(qp["layers"])
    lora["layers"]["wq_lora_a"] = jnp.zeros((2, 4, 4))
    assert fuse_decoder_serving(lora) is lora


def test_fused_leaf_shapes_and_host_tree():
    """Host (numpy) trees fuse without touching the device."""
    from trace_tpu.model.quantize import quantize_decoder_params_host

    params = init_decoder_params(CFG, jax.random.PRNGKey(6))
    host = jax.tree.map(np.asarray, params)
    qp = quantize_decoder_params_host(host)
    fused = fuse_decoder_serving(qp)
    w = fused["layers"]["wqkv"]
    assert isinstance(w["q"], np.ndarray)
    D = CFG.hidden_size
    nq = CFG.num_heads * CFG.head_dim
    nkv = CFG.num_kv_heads * CFG.head_dim
    assert w["q"].shape == (CFG.num_layers, D, nq + 2 * nkv)
    assert w["s"].shape == (CFG.num_layers, 1, nq + 2 * nkv)
    gu = fused["layers"]["w_gateup"]
    assert gu["q"].shape == (CFG.num_layers, D, 2 * CFG.intermediate_size)
    assert is_quantized(w) and is_quantized(gu)


def test_unfuse_round_trips_and_matches():
    """unfuse_decoder_serving splits fused leaves back to canonical values
    (flattened [L, K, N] view) — the GSPMD serving path depends on it."""
    from trace_tpu.model.quantize import unfuse_decoder_serving

    params = init_decoder_params(CFG, jax.random.PRNGKey(7))
    qp = quantize_decoder_params(params)
    back = unfuse_decoder_serving(fuse_decoder_serving(qp))
    assert "wqkv" not in back["layers"] and "wq" in back["layers"]
    for name in ("wq", "wk", "wv", "w_gate", "w_up"):
        src = qp["layers"][name]
        got = back["layers"][name]
        L = src["q"].shape[0]
        np.testing.assert_array_equal(
            np.asarray(got["q"]), np.asarray(src["q"]).reshape(L, src["q"].shape[1], -1)
        )
        np.testing.assert_array_equal(
            np.asarray(got["s"], np.float32),
            np.asarray(src["s"], np.float32).reshape(L, 1, -1),
        )
    # the flattened canonical tree still forwards identically
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 5, CFG.hidden_size)) * 0.1
    h_ref, _ = _fwd(qp, CFG, x)
    h_back, _ = _fwd(back, CFG, x)
    np.testing.assert_allclose(
        np.asarray(h_back, np.float32), np.asarray(h_ref, np.float32),
        rtol=2e-2, atol=2e-3,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_fused_tree_shards_tp_not_replicated():
    """A fused serving tree handed to shard_params_for_inference must come
    back TP-sharded (unfused), never with wqkv silently replicated on every
    chip (the round-4 advisor finding)."""
    from trace_tpu.runtime.mesh import build_mesh, shard_params_for_inference

    params = init_decoder_params(CFG, jax.random.PRNGKey(9))
    fused = fuse_decoder_serving(quantize_decoder_params(params))
    mesh = build_mesh(8)
    sharded = shard_params_for_inference(fused, mesh)
    layers = sharded["layers"]
    assert "wqkv" not in layers, "sharded serving must use canonical leaves"
    for name in ("wq", "wk", "wv", "w_gate", "w_up"):
        spec = layers[name]["q"].sharding.spec
        assert "model" in tuple(spec), (name, spec)
    # and the mesh rules themselves never replicate a fused leaf (safety net)
    from trace_tpu.runtime.mesh import param_spec

    class _P:  # fake path entries
        def __init__(self, key):
            self.key = key

    path = tuple(_P(k) for k in ("decoder", "layers", "wqkv", "q"))
    leaf = fused["layers"]["wqkv"]["q"]
    assert "model" in tuple(param_spec(path, leaf, mesh))
