"""Mixtral-style sparse-MoE decoder blocks with expert-parallel sharding.

The reference carries vestigial Mixtral support (model selection at
train_mt.py:948-1011; MixtralSparseMoeBlock registered as a ZeRO-3 leaf at
train_mt.py:973-974 — the only EP-adjacent line, inactive since the import
is commented out at trace/model/__init__.py:3).  This module provides the
working TPU-native equivalent: the Mistral block with its MLP swapped for a
top-k routed expert mixture, expert weights stacked on an axis that shards
over the mesh's 'model' dimension (expert parallelism via GSPMD).

Routing math follows Mixtral: softmax router logits, top-k experts per
token, renormalized gates.  Compute is the dense-mixture formulation (every
expert computes, masked by gates): at TRACE scale the expert count is small
and this keeps the op MXU-shaped with zero dynamic shapes; a
capacity/permute kernel is the planned optimization for large E.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from trace_tpu.model.config import DecoderConfig


@dataclasses.dataclass(frozen=True)
class MoEConfig(DecoderConfig):
    num_experts: int = 8
    top_k: int = 2

    @classmethod
    def tiny_moe(cls) -> "MoEConfig":
        return cls(
            vocab_size=384, hidden_size=64, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            max_seq_len=512, num_experts=4, top_k=2,
        )


def init_moe_mlp_params(config: MoEConfig, key: jax.Array, dtype=jnp.float32):
    """Per-layer-stacked expert weights: [L, E, ...]; E shards over 'model'."""
    c = config
    L, E, D, I = c.num_layers, c.num_experts, c.hidden_size, c.intermediate_size
    ks = jax.random.split(key, 4)
    s = 0.02

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

    return {
        "router": rnd(ks[0], (L, D, E)),
        "w_gate": rnd(ks[1], (L, E, D, I)),
        "w_up": rnd(ks[2], (L, E, D, I)),
        "w_down": rnd(ks[3], (L, E, I, D)),
    }


def moe_mlp(x: jax.Array, lp: dict, config: MoEConfig) -> jax.Array:
    """x [B, T, D] -> [B, T, D] via top-k routed expert SwiGLU MLPs."""
    c = config
    logits = jnp.einsum(
        "btd,de->bte", x, lp["router"], preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, c.top_k)  # [B, T, k]
    top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)

    # dense gate vector: weight per expert, zero off the top-k
    gates = jnp.zeros_like(probs).at[
        jnp.arange(probs.shape[0])[:, None, None],
        jnp.arange(probs.shape[1])[None, :, None],
        top_idx,
    ].set(top_vals)

    # every expert computes; outputs mix by gate (dense mixture — static
    # shapes, experts shard over 'model')
    gate_proj = jnp.einsum(
        "btd,edi->btei", x, lp["w_gate"], preferred_element_type=jnp.float32
    )
    up_proj = jnp.einsum(
        "btd,edi->btei", x, lp["w_up"], preferred_element_type=jnp.float32
    )
    act = (jax.nn.silu(gate_proj) * up_proj).astype(x.dtype)
    expert_out = jnp.einsum(
        "btei,eid->bted", act, lp["w_down"], preferred_element_type=jnp.float32
    )
    out = jnp.einsum("bted,bte->btd", expert_out, gates.astype(jnp.float32))
    return out.astype(x.dtype)


def moe_aux_loss(x: jax.Array, lp: dict, config: MoEConfig) -> jax.Array:
    """Switch-style load-balancing auxiliary loss (mean fraction x mean prob)."""
    c = config
    logits = jnp.einsum("btd,de->bte", x, lp["router"], preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    top1 = jnp.argmax(probs, axis=-1)
    frac = jnp.mean(jax.nn.one_hot(top1, c.num_experts), axis=(0, 1))
    mean_prob = jnp.mean(probs, axis=(0, 1))
    return c.num_experts * jnp.sum(frac * mean_prob)


# Sharding note (runtime/mesh.py consumers): expert stacks partition as
# P(None, 'model', None, None) — each model-shard holds E/model experts; the
# dense-mixture einsums reduce over E, so XLA inserts the psum (the EP
# all-reduce) automatically.
MOE_PARAM_RULES = (
    ("moe/router", (None, None, None)),
    ("moe/w_gate", (None, "model", None, None)),
    ("moe/w_up", (None, "model", None, None)),
    ("moe/w_down", (None, "model", None, None)),
)


def init_moe_decoder_params(config: MoEConfig, key: jax.Array, dtype=jnp.float32):
    """Full Mixtral-family decoder params: Mistral attention stack with the
    dense MLP weights replaced by routed expert weights (the reference's
    inactive Mixtral selection, train_mt.py:948-1011, made real)."""
    from trace_tpu.model.mistral import init_decoder_params

    k1, k2 = jax.random.split(key)
    params = init_decoder_params(config, k1, dtype=dtype)
    layers = dict(params["layers"])
    for name in ("w_gate", "w_up", "w_down"):
        layers.pop(name)
    layers.update(init_moe_mlp_params(config, k2, dtype=dtype))
    params = dict(params)
    params["layers"] = layers
    return params
