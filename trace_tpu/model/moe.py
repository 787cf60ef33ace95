"""Mixtral-style sparse-MoE decoder blocks with expert-parallel sharding.

The reference carries vestigial Mixtral support (model selection at
train_mt.py:948-1011; MixtralSparseMoeBlock registered as a ZeRO-3 leaf at
train_mt.py:973-974 — the only EP-adjacent line, inactive since the import
is commented out at trace/model/__init__.py:3).  This module provides the
working TPU-native equivalent: the Mistral block with its MLP swapped for a
top-k routed expert mixture, expert weights stacked on an axis that shards
over the mesh's 'model' dimension (expert parallelism via GSPMD).

Routing math follows Mixtral: softmax router logits, top-k experts per
token, renormalized gates.  Default compute is the capacity-bucketed sparse
formulation (_moe_mlp_sparse): top-k actually saves FLOPs (k*cf/E of the
dense cost) with fully static shapes; the dense mixture (every expert
computes, masked by gates) remains as the exact no-drop oracle
(moe_impl='dense').
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
    # 'sparse': capacity-bucketed dispatch — top-k actually saves FLOPs
    # (k*capacity_factor/E of the dense cost); 'dense': every expert
    # computes every token (exact, no drops — the parity oracle).
    moe_impl: str = "sparse"
    # expert buckets hold capacity_factor x the mean load; overflow tokens
    # drop their contribution from that expert (standard Switch semantics)
    capacity_factor: float = 2.0

    @classmethod
    def tiny_moe(cls) -> "MoEConfig":
        return cls(
            vocab_size=384, hidden_size=64, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            max_seq_len=512, num_experts=4, top_k=2,
        )

    @classmethod
    def mixtral_8x7b(cls) -> "MoEConfig":
        return cls(num_experts=8, top_k=2)


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
    if config.moe_impl == "sparse":
        return _moe_mlp_sparse(x, lp, config)
    return _moe_mlp_dense(x, lp, config)


def _moe_mlp_sparse(x: jax.Array, lp: dict, config: MoEConfig) -> jax.Array:
    """Capacity-bucketed dispatch: top-k saves real FLOPs.

    Tokens scatter into per-expert buckets of static capacity
    C = ceil(N*k/E * capacity_factor); each expert runs ONE batched SwiGLU
    over its bucket ([E, C, D] x [E, D, I] einsum — MXU-shaped, shards over
    'model' on the E axis for expert parallelism); results gather back and
    mix by the renormalized gates.  Expert FLOPs are k*cf/E of the dense
    mixture (4x fewer for Mixtral's top-2-of-8 at cf=1).  Overflow beyond C
    drops that expert's contribution for the token (Switch/GShard
    semantics), earlier tokens win.  All shapes static.
    """
    c = config
    B, T, D = x.shape
    N = B * T
    E, k = c.num_experts, c.top_k
    import math

    C = max(1, math.ceil(N * k * c.capacity_factor / E))

    xf = x.reshape(N, D)
    logits = jnp.einsum(
        "nd,de->ne", xf, lp["router"], preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, k)  # [N, k]
    top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)

    flat_e = top_idx.reshape(-1)          # [N*k] expert of each assignment
    flat_g = top_vals.reshape(-1)         # [N*k]
    onehot = jax.nn.one_hot(flat_e, E, dtype=jnp.int32)
    within = jnp.sum((jnp.cumsum(onehot, axis=0) - onehot) * onehot, axis=1)
    keep = within < C
    slot = jnp.where(keep, flat_e * C + within, E * C)  # overflow -> dump row

    xr = jnp.repeat(xf, k, axis=0)  # row n repeated for its k assignments
    buf = jnp.zeros((E * C + 1, D), x.dtype).at[slot].set(xr)
    ebuf = buf[: E * C].reshape(E, C, D)

    gate_p = jnp.einsum(
        "ecd,edi->eci", ebuf, lp["w_gate"], preferred_element_type=jnp.float32
    )
    up_p = jnp.einsum(
        "ecd,edi->eci", ebuf, lp["w_up"], preferred_element_type=jnp.float32
    )
    act = (jax.nn.silu(gate_p) * up_p).astype(x.dtype)
    eout = jnp.einsum(
        "eci,eid->ecd", act, lp["w_down"], preferred_element_type=jnp.float32
    )

    flat_out = jnp.concatenate([eout.reshape(E * C, D), jnp.zeros((1, D))], axis=0)
    gathered = flat_out[slot]  # [N*k, D] fp32
    weighted = gathered * (flat_g * keep)[:, None]
    y = jnp.sum(weighted.reshape(N, k, D), axis=1)
    return y.reshape(B, T, D).astype(x.dtype)


def _moe_mlp_dense(x: jax.Array, lp: dict, config: MoEConfig) -> jax.Array:
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
