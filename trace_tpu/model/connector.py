"""Vision -> LM projectors ("connectors").

Re-implements the reference projector registry
(/root/reference/trace/model/multimodal_projector/builder.py:94-127) in
functional JAX.  Production checkpoints use ``spatial_slot``
(scripts/train/pretrain-128.sh:34): per-frame slot-attention pooling of the
576 CLIP patch tokens down to 8 slot tokens per frame.

Implemented types: spatial_slot, slot, linear, mlpNx_gelu, identity,
spatial_time_slot.  The STC/STP conv family (builder.py:138-284) is provided
in :mod:`trace_tpu.model.stc_connector`.
"""

from __future__ import annotations

import re
from typing import Callable

import jax
import jax.numpy as jnp

from trace_tpu.model.mistral import rope_cos_sin, rotate_half
from trace_tpu.model.vit import layer_norm

LN_EPS = 1e-5  # torch nn.LayerNorm default, used by ln_vision


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def init_spatial_slot_params(
    key: jax.Array, mm_hidden: int, lm_hidden: int, num_slots: int = 8, dtype=jnp.float32
):
    k1, k2 = jax.random.split(key)
    return {
        "slots": jax.random.normal(k1, (mm_hidden, num_slots), jnp.float32).astype(dtype),
        "ln_scale": jnp.ones((mm_hidden,), dtype),
        "ln_bias": jnp.zeros((mm_hidden,), dtype),
        "readout": (jax.random.normal(k2, (mm_hidden, lm_hidden), jnp.float32) * 0.02).astype(dtype),
    }


def init_linear_params(key: jax.Array, mm_hidden: int, lm_hidden: int, dtype=jnp.float32):
    return {
        "weight": (jax.random.normal(key, (mm_hidden, lm_hidden), jnp.float32) * 0.02).astype(dtype),
        "bias": jnp.zeros((lm_hidden,), dtype),
    }


def init_mlp_params(key: jax.Array, mm_hidden: int, lm_hidden: int, depth: int, dtype=jnp.float32):
    keys = jax.random.split(key, depth)
    layers = []
    d_in = mm_hidden
    for i in range(depth):
        layers.append({
            "weight": (jax.random.normal(keys[i], (d_in, lm_hidden), jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((lm_hidden,), dtype),
        })
        d_in = lm_hidden
    return {"layers": layers}


# ---------------------------------------------------------------------------
# Forward functions
# ---------------------------------------------------------------------------

def _slot_pool(x: jax.Array, slots: jax.Array) -> jax.Array:
    """Softmax-over-positions slot pooling: x [..., n, d], slots [d, s] -> [..., s, d].

    Matches SpatialSlotPool.forward (builder.py:457-462): logits = x @ slots,
    softmax over the POSITION axis, pooled = x^T @ probs, transposed back.
    """
    logits = jnp.einsum("...nd,ds->...ns", x, slots, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-2).astype(x.dtype)
    pooled = jnp.einsum("...nd,...ns->...sd", x, probs, preferred_element_type=jnp.float32)
    return pooled.astype(x.dtype)


def _rope_over_positions(x: jax.Array, n: int, base: float = 10000.0) -> jax.Array:
    """Apply the connector's rotary embedding over position ids 0..n-1.

    Reference: SlotRotaryEmbedding + apply_rotary_pos_emb applied directly to
    the token features (builder.py:451-455) with dim = mm_hidden.
    """
    positions = jnp.arange(n, dtype=jnp.int32)
    cos, sin = rope_cos_sin(positions, x.shape[-1], base)  # [n, d]
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    return x * cos + rotate_half(x) * sin


def spatial_slot_forward(params: dict, x: jax.Array) -> jax.Array:
    """Per-frame slot pooling: [B, T, N, D_mm] -> [B, T, S, D_lm].

    LayerNorm -> RoPE over the N patch positions -> slot pool -> linear
    readout (no bias). Reference: SpatialSlotPool (builder.py:411-467).
    """
    B, T, N, D = x.shape
    h = layer_norm(x, params["ln_scale"], params["ln_bias"], LN_EPS)
    h = _rope_over_positions(h, N)
    pooled = _slot_pool(h, params["slots"])  # [B, T, S, D]
    return jnp.einsum(
        "btsd,de->btse", pooled, params["readout"], preferred_element_type=jnp.float32
    ).astype(x.dtype)


def slot_forward(params: dict, x: jax.Array) -> jax.Array:
    """Global slot pooling over all T*N tokens: [B,T,N,D_mm] -> [B,S,D_lm].

    Positions for RoPE are the FRAME index repeated per patch
    (reference SlotPool, builder.py:398).
    """
    B, T, N, D = x.shape
    flat = x.reshape(B, T * N, D)
    h = layer_norm(flat, params["ln_scale"], params["ln_bias"], LN_EPS)
    positions = jnp.repeat(jnp.arange(T, dtype=jnp.int32), N)
    cos, sin = rope_cos_sin(positions, D, 10000.0)
    h = h * cos.astype(h.dtype) + rotate_half(h) * sin.astype(h.dtype)
    pooled = _slot_pool(h, params["slots"])
    return jnp.einsum(
        "bsd,de->bse", pooled, params["readout"], preferred_element_type=jnp.float32
    ).astype(x.dtype)


def linear_forward(params: dict, x: jax.Array) -> jax.Array:
    """Mean-pool over frames then linear (reference: trace_arch.py:320-321)."""
    pooled = jnp.mean(x, axis=1)  # [B, N, D]
    return (
        jnp.einsum("bnd,de->bne", pooled, params["weight"], preferred_element_type=jnp.float32)
        + params["bias"]
    ).astype(x.dtype)


def mlp_forward(params: dict, x: jax.Array) -> jax.Array:
    """Mean-pool over frames then MLP with GELU between layers."""
    h = jnp.mean(x, axis=1)
    for i, layer in enumerate(params["layers"]):
        if i:
            h = jax.nn.gelu(h, approximate=False)
        h = (
            jnp.einsum("bnd,de->bne", h, layer["weight"], preferred_element_type=jnp.float32)
            + layer["bias"]
        ).astype(x.dtype)
    return h


def identity_forward(params: dict, x: jax.Array) -> jax.Array:
    return x


def init_spatial_time_slot_params(
    key: jax.Array, mm_hidden: int, lm_hidden: int,
    num_spatial_slots: int = 8, num_time_slots: int = 1, dtype=jnp.float32,
):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "spatial_slots": jax.random.normal(k1, (mm_hidden, num_spatial_slots), jnp.float32).astype(dtype),
        "time_slots": jax.random.normal(k2, (mm_hidden, num_time_slots), jnp.float32).astype(dtype),
        "ln_scale": jnp.ones((mm_hidden,), dtype),
        "ln_bias": jnp.zeros((mm_hidden,), dtype),
        "readout": (jax.random.normal(k3, (mm_hidden, lm_hidden), jnp.float32) * 0.02).astype(dtype),
    }


def spatial_time_slot_forward(params: dict, x: jax.Array, image_dim: int = 576) -> jax.Array:
    """Split image/time token pools (reference SpatialTimeSlotPool,
    builder.py:469-549): LN+RoPE+slot-pool the image part through the
    readout, RoPE+slot-pool the raw time part, concat along the slot axis.

    x: [B, T, N, D_mm] with the first image_dim positions per frame being
    image tokens and the rest time tokens.
    """
    B, T, N, D = x.shape
    img, tim = x[:, :, :image_dim], x[:, :, image_dim:]

    h = layer_norm(img, params["ln_scale"], params["ln_bias"], LN_EPS)
    h = _rope_over_positions(h, image_dim)
    img_out = _slot_pool(h, params["spatial_slots"])  # [B, T, S, D]
    img_out = jnp.einsum(
        "btsd,de->btse", img_out, params["readout"], preferred_element_type=jnp.float32
    ).astype(x.dtype)

    # time part: RoPE'd but neither normed nor read out (builder.py:528-540)
    ht = _rope_over_positions(tim, N - image_dim)
    tim_out = _slot_pool(ht, params["time_slots"])  # [B, T, St, D_mm]
    # readout keeps image dims only in the reference; time slots stay at
    # mm_hidden — concat requires matching dims, so project time slots too
    # when dims differ (the reference only ever ran with print-debugging;
    # this connector has no released checkpoints).
    if tim_out.shape[-1] != img_out.shape[-1]:
        tim_out = jnp.einsum(
            "btsd,de->btse", tim_out, params["readout"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
    return jnp.concatenate([img_out, tim_out], axis=2)


def build_connector(projector_type: str) -> tuple[Callable, Callable]:
    """Return (init_fn(key, mm_hidden, lm_hidden, **kw), forward_fn(params, x))."""
    mlp_match = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if mlp_match:
        depth = int(mlp_match.group(1))
        return (
            lambda key, mm, lm, dtype=jnp.float32: init_mlp_params(key, mm, lm, depth, dtype),
            mlp_forward,
        )
    if projector_type == "linear":
        return (
            lambda key, mm, lm, dtype=jnp.float32: init_linear_params(key, mm, lm, dtype),
            linear_forward,
        )
    if projector_type == "spatial_slot":
        return (
            lambda key, mm, lm, num_slots=8, dtype=jnp.float32: init_spatial_slot_params(
                key, mm, lm, num_slots, dtype
            ),
            spatial_slot_forward,
        )
    if projector_type == "slot":
        return (
            lambda key, mm, lm, num_slots=1024, dtype=jnp.float32: init_spatial_slot_params(
                key, mm, lm, num_slots, dtype
            ),
            slot_forward,
        )
    if projector_type == "spatial_time_slot":
        return (
            lambda key, mm, lm, num_slots=8, dtype=jnp.float32: init_spatial_time_slot_params(
                key, mm, lm, num_spatial_slots=num_slots, dtype=dtype
            ),
            spatial_time_slot_forward,
        )
    if projector_type == "identity":
        return (lambda key, mm, lm, dtype=jnp.float32: {}, identity_forward)
    if projector_type in ("stc_connector", "stp_connector", "stc_connector_v35",
                          "spatial_conv", "spatial_pool"):
        from trace_tpu.model import stc_connector

        return stc_connector.build(projector_type)
    raise ValueError(f"Unknown projector type: {projector_type}")
