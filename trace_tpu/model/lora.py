"""LoRA adapters for the decoder (training-time).

Reference: --lora_enable path (train_mt.py:1017-1050; find_all_linear_names
targets every linear, train_mt.py:207-220).  Adapters live as extra leaves
inside params['layers'] (``<name>_lora_a`` [L, in, r], ``<name>_lora_b``
[L, r, out_flat]) so the layer scan carries them with the base weights; the
projection delta is x @ A @ B * (alpha / r).

Freeze policy: trainable group = names containing '_lora_' (plus towers/
heads per the stage recipe); merging into the base for export reuses
checkpoint/loader.merge semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from trace_tpu.model.config import DecoderConfig

# target -> (in_dim_fn, out_flat_fn) over the config
_TARGETS = {
    "wq": lambda c: (c.hidden_size, c.num_heads * c.head_dim),
    "wk": lambda c: (c.hidden_size, c.num_kv_heads * c.head_dim),
    "wv": lambda c: (c.hidden_size, c.num_kv_heads * c.head_dim),
    "wo": lambda c: (c.num_heads * c.head_dim, c.hidden_size),
    "w_gate": lambda c: (c.hidden_size, c.intermediate_size),
    "w_up": lambda c: (c.hidden_size, c.intermediate_size),
    "w_down": lambda c: (c.intermediate_size, c.hidden_size),
}


def add_lora_params(
    params: dict,
    config: DecoderConfig,
    key: jax.Array,
    targets: tuple = ("wq", "wk", "wv", "wo"),
    dtype=jnp.float32,
) -> dict:
    """Return params with LoRA leaves added (A ~ N(0, 1/r), B = 0 — the PEFT
    init so the adapted model starts identical to the base)."""
    assert config.lora_r > 0, "set config.lora_r"
    r = config.lora_r
    L = config.num_layers
    out = dict(params)
    layers = dict(params["layers"])
    keys = jax.random.split(key, len(targets))
    for k, name in zip(keys, targets):
        d_in, d_out = _TARGETS[name](config)
        layers[f"{name}_lora_a"] = (
            jax.random.normal(k, (L, d_in, r), jnp.float32) / r
        ).astype(dtype)
        layers[f"{name}_lora_b"] = jnp.zeros((L, r, d_out), dtype)
    out["layers"] = layers
    return out


def lora_delta(x: jax.Array, lp: dict, name: str, config: DecoderConfig):
    """x [B, T, in] -> delta [B, T, out_flat] for a target, or None."""
    a = lp.get(f"{name}_lora_a")
    if a is None:
        return None
    b = lp[f"{name}_lora_b"]
    scale = config.lora_alpha / config.lora_r
    low = jnp.einsum("btd,dr->btr", x, a, preferred_element_type=jnp.float32)
    return (
        jnp.einsum("btr,ro->bto", low, b, preferred_element_type=jnp.float32)
        * scale
    ).astype(x.dtype)


def merge_lora_into_base(params: dict, config: DecoderConfig) -> dict:
    """Fold adapters into the base weights and drop the LoRA leaves
    (the final-save merge, train_mt.py:1185-1196)."""
    layers = dict(params["layers"])
    scale = config.lora_alpha / config.lora_r
    for name in list(_TARGETS):
        a = layers.pop(f"{name}_lora_a", None)
        b = layers.pop(f"{name}_lora_b", None)
        if a is None:
            continue
        w = layers[name]
        delta = jnp.einsum("ldr,lro->ldo", a.astype(jnp.float32), b.astype(jnp.float32)) * scale
        layers[name] = (w.reshape(delta.shape).astype(jnp.float32) + delta).reshape(
            w.shape
        ).astype(w.dtype)
    out = dict(params)
    out["layers"] = layers
    return out
