"""Weight-only int8 quantization for the serving path.

The 16 GB v5e cannot hold the 7B bf16 decoder (14.5 GB) next to a batched KV
cache — measured: the chip is full at ~15.1 GB live and even host transfers
start failing.  Per-output-channel symmetric int8 on the decoder matmul
weights cuts them to ~3.6 GB, freeing ~7 GB for KV cache (batch 8-16 decode)
and halving the weight bytes each memory-bound decode step must read.

This replaces the reference's bitsandbytes 4/8-bit load option
(model/builder.py:39-48) with a TPU layout: weights stay in their einsum
shapes, quantized along every axis except the output axis, so dequantization
is one broadcast multiply that XLA fuses into the consuming matmul.

Quality note: per-channel weight-only int8 on 7B LMs is near-lossless in
published practice, but logit-level validation against the released TRACE
checkpoints has not been run in this environment (no weights available);
treat `--quant int8` as the high-throughput serving mode pending that check.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

def _quantize_axis(w: jax.Array, reduce_axes: tuple[int, ...], bits: int = 8):
    """Symmetric intN over the given axes; scale keeps the other axes.

    bits=4 stores jnp.int4 (range +-7; XLA packs 2 values/byte in TPU HBM —
    the bitsandbytes-4bit analog, reference model/builder.py:39-48): half
    the weight bytes of int8 for the HBM-bandwidth-bound decode phase, at
    per-channel 4-bit quality."""
    qmax = 127 if bits == 8 else 7
    qdtype = jnp.int8 if bits == 8 else jnp.int4
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax / qmax, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -qmax, qmax).astype(qdtype)
    return {"q": q, "s": scale.astype(jnp.bfloat16)}


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf.keys()) == {"q", "s"}


def dequantize(leaf, dtype=jnp.bfloat16) -> jax.Array:
    if is_quantized(leaf):
        return (leaf["q"].astype(jnp.bfloat16) * leaf["s"]).astype(dtype)
    return leaf


def quantize_decoder_params(params: dict, bits: int = 8) -> dict:
    """int8/int4-quantize the decoder's large matmul weights.

    Layer stacks quantize per (layer, output-channel); attention projections
    reduce over the input dim; heads and the embedding stay bf16 (gathers and
    fp32 logits want full precision rows).
    """
    out = dict(params)
    layers = dict(params["layers"])

    # reduce over the *input* dims; keep (L, out...) in the scale
    layers["wq"] = _quantize_axis(layers["wq"], (1,), bits)      # [L, D, NH, hd]
    layers["wk"] = _quantize_axis(layers["wk"], (1,), bits)
    layers["wv"] = _quantize_axis(layers["wv"], (1,), bits)
    layers["wo"] = _quantize_axis(layers["wo"], (1, 2), bits)    # [L, NH, hd, D]
    layers["w_gate"] = _quantize_axis(layers["w_gate"], (1,), bits)  # [L, D, I]
    layers["w_up"] = _quantize_axis(layers["w_up"], (1,), bits)
    layers["w_down"] = _quantize_axis(layers["w_down"], (1,), bits)  # [L, I, D]

    out["layers"] = layers
    # the lm_head feeds fp32 logits; keep it int8 even in 4-bit mode
    out["lm_head"] = _quantize_axis(params["lm_head"], (0,))  # [D, V]
    return out


def quantize_vision_params(params: dict) -> dict:
    """int8-quantize the CLIP encoder's stacked linear weights."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "fc1", "fc2"):
        layers[name] = _quantize_axis(layers[name], (1,))  # [L, in, out]
    out["layers"] = layers
    out["patch_embed"] = _quantize_axis(params["patch_embed"], (0,))
    return out


def quantize_trace_params(params: dict, *, vision: bool = True) -> dict:
    out = dict(params)
    out["decoder"] = quantize_decoder_params(params["decoder"])
    if vision and "vision" in params:
        out["vision"] = quantize_vision_params(params["vision"])
    return out


# ---------------------------------------------------------------------------
# Host-side (numpy) quantization
# ---------------------------------------------------------------------------
# Running the quantizer as one on-device program needs bf16+int8 weights
# co-resident (~22 GB working set) and leaves the relay allocator in a state
# where subsequent programs fail; checkpoint conversion quantizes on host
# instead, and only int8 tensors ever reach the device.

def _quantize_axis_np(w, reduce_axes: tuple[int, ...], bits: int = 8):
    import ml_dtypes
    import numpy as np

    qmax = 127 if bits == 8 else 7
    qdtype = np.int8 if bits == 8 else ml_dtypes.int4
    wf = np.asarray(w, np.float32)
    amax = np.max(np.abs(wf), axis=reduce_axes, keepdims=True)
    scale = np.maximum(amax / qmax, 1e-8)
    q = np.clip(np.round(wf / scale), -qmax, qmax).astype(qdtype)
    return {"q": q, "s": scale.astype(ml_dtypes.bfloat16)}


def quantize_decoder_params_host(params: dict, bits: int = 8) -> dict:
    """numpy-in / numpy-out variant of :func:`quantize_decoder_params`."""
    out = dict(params)
    layers = dict(params["layers"])
    layers["wq"] = _quantize_axis_np(layers["wq"], (1,), bits)
    layers["wk"] = _quantize_axis_np(layers["wk"], (1,), bits)
    layers["wv"] = _quantize_axis_np(layers["wv"], (1,), bits)
    layers["wo"] = _quantize_axis_np(layers["wo"], (1, 2), bits)
    layers["w_gate"] = _quantize_axis_np(layers["w_gate"], (1,), bits)
    layers["w_up"] = _quantize_axis_np(layers["w_up"], (1,), bits)
    layers["w_down"] = _quantize_axis_np(layers["w_down"], (1,), bits)
    out["layers"] = layers
    out["lm_head"] = _quantize_axis_np(params["lm_head"], (0,))
    return out
