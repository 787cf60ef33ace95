"""Mistral decoder in functional JAX, designed for TPU execution.

From-scratch TPU-first re-design of the reference's HF-Mistral backbone
(/root/reference/trace/model/language_model/trace_mistral.py).  Key choices:

* parameters are a plain pytree with all transformer layers STACKED on a
  leading axis so the forward pass is one ``lax.scan`` over layers — a single
  compiled layer body, natural FSDP-style sharding of the stacked axis;
* static-shaped KV cache (``[L, B, n_kv, max_len, head_dim]``): prefill does
  causal attention within the (right-padded) prefix, decode attends over the
  full cache with a validity mask — no dynamic shapes anywhere;
* matmuls accumulate in fp32 via ``preferred_element_type``; logits are fp32
  (reference keeps fp32 logits at trace_mistral.py:194-200);
* the four output heads (text/sync/time/score) produce one concatenated
  32,027-logit vector (reference: trace_mistral.py:191-204).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from trace_tpu.model.config import DecoderConfig

NEG_INF = -1e30  # finite large-negative avoids NaNs from (-inf) - (-inf)


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def init_decoder_params(config: DecoderConfig, key: jax.Array, dtype=jnp.float32):
    """Random-init decoder params (for tests / training from scratch).

    Layout (all layer weights stacked on axis 0):
      embed:      [V, D]
      layers:
        attn_norm [L, D], mlp_norm [L, D]
        wq [L, D, NH, hd], wk [L, D, NKV, hd], wv [L, D, NKV, hd],
        wo [L, NH, hd, D]
        w_gate [L, D, I], w_up [L, D, I], w_down [L, I, D]
      final_norm: [D]
      lm_head [D, V], sync_head [D, 1], time_head [D, Vt], score_head [D, Vs]
    """
    c = config
    k = jax.random.split(key, 12)
    L, D, I = c.num_layers, c.hidden_size, c.intermediate_size
    NH, NKV, HD = c.num_heads, c.num_kv_heads, c.head_dim
    s = 0.02

    def rnd(key, shape, scale=s):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    layers = {
        "attn_norm": jnp.ones((L, D), dtype),
        "mlp_norm": jnp.ones((L, D), dtype),
        "wq": rnd(k[1], (L, D, NH, HD)),
        "wk": rnd(k[2], (L, D, NKV, HD)),
        "wv": rnd(k[3], (L, D, NKV, HD)),
        "wo": rnd(k[4], (L, NH, HD, D)),
        "w_gate": rnd(k[5], (L, D, I)),
        "w_up": rnd(k[6], (L, D, I)),
        "w_down": rnd(k[7], (L, I, D)),
    }
    if c.attn_qkv_bias:
        layers["bq"] = jnp.zeros((L, NH, HD), dtype)
        layers["bk"] = jnp.zeros((L, NKV, HD), dtype)
        layers["bv"] = jnp.zeros((L, NKV, HD), dtype)
    return {
        "embed": rnd(k[0], (c.vocab_size, D)),
        "layers": layers,
        "final_norm": jnp.ones((D,), dtype),
        "lm_head": rnd(k[8], (D, c.vocab_size)),
        "sync_head": rnd(k[9], (D, 1)),
        "time_head": rnd(k[10], (D, c.time_vocab_size)),
        "score_head": rnd(k[11], (D, c.score_vocab_size)),
    }


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """RMSNorm in fp32, result cast back to input dtype (HF Mistral semantics)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed.astype(dtype) * weight.astype(dtype))


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """positions [..., T] -> (cos, sin) each [..., T, head_dim], fp32.

    Non-interleaved HF layout: frequencies repeated as [f, f] along the last
    axis, paired with rotate_half.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., T, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [B, N, T, hd]; cos/sin [B, T, hd] broadcast over heads."""
    cos = cos[:, None, :, :].astype(x.dtype)
    sin = sin[:, None, :, :].astype(x.dtype)
    return x * cos + rotate_half(x) * sin


def _attention(q, k, v, bias):
    """q [B,NH,T,hd]; k,v [B,NKV,S,hd]; bias [B,1,T,S] additive fp32.

    GQA via reshape-to-groups (no materialized repeat: the grouped einsum maps
    onto the MXU directly).
    """
    B, NH, T, HD = q.shape
    NKV = k.shape[1]
    G = NH // NKV
    qg = q.reshape(B, NKV, G, T, HD)
    scores = jnp.einsum(
        "bngth,bnsh->bngts", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * (HD ** -0.5)
    scores = scores + bias[:, :, None, :, :]  # [B,1,1,T,S] broadcast
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum(
        "bngts,bnsh->bngth", probs, v, preferred_element_type=jnp.float32
    )
    return out.reshape(B, NH, T, HD).astype(q.dtype)


def _decode_kernel_ok(q: jax.Array, cache, config: DecoderConfig) -> bool:
    """Route single-token cache attention through the Pallas decode kernel
    on accelerators (tile-legal shapes only); 'force' enables the CPU
    interpreter path for tests."""
    from trace_tpu.kernels.decode_attention import (
        decode_attention_impl,
        decode_attention_supported,
    )

    if not config.use_decode_kernel:
        return False
    impl = decode_attention_impl()
    if impl == "xla":
        return False
    if jax.default_backend() == "cpu" and impl != "force":
        return False
    return decode_attention_supported(q, cache)


def _layer(
    x: jax.Array,
    lp: dict,
    *,
    config: DecoderConfig,
    cos: jax.Array,
    sin: jax.Array,
    bias: jax.Array,
    full_cache=None,            # carried pytree, leaves [L, B, NKV, S, hd]
    li: Optional[jax.Array] = None,
    cache_index: Optional[jax.Array] = None,
    flash_bias: Optional[jax.Array] = None,
):
    """One decoder block. Returns (x_out, updated_full_cache_or_None).

    The KV cache rides the scan CARRY: the layer writes only the chunk's new
    k/v into its [li] stripe (in-place aliasable) and attends over its slice
    — write-then-attend, no [S+T] concat buffers. (Threading the cache
    through scan ys copied the whole cache every decode step.)

    When ``flash_bias`` is given (a [B, T] additive padding row) and T > 1,
    attention runs through the Pallas flash kernel over the current chunk
    only — valid for fresh-cache prefill and cache-less forward, where the
    chunk IS the full attendable context.
    """
    B, T, D = x.shape

    from trace_tpu.model.quantize import is_quantized

    h = rms_norm(x, lp["attn_norm"], config.rms_eps)
    NH, NKV, HD = config.num_heads, config.num_kv_heads, config.head_dim
    # W8A8 fires only for multi-token (prefill/train-style) chunks: decode's
    # T=1 step is weight-bandwidth-bound, where activation quant only adds
    # overhead (probe: benchmarks/w8a8_probe.py)
    # T==1 historically stayed weight-only on a bandwidth-bound assumption;
    # the decode step measured MXU-tile-latency-bound instead
    # (benchmarks/stacked_qmm_probe.py + decode_ablate B-scaling), so the
    # s8xs8 decode dot is re-testable via TRACE_TPU_DECODE_W8A8=1.
    # Nibble-packed int4 ('qp') also takes the s8xs8 dot for T>1 via an
    # in-program unpack to int8 (W4A8) — but never at T=1, where unpacking
    # would double the weight bytes of the bandwidth-bound step.
    import os as _os

    # serving layout may carry fused QKV / gate|up leaves (one MXU dot per
    # group; see quantize.fuse_decoder_serving) — probe whichever exists
    fused_qkv = "wqkv" in lp
    _wq = lp["wqkv"] if fused_qkv else lp["wq"]
    NQ, NKVW = NH * HD, NKV * HD

    def _split_qkv(qkv):
        q = qkv[..., :NQ].reshape(B, T, NH, HD).transpose(0, 2, 1, 3)
        k = (qkv[..., NQ:NQ + NKVW]
             .reshape(B, T, NKV, HD).transpose(0, 2, 1, 3))
        v = (qkv[..., NQ + NKVW:]
             .reshape(B, T, NKV, HD).transpose(0, 2, 1, 3))
        return q, k, v

    # group-wise-scaled int4p (s: [G, N], G>1) has no s8xs8 W4A8 form —
    # the per-group scale must apply inside the contraction, so grouped
    # leaves always take the weight-only quant_apply path (the Pallas
    # kernel scales weight tiles per group in VMEM)
    _p4_grouped = (
        "qp" in _wq and _wq["s"].size != _wq["qp"].shape[-1]
    )
    w8a8 = (
        config.act_quant
        and is_quantized(_wq)
        and (
            (
                "q" in _wq
                and _wq["q"].dtype == jnp.int8
                and (T > 1
                     or _os.environ.get("TRACE_TPU_DECODE_W8A8", "0") == "1")
            )
            or ("qp" in _wq and T > 1 and not _p4_grouped)
        )
    )
    if w8a8:
        from trace_tpu.kernels.quant_matmul import quant_apply_w8a8, quantize_acts

        hq, hs = quantize_acts(h)  # one rounding pass shared by q/k/v
        if fused_qkv:
            qkv = quant_apply_w8a8(
                hq, hs, lp["wqkv"], (NQ + 2 * NKVW,), out_dtype=x.dtype
            )
            q, k, v = _split_qkv(qkv)
        else:
            q = quant_apply_w8a8(hq, hs, lp["wq"], (NH, HD), out_dtype=x.dtype).transpose(0, 2, 1, 3)
            k = quant_apply_w8a8(hq, hs, lp["wk"], (NKV, HD), out_dtype=x.dtype).transpose(0, 2, 1, 3)
            v = quant_apply_w8a8(hq, hs, lp["wv"], (NKV, HD), out_dtype=x.dtype).transpose(0, 2, 1, 3)
    elif is_quantized(_wq):
        # int8 path: tile-local dequant inside the Pallas matmul — XLA must
        # never see convert(int8) feeding a dot, or LICM hoists full bf16
        # weight copies out of the decode loop (measured OOM).
        from trace_tpu.kernels.quant_matmul import quant_apply

        interp = jax.default_backend() == "cpu"
        if fused_qkv:
            qkv = quant_apply(
                h, lp["wqkv"], (NQ + 2 * NKVW,), interpret=interp
            )
            q, k, v = _split_qkv(qkv)
        else:
            q = quant_apply(h, lp["wq"], (NH, HD), interpret=interp).transpose(0, 2, 1, 3)
            k = quant_apply(h, lp["wk"], (NKV, HD), interpret=interp).transpose(0, 2, 1, 3)
            v = quant_apply(h, lp["wv"], (NKV, HD), interpret=interp).transpose(0, 2, 1, 3)
    else:
        q = jnp.einsum("btd,dnh->bnth", h, lp["wq"], preferred_element_type=jnp.float32).astype(x.dtype)
        k = jnp.einsum("btd,dnh->bnth", h, lp["wk"], preferred_element_type=jnp.float32).astype(x.dtype)
        v = jnp.einsum("btd,dnh->bnth", h, lp["wv"], preferred_element_type=jnp.float32).astype(x.dtype)
        if "wq_lora_a" in lp or "wv_lora_a" in lp:
            from trace_tpu.model.lora import lora_delta

            for name, tgt in (("wq", "q"), ("wk", "k"), ("wv", "v")):
                d = lora_delta(h, lp, name, config)
                if d is not None:
                    nh = NH if name == "wq" else NKV
                    d = d.reshape(B, T, nh, HD).transpose(0, 2, 1, 3)
                    if tgt == "q":
                        q = q + d
                    elif tgt == "k":
                        k = k + d
                    else:
                        v = v + d
    if config.attn_qkv_bias:
        q = q + lp["bq"][None, :, None, :]
        k = k + lp["bk"][None, :, None, :]
        v = v + lp["bv"][None, :, None, :]
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    new_cache = None
    if full_cache is not None:
        # write the chunk's k/v into this layer's stripe FIRST, then attend
        # over the slice (which now contains the new tokens)
        idx = (li, 0, 0, cache_index, 0)
        if isinstance(full_cache, dict):
            kq_n, ks_n = _quantize_kv(k)
            vq_n, vs_n = _quantize_kv(v)
            sidx = (li, 0, 0, 0, cache_index)  # scales are [L, B, N, 1, S]
            c = {
                "kq": jax.lax.dynamic_update_slice(full_cache["kq"], kq_n[None], idx),
                "ks": jax.lax.dynamic_update_slice(full_cache["ks"], ks_n[None], sidx),
                "vq": jax.lax.dynamic_update_slice(full_cache["vq"], vq_n[None], idx),
                "vs": jax.lax.dynamic_update_slice(full_cache["vs"], vs_n[None], sidx),
            }
        else:
            c = (
                jax.lax.dynamic_update_slice(
                    full_cache[0], k.astype(full_cache[0].dtype)[None], idx
                ),
                jax.lax.dynamic_update_slice(
                    full_cache[1], v.astype(full_cache[1].dtype)[None], idx
                ),
            )
        new_cache = c

    if flash_bias is not None and T > 1:
        from trace_tpu.kernels.flash_attention import flash_attention_trainable

        attn = flash_attention_trainable(q, k, v, flash_bias, True)
    elif full_cache is not None and _decode_kernel_ok(q, new_cache, config):
        # single-token decode: Pallas kernel reads layer li's stripe of the
        # stacked cache in place (no [B,NKV,S,hd] slice materialization)
        from trace_tpu.kernels.decode_attention import decode_attention

        attn = decode_attention(
            q, new_cache, li, bias[:, 0, 0, :],
            interpret=jax.default_backend() == "cpu",
        )
    else:
        if full_cache is None:
            k_all, v_all = k, v
        elif isinstance(full_cache, dict):
            kq = jax.lax.dynamic_index_in_dim(new_cache["kq"], li, 0, keepdims=False)
            ks = jax.lax.dynamic_index_in_dim(new_cache["ks"], li, 0, keepdims=False)
            vq = jax.lax.dynamic_index_in_dim(new_cache["vq"], li, 0, keepdims=False)
            vs = jax.lax.dynamic_index_in_dim(new_cache["vs"], li, 0, keepdims=False)
            k_all = kq.astype(jnp.bfloat16) * jnp.swapaxes(ks, -1, -2)
            v_all = vq.astype(jnp.bfloat16) * jnp.swapaxes(vs, -1, -2)
        else:
            k_all = jax.lax.dynamic_index_in_dim(new_cache[0], li, 0, keepdims=False)
            v_all = jax.lax.dynamic_index_in_dim(new_cache[1], li, 0, keepdims=False)
        attn = _attention(q, k_all.astype(x.dtype), v_all.astype(x.dtype), bias)
    if w8a8:
        from trace_tpu.kernels.quant_matmul import quant_apply_w8a8, quantize_acts

        attn_flat = attn.transpose(0, 2, 1, 3).reshape(B, T, NH * HD)
        aq, asc = quantize_acts(attn_flat)
        x = x + quant_apply_w8a8(aq, asc, lp["wo"], (D,), out_dtype=x.dtype)
        h = rms_norm(x, lp["mlp_norm"], config.rms_eps)
        hq, hs = quantize_acts(h)  # shared by gate/up
        if "w_gateup" in lp:
            gu = lp["w_gateup"]
            I2 = (gu["q"] if "q" in gu else gu["qp"]).shape[-1]
            gateup = quant_apply_w8a8(hq, hs, gu, (I2,), out_dtype=jnp.float32)
            gate, up = gateup[..., : I2 // 2], gateup[..., I2 // 2:]
        else:
            g = lp["w_gate"]
            I = (g["q"] if "q" in g else g["qp"]).shape[-1]
            gate = quant_apply_w8a8(hq, hs, lp["w_gate"], (I,), out_dtype=jnp.float32)
            up = quant_apply_w8a8(hq, hs, lp["w_up"], (I,), out_dtype=jnp.float32)
        act = jax.nn.silu(gate) * up
        dq_, ds_ = quantize_acts(act)
        mlp_out = quant_apply_w8a8(dq_, ds_, lp["w_down"], (D,), out_dtype=x.dtype)
        return x + mlp_out, new_cache

    if is_quantized(lp["wo"]):
        from trace_tpu.kernels.quant_matmul import quant_apply

        interp = jax.default_backend() == "cpu"
        attn_flat = attn.transpose(0, 2, 1, 3).reshape(B, T, NH * HD)
        attn_out = quant_apply(attn_flat, lp["wo"], (D,), interpret=interp)
        x = x + attn_out
        h = rms_norm(x, lp["mlp_norm"], config.rms_eps)
        if "w_gateup" in lp:
            gu = lp["w_gateup"]
            I2 = (gu["q"] if "q" in gu else gu["qp"]).shape[-1]
            gateup = quant_apply(
                h, gu, (I2,), out_dtype=jnp.float32, interpret=interp
            )
            gate, up = gateup[..., : I2 // 2], gateup[..., I2 // 2:]
        else:
            g = lp["w_gate"]
            I = (g["q"] if "q" in g else g["qp"]).shape[-1]
            gate = quant_apply(h, lp["w_gate"], (I,), out_dtype=jnp.float32, interpret=interp)
            up = quant_apply(h, lp["w_up"], (I,), out_dtype=jnp.float32, interpret=interp)
        act = (jax.nn.silu(gate) * up).astype(x.dtype)
        mlp_out = quant_apply(act, lp["w_down"], (D,), interpret=interp)
        return x + mlp_out, new_cache

    attn_out = jnp.einsum(
        "bnth,nhd->btd", attn, lp["wo"], preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if "wo_lora_a" in lp:
        from trace_tpu.model.lora import lora_delta

        attn_flat = attn.transpose(0, 2, 1, 3).reshape(B, T, NH * HD)
        attn_out = attn_out + lora_delta(attn_flat, lp, "wo", config)
    x = x + attn_out

    if "router" in lp:  # Mixtral-family layer: routed expert MLP
        from trace_tpu.model.moe import moe_mlp

        h = rms_norm(x, lp["mlp_norm"], config.rms_eps)
        return x + moe_mlp(h, lp, config), new_cache

    h = rms_norm(x, lp["mlp_norm"], config.rms_eps)
    gate = jnp.einsum("btd,di->bti", h, lp["w_gate"], preferred_element_type=jnp.float32)
    up = jnp.einsum("btd,di->bti", h, lp["w_up"], preferred_element_type=jnp.float32)
    if "w_gate_lora_a" in lp:
        from trace_tpu.model.lora import lora_delta

        gate = gate + lora_delta(h, lp, "w_gate", config)
        up = up + lora_delta(h, lp, "w_up", config)
    act = (jax.nn.silu(gate) * up).astype(x.dtype)
    mlp_out = jnp.einsum(
        "bti,id->btd", act, lp["w_down"], preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if "w_down_lora_a" in lp:
        from trace_tpu.model.lora import lora_delta

        mlp_out = mlp_out + lora_delta(act, lp, "w_down", config)
    return x + mlp_out, new_cache


def _decode_layer_stacked(
    x: jax.Array,               # [B, 1, D]
    layers: dict,               # FULL stacked layer tree (scan closure const)
    li: jax.Array,              # scalar int32 layer index
    *,
    config: DecoderConfig,
    cos: jax.Array,
    sin: jax.Array,
    bias: jax.Array,            # [B, 1, 1, S]
    full_cache,
    cache_index,
):
    """Single-token decode block reading STACKED int8 weights in place.

    The standard decode path scans with the stacked weights as xs — XLA
    materializes every layer's weight slice into a temp before its dots,
    costing write+read on top of the streaming read (measured: the decode
    step is S-independent at ~38.7 ms for B=32 vs a ~10 ms roofline,
    benchmarks/decode_ablate.py).  Here the stacked weights are scan-loop
    CONSTANTS and every matmul goes through quant_matmul_stacked, whose
    scalar-prefetch index map reads layer li's stripe straight from HBM —
    the weight analog of kernels/decode_attention.py.

    Serving-shape only: T == 1, int8-quantized dense Mistral layers (no
    LoRA / MoE / qkv-bias), Pallas-eligible decode attention.
    """
    from trace_tpu.kernels.decode_attention import decode_attention
    from trace_tpu.kernels.quant_matmul import quant_apply_stacked

    B, T, D = x.shape
    NH, NKV, HD = config.num_heads, config.num_kv_heads, config.head_dim
    interp = jax.default_backend() == "cpu"

    def norm_at(name):
        return jax.lax.dynamic_index_in_dim(layers[name], li, 0, keepdims=False)

    h = rms_norm(x, norm_at("attn_norm"), config.rms_eps)
    q = quant_apply_stacked(
        h, layers["wq"], li, (NH, HD), interpret=interp
    ).transpose(0, 2, 1, 3)
    k = quant_apply_stacked(
        h, layers["wk"], li, (NKV, HD), interpret=interp
    ).transpose(0, 2, 1, 3)
    v = quant_apply_stacked(
        h, layers["wv"], li, (NKV, HD), interpret=interp
    ).transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    idx = (li, 0, 0, cache_index, 0)
    if isinstance(full_cache, dict):
        kq_n, ks_n = _quantize_kv(k)
        vq_n, vs_n = _quantize_kv(v)
        sidx = (li, 0, 0, 0, cache_index)
        cache = {
            "kq": jax.lax.dynamic_update_slice(full_cache["kq"], kq_n[None], idx),
            "ks": jax.lax.dynamic_update_slice(full_cache["ks"], ks_n[None], sidx),
            "vq": jax.lax.dynamic_update_slice(full_cache["vq"], vq_n[None], idx),
            "vs": jax.lax.dynamic_update_slice(full_cache["vs"], vs_n[None], sidx),
        }
    else:
        cache = (
            jax.lax.dynamic_update_slice(
                full_cache[0], k.astype(full_cache[0].dtype)[None], idx
            ),
            jax.lax.dynamic_update_slice(
                full_cache[1], v.astype(full_cache[1].dtype)[None], idx
            ),
        )

    attn = decode_attention(q, cache, li, bias[:, 0, 0, :], interpret=interp)
    attn_flat = attn.transpose(0, 2, 1, 3).reshape(B, T, NH * HD)
    x = x + quant_apply_stacked(attn_flat, layers["wo"], li, (D,), interpret=interp)

    h = rms_norm(x, norm_at("mlp_norm"), config.rms_eps)
    I = layers["w_gate"]["q"].shape[-1]
    gate = quant_apply_stacked(
        h, layers["w_gate"], li, (I,), out_dtype=jnp.float32, interpret=interp
    )
    up = quant_apply_stacked(
        h, layers["w_up"], li, (I,), out_dtype=jnp.float32, interpret=interp
    )
    act = (jax.nn.silu(gate) * up).astype(x.dtype)
    mlp_out = quant_apply_stacked(act, layers["w_down"], li, (D,), interpret=interp)
    return x + mlp_out, cache


def _stacked_decode_ok(params: dict, config: DecoderConfig, T: int, cache) -> bool:
    """Static routing test for the stacked-weight decode path."""
    import os

    from trace_tpu.model.quantize import is_quantized

    if T != 1 or cache is None:
        return False
    # default OFF: measured 40.7 vs 38.7 ms/step at B=32 — the sliced path
    # was never copy-bound (the step is MXU-tile-latency-bound; see
    # BENCH_NOTES round 3); kept as an opt-in for other hardware
    if os.environ.get("TRACE_TPU_STACKED_QMM", "0") != "1":
        return False
    layers = params["layers"]
    if "router" in layers or config.attn_qkv_bias:
        return False
    if any("_lora_" in k for k in layers):
        return False
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        leaf = layers.get(name)
        if (not is_quantized(leaf) or "q" not in leaf
                or leaf["q"].dtype != jnp.int8):
            return False
    # the pallas decode-attention kernel must be eligible too (same shapes)
    leaf = cache["kq"] if isinstance(cache, dict) else cache[0]
    S = leaf.shape[3]
    if not (config.head_dim % 128 == 0 and S % 8 == 0):
        return False
    if not config.use_decode_kernel:
        return False
    from trace_tpu.kernels.decode_attention import decode_attention_impl

    impl = decode_attention_impl()
    if impl == "xla":
        return False
    # on CPU both kernels run in interpret mode, so eligibility is the same
    return True


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------

def decoder_forward(
    params: dict,
    config: DecoderConfig,
    embeds: jax.Array,  # [B, T, D]
    attn_mask: jax.Array,  # [B, T] bool — True = real token
    positions: jax.Array,  # [B, T] int32 RoPE positions
    *,
    cache: Optional[Tuple[jax.Array, jax.Array]] = None,  # ([L,B,NKV,S,hd], ...)
    cache_index: Optional[jax.Array] = None,
    cache_mask: Optional[jax.Array] = None,  # [B, S] bool over cache slots
    causal: bool = True,
    remat: bool = False,
    use_flash: bool = False,
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    """Run the decoder stack via lax.scan over stacked layer params.

    Without a cache: standard (optionally causal) self-attention within the
    sequence.  With a cache: keys/values are written at ``cache_index`` and
    attention runs over the whole static cache, masked by ``cache_mask``
    (slots valid *before* this call) plus the current chunk's causal pattern.
    """
    B, T, D = embeds.shape
    x = embeds

    cos, sin = rope_cos_sin(positions, config.head_dim, config.rope_theta)

    # Flash path (forward-only Pallas kernel): valid when the chunk is the
    # full attendable context — cache-less forward, or prefill into an empty
    # cache (generate's only T>1 cache call). Chunked multi-step prefill
    # would need a cached-context kernel variant.
    flash_ok = use_flash and T > 1 and causal
    flash_bias = (
        jnp.where(attn_mask, 0.0, NEG_INF).astype(jnp.float32) if flash_ok else None
    )

    if flash_ok:
        bias = None  # never materialize the [B,1,T,S] score mask in HBM
    elif cache is None:
        bias = jnp.where(attn_mask[:, None, None, :], 0.0, NEG_INF).astype(jnp.float32)
        if causal:
            causal_m = jnp.tril(jnp.ones((T, T), jnp.bool_))
            bias = bias + jnp.where(causal_m[None, None, :, :], 0.0, NEG_INF)
    else:
        # attention over the S cache slots, which include the chunk written
        # at cache_index..cache_index+T: a query at chunk offset i sees
        # previously-valid slots (cache_mask) plus real newly-written slots
        # up to its own position.
        S = jax.tree.leaves(cache)[0].shape[3]
        slot = jnp.arange(S)[None, None, None, :]
        qoff = jnp.arange(T)[None, None, :, None]
        in_chunk_causal = (slot >= cache_index) & (slot <= cache_index + qoff)
        valid_new = jax.lax.dynamic_update_slice(
            jnp.zeros((B, S), jnp.bool_), attn_mask.astype(jnp.bool_), (0, cache_index)
        )
        new_vis = in_chunk_causal & valid_new[:, None, None, :]
        old_vis = (
            cache_mask[:, None, None, :]
            if cache_mask is not None
            else jnp.zeros((B, 1, 1, S), jnp.bool_)
        )
        bias = jnp.where(old_vis | new_vis, 0.0, NEG_INF).astype(jnp.float32)

    layer_fn = partial(
        _layer, config=config, cos=cos, sin=sin, bias=bias, flash_bias=flash_bias
    )
    if remat:
        layer_fn = jax.checkpoint(layer_fn, static_argnums=())

    if cache is None:
        def body(x, lp):
            x, _ = layer_fn(x, lp)
            return x, None

        x, _ = jax.lax.scan(body, x, params["layers"])
        new_cache = None
    else:
        # The cache rides in the scan CARRY (pytree of [L, B, NKV, S, hd]
        # stacked leaves) so its in-place updates alias; the layer writes its
        # stripe then attends over the slice. (Fully unrolling this loop for
        # decode steps was measured SLOWER — 28 vs 17 ms/step at B=1 — the
        # rolled scan carry aliases fine and the unrolled body schedules
        # worse.)
        num_layers = jax.tree.leaves(params["layers"])[0].shape[0]

        if _stacked_decode_ok(params, config, T, cache):
            # decode step: stacked weights stay scan CONSTANTS and are read
            # in place by quant_matmul_stacked — no per-layer weight-slice
            # temps (the S-independent 4x decode gap, decode_ablate.py)
            def body(carry, li):
                x, c = carry
                x, c = _decode_layer_stacked(
                    x, params["layers"], li,
                    config=config, cos=cos, sin=sin, bias=bias,
                    full_cache=c, cache_index=cache_index,
                )
                return (x, c), None

            (x, new_cache), _ = jax.lax.scan(
                body, (x, cache), jnp.arange(num_layers)
            )
        else:
            def body(carry, inputs):
                x, c = carry
                lp, li = inputs
                x, c = layer_fn(x, lp, full_cache=c, li=li, cache_index=cache_index)
                return (x, c), None

            # T=1 decode: optionally unroll the layer scan (layer-pair or
            # -quad bodies) — the step is per-dispatch/latency-bound at
            # serving batch (BENCH_NOTES r4 decode_fuse_probe), so halving
            # the scan-iteration count trims loop overhead between layers.
            # Probe-gated env knob; full unroll measured SLOWER (28 vs 17
            # ms/step at B=1, r2) so values stay small.
            import os as _os

            unroll = 1
            if T == 1:
                try:
                    unroll = max(1, int(_os.environ.get(
                        "TRACE_TPU_DECODE_UNROLL", "1")))
                except ValueError:
                    unroll = 1
                if num_layers % unroll:
                    unroll = 1
            (x, new_cache), _ = jax.lax.scan(
                body, (x, cache), (params["layers"], jnp.arange(num_layers)),
                unroll=unroll,
            )

    x = rms_norm(x, params["final_norm"], config.rms_eps)
    return x, new_cache


def compute_logits(params: dict, hidden: jax.Array) -> jax.Array:
    """hidden [..., D] -> combined fp32 logits [..., 32027].

    Concatenation order text|sync|time|score matches the reference
    (trace_mistral.py:191-204, 246).
    """
    from trace_tpu.model.quantize import is_quantized

    h = hidden
    if is_quantized(params["lm_head"]):
        from trace_tpu.kernels.quant_matmul import quant_apply

        V = params["lm_head"]["q"].shape[-1]
        text = quant_apply(
            h, params["lm_head"], (V,), out_dtype=jnp.float32,
            interpret=jax.default_backend() == "cpu",
        )
    else:
        text = jnp.einsum("...d,dv->...v", h, params["lm_head"], preferred_element_type=jnp.float32)
    sync = jnp.einsum("...d,dv->...v", h, params["sync_head"], preferred_element_type=jnp.float32)
    time = jnp.einsum("...d,dv->...v", h, params["time_head"], preferred_element_type=jnp.float32)
    score = jnp.einsum("...d,dv->...v", h, params["score_head"], preferred_element_type=jnp.float32)
    return jnp.concatenate([text, sync, time, score], axis=-1)


def init_kv_cache(
    config: DecoderConfig, batch_size: int, max_len: int, dtype=jnp.bfloat16
):
    """Static cache: (k, v) arrays, or an int8-quantized dict layout when
    config.kv_cache_dtype == 'int8' ({kq, ks, vq, vs}; scales per
    (layer, batch, head, slot))."""
    shape = (config.num_layers, batch_size, config.num_kv_heads, max_len, config.head_dim)
    if config.kv_cache_dtype == "int8":
        # scales live as [L, B, NKV, 1, S] — slot index in the LANE dim.
        # A trailing singleton ([.., S, 1]) pads 128x under the TPU's (8,128)
        # tiling: measured 22 MB of scales ballooning to 2.75 GB on device.
        sshape = shape[:-2] + (1, max_len)
        return {
            "kq": jnp.zeros(shape, jnp.int8),
            "ks": jnp.ones(sshape, jnp.bfloat16),
            "vq": jnp.zeros(shape, jnp.int8),
            "vs": jnp.ones(sshape, jnp.bfloat16),
        }
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def _quantize_kv(x: jax.Array):
    """[B, N, T, hd] -> (int8 values, per-slot scale [B, N, 1, T])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)[:, :, None, :]  # [B, N, 1, T]
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / jnp.swapaxes(scale, -1, -2)), -127, 127
    ).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)
