"""Pallas TPU decode-step attention over the layer-stacked KV cache.

Decode attends each step over a [L, B, NKV, S, hd] cache that rides the
layer scan's carry.  XLA must materialize the layer's [B, NKV, S, hd]
slice before the score dot (a dynamic-slice cannot fuse into a dot
operand), which doubles the cache's HBM traffic every step — measured as
the dominant per-row decode cost at batch 8 (39 ms/step vs a ~14 ms
bandwidth roofline).  This kernel reads the stacked cache IN PLACE: the
layer index arrives as a scalar-prefetch operand and selects the stripe in
the BlockSpec index maps, so the only HBM traffic is the single streaming
read the attention itself requires.

Functional replacement for the reference's incremental HF
`past_key_values` decode path (trace/model/language_model/trace_mistral.py
via transformers.generate) — python-side growing caches are untraceable
under jit; here the cache is static and invalid slots are masked by an
additive bias row.

Handles GQA by blocking q as [B, NKV, G, hd] (the G = H // NKV query heads
that share one KV stripe are one MXU matmul) and the int8 KV-cache layout
by dequantizing in-register (int8 values stream at half the bf16 bytes;
scales are per-slot [S, 1] rows that lane-broadcast).

No cost_estimate / dimension_semantics compiler hints: those caused
pathological (25+ min) remote compiles for kernels nested in
scan-inside-while (see kernels/quant_matmul.py, TRACE_TPU_QMM_HINTS).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def decode_attention_impl() -> str:
    """'pallas' (default) or 'xla' — escape hatch via TRACE_TPU_DECODE_ATTN."""
    return os.environ.get("TRACE_TPU_DECODE_ATTN", "pallas")


def _kernel_bf16(li_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, hpb):
    # hpb kv heads per program: one big DMA per block streams better than
    # hpb small ones (grid-iteration overhead amortizes over 2x the bytes)
    for h in range(hpb):
        q = q_ref[0, h]                               # [G, hd]
        k = k_ref[0, 0, h]                            # [S, hd]
        v = v_ref[0, 0, h]                            # [S, hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                     # [G, S]
        s = s + bias_ref[0]                           # [1, S] broadcast
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / jnp.maximum(l, 1e-30)
        o_ref[0, h] = o.astype(o_ref.dtype)


def _kernel_int8(
    li_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref, o_ref, *,
    scale, hpb
):
    # scales arrive as [1, S] rows (slot in the lane dim — a [S, 1] layout
    # pads 128x on TPU); per-slot scaling factors out of the dots:
    #   q . (kq * ks)^T == (q . kq^T) * ks_row
    #   p . (vq * vs)   == (p * vs_row) . vq
    for h in range(hpb):
        q = q_ref[0, h]                                            # [G, hd]
        kq = kq_ref[0, 0, h].astype(jnp.bfloat16)                  # [S, hd]
        vq = vq_ref[0, 0, h].astype(jnp.bfloat16)
        ks = ks_ref[0, 0, h].astype(jnp.float32)                   # [1, S]
        vs = vs_ref[0, 0, h].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), kq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * ks * scale
        s = s + bias_ref[0]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            (p.astype(jnp.bfloat16) * vs), vq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / jnp.maximum(l, 1e-30)
        o_ref[0, h] = o.astype(o_ref.dtype)


def _kernel_int8_s8dot(
    li_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref, o_ref, *,
    scale, hpb
):
    """s8xs8-dot variant: the int8 KV blocks feed the MXU directly.

    _kernel_int8 spends its VPU on casting the [S, hd] kq/vq blocks to
    bf16 (2*S*hd elements per head — the dominant in-kernel compute at
    serving S, measured 505 GB/s effective vs the 819 GB/s HBM roofline,
    benchmarks/attn_bw_probe.py).  Instead quantize the SMALL operands
    ([G, hd] q rows; [G, S] post-softmax probabilities) to int8 and run
    both dots as s8xs8 -> s32, folding the row scales into the output:
        q . (kq * ks)^T == (qq . kq^T) * qs * ks
        softmax(p) . (vq * vs) == ((pq . vq) * ps) / l,  pq = q8(p * vs)
    Probability quantization error is bounded by the per-row max (exactly
    1.0 pre-normalization), i.e. <= 1/254 per slot — same order as the
    int8 KV storage the path already uses; parity pinned in
    tests/test_decode_attention.py and the 7B divergence probes."""
    for h in range(hpb):
        q = q_ref[0, h].astype(jnp.float32)                        # [G, hd]
        qa = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
        qs = jnp.maximum(qa, 1e-8) * (1.0 / 127.0)
        qq = jnp.clip(jnp.round(q / qs), -127, 127).astype(jnp.int8)
        kq = kq_ref[0, 0, h]                                       # [S, hd] s8
        vq = vq_ref[0, 0, h]
        ks = ks_ref[0, 0, h].astype(jnp.float32)                   # [1, S]
        vs = vs_ref[0, 0, h].astype(jnp.float32)
        s32 = jax.lax.dot_general(
            qq, kq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                                          # [G, S]
        s = s32.astype(jnp.float32) * (qs * scale) * ks
        s = s + bias_ref[0]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = p * vs                                                # [G, S]
        pa = jnp.max(pv, axis=-1, keepdims=True)  # pv >= 0
        ps = jnp.maximum(pa, 1e-30) * (1.0 / 127.0)
        pq = jnp.clip(jnp.round(pv / ps), -127, 127).astype(jnp.int8)
        o32 = jax.lax.dot_general(
            pq, vq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                                          # [G, hd]
        o = o32.astype(jnp.float32) * ps / jnp.maximum(l, 1e-30)
        o_ref[0, h] = o.astype(o_ref.dtype)


def _kernel_int8_s8dot_stacked(
    li_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref, o_ref, *,
    scale, hpb
):
    """s8dot with the VPU chain batched across the program's hpb heads.

    The flat hpb sweep (2/4/8 -> 9.9/10.2/9.9 ms at B=24 S=3072,
    benchmarks/_r5/probe*.log) shows the kernel is bound neither by grid
    count nor by bulk VPU throughput (removing the [S, hd] casts changed
    nothing) — the critical path is the DEPENDENT op chain
    dot -> scale -> max -> exp -> sum -> quant -> dot, serialized once per
    head (B*NKV = 192 chains per layer at serving shape).  This variant
    keeps the hpb independent QK dots, stacks their scores into one
    [hpb*G, S] block, runs a single softmax/quantize chain over it (same
    element count, 1/hpb the per-op issue latencies on the dependent path),
    then runs the hpb independent PV dots.  Numerically identical math to
    _kernel_int8_s8dot up to f32 op order."""
    G = q_ref.shape[2]
    s_heads = []
    qs_heads = []
    for h in range(hpb):
        q = q_ref[0, h].astype(jnp.float32)                        # [G, hd]
        qa = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
        qs = jnp.maximum(qa, 1e-8) * (1.0 / 127.0)
        qq = jnp.clip(jnp.round(q / qs), -127, 127).astype(jnp.int8)
        s_heads.append(jax.lax.dot_general(
            qq, kq_ref[0, 0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ))                                                         # [G, S]
        qs_heads.append(qs)
    S = s_heads[0].shape[-1]
    s32 = jnp.concatenate(s_heads, axis=0)                         # [R, S]
    qs = jnp.concatenate(qs_heads, axis=0)                         # [R, 1]
    # per-slot K/V scales differ per head: broadcast [hpb, 1, S] -> [R, S]
    ks = jnp.broadcast_to(
        ks_ref[0, 0].astype(jnp.float32), (hpb, G, S)).reshape(hpb * G, S)
    vs = jnp.broadcast_to(
        vs_ref[0, 0].astype(jnp.float32), (hpb, G, S)).reshape(hpb * G, S)
    s = s32.astype(jnp.float32) * (qs * scale) * ks
    s = s + bias_ref[0]                                            # [1, S]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = p * vs                                                    # [R, S]
    pa = jnp.max(pv, axis=-1, keepdims=True)  # pv >= 0
    ps = jnp.maximum(pa, 1e-30) * (1.0 / 127.0)
    pq = jnp.clip(jnp.round(pv / ps), -127, 127).astype(jnp.int8)
    for h in range(hpb):
        o32 = jax.lax.dot_general(
            pq[h * G:(h + 1) * G], vq_ref[0, 0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                                          # [G, hd]
        o = (o32.astype(jnp.float32) * ps[h * G:(h + 1) * G]
             / jnp.maximum(l[h * G:(h + 1) * G], 1e-30))
        o_ref[0, h] = o.astype(o_ref.dtype)


def decode_attention_supported(q: jax.Array, cache) -> bool:
    """Static eligibility: single-token chunk shapes with tile-legal dims.

    S sits in the sublane position of the [.., S, hd] blocks (multiple of 8);
    hd is the lane dim (multiple of 128).  The bias block's lane dim is the
    full S axis (equal-to-array-dim is always tile-legal)."""
    B, H, T, hd = q.shape
    leaf = cache["kq"] if isinstance(cache, dict) else cache[0]
    S = leaf.shape[3]
    return T == 1 and hd % 128 == 0 and S % 8 == 0 and H % leaf.shape[2] == 0


def decode_attention(
    q: jax.Array,        # [B, H, 1, hd]
    cache,               # (k, v) [L,B,NKV,S,hd] bf16 | {kq,ks,vq,vs} int8
    li: jax.Array,       # scalar int32 layer index
    bias_row: jax.Array, # [B, S] additive fp32 (0 visible / -inf masked)
    *,
    interpret: bool = False,
) -> jax.Array:
    """One decode step of attention, reading layer ``li``'s cache stripe in
    place.  Returns [B, H, 1, hd] in q's dtype."""
    B, H, T, hd = q.shape
    quant = isinstance(cache, dict)
    leaf = cache["kq"] if quant else cache[0]
    L, _, NKV, S, _ = leaf.shape
    G = H // NKV
    scale = hd ** -0.5

    qg = q.reshape(B, NKV, G, hd)
    li_arr = jnp.reshape(li, (1,)).astype(jnp.int32)
    # [B, 1, S]: the block's trailing dims (1, S) equal the array dims — the
    # tile-legal shape for a per-row bias (a (1, S) 2D block has sublane 1,
    # illegal once B > 1)
    bias3 = bias_row.astype(jnp.float32)[:, None, :]

    # kv heads per program: bigger blocks = fewer, larger DMAs (better HBM
    # streaming) at ~S*hd*2*hpb bytes of VMEM per buffer; bounded to keep
    # K+V (+double buffering) under a budget of the ~16 MB VMEM.  The 8 MB
    # default silently demoted hpb=8 to 4 at serving shape (S=3072,
    # hd=128: per_head 393 KB) — raise via TRACE_TPU_DECODE_ATTN_VMEM_MB
    # to A/B genuinely larger blocks (13 MB admits hpb=8 int8).
    hpb = int(os.environ.get("TRACE_TPU_DECODE_ATTN_HPB", "4"))
    vmem_mb = float(os.environ.get("TRACE_TPU_DECODE_ATTN_VMEM_MB", "8"))
    per_head = S * hd * (1 if quant else 2)
    while hpb > 1 and (NKV % hpb or 4 * hpb * per_head > vmem_mb * 1024 * 1024):
        hpb //= 2

    def q_map(b, n, li_ref):
        return (b, n, 0, 0)

    def kv_map(b, n, li_ref):
        return (li_ref[0], b, n, 0, 0)

    def bias_map(b, n, li_ref):
        return (b, 0, 0)

    q_spec = pl.BlockSpec((1, hpb, G, hd), q_map)
    kv_spec = pl.BlockSpec((1, 1, hpb, S, hd), kv_map)
    scale_spec = pl.BlockSpec((1, 1, hpb, 1, S), kv_map)  # scales [L,B,N,1,S]
    bias_spec = pl.BlockSpec((1, 1, S), bias_map)

    if quant:
        # s8xs8 dots (default): kq/vq feed the MXU as int8 — no [S, hd]
        # VPU casts.  TRACE_TPU_DECODE_ATTN_S8: 2 (default) = stacked
        # softmax chain across the program's heads, 1 = per-head chains,
        # 0 = bf16-dot dequant-in-register kernel.
        s8_mode = os.environ.get("TRACE_TPU_DECODE_ATTN_S8", "2")
        k_impl = {
            "0": _kernel_int8,
            "1": _kernel_int8_s8dot,
        }.get(s8_mode, _kernel_int8_s8dot_stacked)
        kernel = functools.partial(k_impl, scale=scale, hpb=hpb)
        in_specs = [q_spec, kv_spec, scale_spec, kv_spec, scale_spec, bias_spec]
        operands = (qg, cache["kq"], cache["ks"], cache["vq"], cache["vs"], bias3)
    else:
        kernel = functools.partial(_kernel_bf16, scale=scale, hpb=hpb)
        in_specs = [q_spec, kv_spec, kv_spec, bias_spec]
        operands = (qg, cache[0], cache[1], bias3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NKV // hpb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hpb, G, hd), q_map),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NKV, G, hd), q.dtype),
        interpret=interpret,
    )(li_arr, *operands)
    return out.reshape(B, H, 1, hd)
