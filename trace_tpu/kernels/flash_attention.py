"""Pallas TPU attention kernels.

Replaces the reference's opt-in flash-attention-2 CUDA dependency
(model/builder.py:52-53) with TPU-native Pallas.  The key memory property:
attention scores live only in VMEM per q-block ([block_q, Tk] fp32), never in
HBM — XLA's stock lowering materializes the full [B, H, Tq, Tk] fp32 scores
(2.7 GB for a 128-frame ViT batch, ~600 MB for a 2K LM prefill), which is
what OOMs a 16 GB v5e next to 14 GB of bf16 weights.

Because the whole per-head K/V slice fits VMEM at TRACE's sequence lengths
(<= 4K · 128 · bf16 = 1 MB), each q-block computes its scores in ONE MXU
matmul + masked softmax instead of an online-softmax streaming loop — simpler
and faster for this regime.

Supports GQA (kv head = h // group), causal masking, and an additive
per-position bias row (padding masks for left- or right-padded batches).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, causal, block_q):
    qi = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32)          # [block_q, hd]
    k = k_ref[0, 0].astype(jnp.float32)          # [Tk, hd]
    v = v_ref[0, 0].astype(jnp.float32)          # [Tk, hd]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                     # [block_q, Tk]

    s = s + bias_ref[0, 0][None, :]               # padding bias row [Tk]

    if causal:
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=0
        )
        k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / jnp.maximum(l, 1e-30)

    o_ref[0, 0] = o.astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int, value=0.0) -> jax.Array:
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad, constant_values=value)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "interpret"))
def flash_attention(
    q: jax.Array,                     # [B, H, Tq, hd]
    k: jax.Array,                     # [B, Hkv, Tk, hd]
    v: jax.Array,                     # [B, Hkv, Tk, hd]
    mask_bias: Optional[jax.Array] = None,  # [B, Tk] fp32 additive (0 / -inf)
    *,
    causal: bool = False,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Blocked attention, scores VMEM-only. Returns [B, H, Tq, hd] (q dtype)."""
    B, H, Tq, hd = q.shape
    Hkv, Tk = k.shape[1], k.shape[2]
    G = H // Hkv
    scale = hd ** -0.5

    if Tq <= 128:
        block_q = 128
    block_q = min(block_q, -(-Tq // 128) * 128)

    qp = _pad_to(_pad_to(q, 2, block_q), 3, 128)
    kp = _pad_to(_pad_to(k, 2, 128), 3, 128)
    vp = _pad_to(_pad_to(v, 2, 128), 3, 128)
    Tq_p, hd_p = qp.shape[2], qp.shape[3]
    Tk_p = kp.shape[2]

    if mask_bias is None:
        mask_bias = jnp.zeros((B, Tk), jnp.float32)
    bias_p = _pad_to(mask_bias.astype(jnp.float32), 1, Tk_p)
    if Tk_p != Tk:
        # padded key slots must be invisible
        col = jnp.arange(Tk_p)[None, :]
        bias_p = jnp.where(col < Tk, bias_p, NEG_INF)
    # [B, 1, Tk_p] so the block's trailing dims (1, Tk_p) satisfy the TPU
    # tiling rule (equal to the array's respective dims)
    bias_p = bias_p[:, None, :]

    grid = (B, H, Tq_p // block_q)

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, causal=causal, block_q=block_q
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, hd_p), lambda b, h, i: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Tk_p, hd_p), lambda b, h, i: (b, h // G, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Tk_p, hd_p), lambda b, h, i: (b, h // G, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Tk_p), lambda b, h, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, hd_p), lambda b, h, i: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Tq_p, hd_p), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.2 * 4 * (block_q * Tk_p + 3 * Tk_p * hd_p))
            + 4 * block_q * hd_p * 4,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Tq_p * Tk_p * hd_p,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=B * H * Tq_p * Tk_p,
        ),
        interpret=interpret,
    )(qp, kp, vp, bias_p)

    return out[:, :, :Tq, :hd]


def _btd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, tq, nh_blk, hd):
    """[B, T, D]-layout bidirectional attention, heads lane-sliced in-kernel.

    Built for the ViT's shape (T=577 -> 592 sublane pad, hd=64): the
    [B, H, T, hd] head transpose + pad-to-128 relayouts around the generic
    flash kernel cost more than its dots (attention measured 165 ms of the
    407 ms ViT video; benchmarks/attn_tune.py) — this kernel reads q/k/v in
    the layer's natural [B, T, D] layout and writes the output there too,
    so the only data movement is the block DMA itself.  Issue order is
    software-pipelined: both heads' QK dots first, then the softmaxes, then
    the PV dots, letting head h+1's MXU dot overlap head h's VPU softmax.
    Key columns >= tq are masked (-inf); pad ROWS produce garbage that the
    caller slices off."""
    ss = []
    for h in range(nh_blk):
        sl = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(
            q_ref[0, :, sl], k_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        ss.append(s)
    ps, ls = [], []
    for h in range(nh_blk):
        s = ss[h]
        pad = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) >= tq
        s = jnp.where(pad, NEG_INF, s)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        ls.append(jnp.sum(p, axis=-1, keepdims=True))
        ps.append(p.astype(v_ref.dtype))
    for h in range(nh_blk):
        sl = slice(h * hd, (h + 1) * hd)
        o = jax.lax.dot_general(
            ps[h], v_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / ls[h]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tq", "num_heads", "heads_per", "interpret"))
def vit_attention_btd(
    q: jax.Array,                 # [B, P, D], P sublane-aligned (>= tq)
    k: jax.Array,
    v: jax.Array,
    *,
    tq: int,                      # real sequence length (<= P)
    num_heads: int,
    heads_per: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """Bidirectional attention in [B, T, D] layout (see _btd_kernel)."""
    B, P, D = q.shape
    hd = D // num_heads
    scale = hd ** -0.5
    W = heads_per * hd
    return pl.pallas_call(
        functools.partial(
            _btd_kernel, scale=scale, tq=tq, nh_blk=heads_per, hd=hd
        ),
        grid=(B, num_heads // heads_per),
        in_specs=[
            pl.BlockSpec((1, P, W), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec((1, P, W), lambda b, h: (b, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * P * P * hd,
            bytes_accessed=4 * B * P * D * q.dtype.itemsize,
            transcendentals=B * num_heads * P * P,
        ),
        interpret=interpret,
    )(q, k, v)


def vit_attention_btd_reference(q, k, v, *, tq, num_heads):
    """XLA reference for vit_attention_btd (CPU tests / parity)."""
    B, P, D = q.shape
    hd = D // num_heads
    qh = q.reshape(B, P, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, P, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, P, num_heads, hd).transpose(0, 2, 1, 3)
    bias = jnp.where(jnp.arange(P) < tq, 0.0, NEG_INF)[None, :]
    o = xla_attention(qh, kh, vh, jnp.broadcast_to(bias, (B, P)))
    return o.transpose(0, 2, 1, 3).reshape(B, P, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention_trainable(q, k, v, mask_bias, causal: bool = False):
    """Differentiable flash attention, scores VMEM-only in BOTH directions:
    the forward saves the per-row logsumexp residual and the backward
    recomputes score blocks inside the Pallas dq / dkv kernels
    (kernels/flash_backward.py) — nothing [B, H, Tq, Tk]-shaped ever
    reaches HBM."""
    return flash_attention(q, k, v, mask_bias, causal=causal)


def _fat_fwd(q, k, v, mask_bias, causal):
    from trace_tpu.kernels.flash_backward import flash_attention_fwd_res

    o, lse = flash_attention_fwd_res(q, k, v, mask_bias, causal=causal)
    return o, (q, k, v, mask_bias, o, lse)


def _fat_bwd(causal, res, g):
    from trace_tpu.kernels.flash_backward import flash_attention_bwd

    q, k, v, mask_bias, o, lse = res
    dq, dk, dv = flash_attention_bwd(
        q, k, v, mask_bias, o, lse, g, causal=causal
    )
    dmask = None if mask_bias is None else jnp.zeros_like(mask_bias)
    return dq, dk, dv, dmask


flash_attention_trainable.defvjp(_fat_fwd, _fat_bwd)


def attention_with_fallback(
    q, k, v, mask_bias=None, *, causal=False, use_flash=True
):
    """flash_attention with an XLA einsum fallback (CPU tests, tiny shapes)."""
    if use_flash and q.shape[-1] >= 32:
        try:
            return flash_attention(q, k, v, mask_bias, causal=causal)
        except Exception:
            pass
    return xla_attention(q, k, v, mask_bias, causal=causal)


def xla_attention(q, k, v, mask_bias=None, *, causal=False):
    """Reference XLA path (materializes scores; used on CPU / for parity tests)."""
    B, H, Tq, hd = q.shape
    Hkv, Tk = k.shape[1], k.shape[2]
    G = H // Hkv
    qg = q.reshape(B, Hkv, G, Tq, hd)
    s = jnp.einsum("bngth,bnsh->bngts", qg, k, preferred_element_type=jnp.float32)
    s = s * (hd ** -0.5)
    if mask_bias is not None:
        s = s + mask_bias[:, None, None, None, :]
    if causal:
        qpos = jnp.arange(Tq)[:, None]
        kpos = jnp.arange(Tk)[None, :]
        s = jnp.where((kpos <= qpos)[None, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bngts,bnsh->bngth", p, v, preferred_element_type=jnp.float32)
    return o.reshape(B, H, Tq, hd).astype(q.dtype)
