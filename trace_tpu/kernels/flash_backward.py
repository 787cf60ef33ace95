"""Pallas TPU flash-attention backward kernels (FlashAttention-2 style).

The trainable wrapper's original backward recomputed attention through XLA,
materializing the full [B, H, Tq, Tk] fp32 score matrix in HBM twice (fwd
recompute + its vjp) — ~4.3 GB transient for an 8x2K LM prefill, the same
buffer the Pallas forward exists to avoid.  These kernels keep every score
block in VMEM:

  residuals: o (forward output) and L = m + log(sum exp(s - m)) per row.
  p = exp(s - L)                  (recomputed per block, normalized)
  delta = rowsum(do * o)
  dv = p^T do;  ds = p * (do v^T - delta);  dq = ds k * scale;
  dk = ds^T q * scale

Two kernels: dq blocks over q rows (full K/V per head in VMEM — the same
single-shot regime as the forward, valid for TRACE's <= 4K contexts), and
dk/dv blocks over k rows with full Q/dO per head.  GQA: dk/dv are emitted
per *query* head and group-summed by XLA (G <= 4 — the extra HBM write is
cheaper than cross-program accumulation, which Mosaic has no atomics for).

Replaces the reference's flash-attention-2 CUDA backward dependency
(model/builder.py:52-53 enables FA2 for training; HF Mistral calls its
fused bwd).  No compiler hints (see quant_matmul.py pathology note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _causal_mask(s, qi, block_q):
    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(k_pos <= q_pos, s, NEG_INF)


def _fwd_res_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, l_ref, *, scale, causal, block_q):
    """Forward with residuals: writes o and the per-row logsumexp L."""
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias_ref[0, 0][None, :]
    if causal:
        s = _causal_mask(s, qi, block_q)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = o.astype(o_ref.dtype)
    l_ref[0, 0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _dq_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale, causal, block_q,
):
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)          # [bq, hd]
    k = k_ref[0, 0].astype(jnp.float32)          # [Tk, hd]
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)        # [bq, hd]
    lse = lse_ref[0, 0]                          # [bq, 1]
    delta = delta_ref[0, 0]                      # [bq, 1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias_ref[0, 0][None, :]
    if causal:
        s = _causal_mask(s, qi, block_q)
    p = jnp.exp(s - lse)                         # [bq, Tk], 0 where masked
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale, causal, block_k,
):
    ki = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)          # [Tq, hd]
    k = k_ref[0, 0].astype(jnp.float32)          # [bk, hd]
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)        # [Tq, hd]
    # lse/delta arrive transposed [.., 1, Tq] and bias [.., bk, 1] so every
    # read is a plain slice — Mosaic rejects the gathers fancy indexing
    # like x[None, :, 0] lowers to
    lse = lse_ref[0, 0]                          # [1, Tq]
    delta = delta_ref[0, 0]                      # [1, Tq]

    # s^T block: [bk, Tq]
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias_ref[0]                      # [bk, 1] broadcast
    if causal:
        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        q_pos = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
        st = jnp.where(k_pos <= q_pos, st, NEG_INF)
    pt = jnp.exp(st - lse)                       # [bk, Tq]
    dv = jax.lax.dot_general(
        pt, do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                            # [bk, Tq]
    dst = pt * (dpt - delta)
    dk = jax.lax.dot_general(
        dst, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _pad_to(x, axis, multiple, value=0.0):
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad, constant_values=value)


def _prep(q, k, v, mask_bias, block_q):
    B, H, Tq, hd = q.shape
    Tk = k.shape[2]
    qp = _pad_to(_pad_to(q, 2, block_q), 3, 128)
    kp = _pad_to(_pad_to(k, 2, 128), 3, 128)
    vp = _pad_to(_pad_to(v, 2, 128), 3, 128)
    Tk_p = kp.shape[2]
    if mask_bias is None:
        mask_bias = jnp.zeros((B, Tk), jnp.float32)
    bias_p = _pad_to(mask_bias.astype(jnp.float32), 1, Tk_p)
    if Tk_p != Tk:
        col = jnp.arange(Tk_p)[None, :]
        bias_p = jnp.where(col < Tk, bias_p, NEG_INF)
    return qp, kp, vp, bias_p[:, None, :]


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "interpret"))
def flash_attention_fwd_res(
    q, k, v, mask_bias=None, *, causal=False, block_q=256, interpret=False
):
    """Forward pass returning (o, lse) with lse = m + log l per q row,
    shaped [B, H, Tq, 1] fp32 — the residual the backward kernels need."""
    B, H, Tq, hd = q.shape
    G = H // k.shape[1]
    scale = hd ** -0.5
    if Tq <= 128:
        block_q = 128
    block_q = min(block_q, -(-Tq // 128) * 128)
    qp, kp, vp, bias_p = _prep(q, k, v, mask_bias, block_q)
    Tq_p, hd_p, Tk_p = qp.shape[2], qp.shape[3], kp.shape[2]

    grid = (B, H, Tq_p // block_q)
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_res_kernel, scale=scale, causal=causal, block_q=block_q
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, hd_p), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Tk_p, hd_p), lambda b, h, i: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Tk_p, hd_p), lambda b, h, i: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Tk_p), lambda b, h, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, hd_p), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Tq_p, hd_p), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tq_p, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, bias_p)
    return o[:, :, :Tq, :hd], lse[:, :, :Tq]


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret")
)
def flash_attention_bwd(
    q, k, v, mask_bias, o, lse, do,
    *, causal=False, block_q=256, block_k=256, interpret=False,
):
    """Returns (dq, dk, dv) in the input dtypes; scores stay VMEM-blocked."""
    B, H, Tq, hd = q.shape
    NKV, Tk = k.shape[1], k.shape[2]
    G = H // NKV
    scale = hd ** -0.5
    if Tq <= 128:
        block_q = 128
    block_q = min(block_q, -(-Tq // 128) * 128)
    block_k = min(block_k, -(-Tk // 128) * 128)

    qp, kp, vp, bias_p = _prep(q, k, v, mask_bias, block_q)
    dop = _pad_to(_pad_to(do, 2, block_q), 3, 128)
    op = _pad_to(_pad_to(o, 2, block_q), 3, 128)
    Tq_p, hd_p, Tk_p = qp.shape[2], qp.shape[3], kp.shape[2]
    lse_p = _pad_to(lse, 2, block_q)

    delta = jnp.sum(
        dop.astype(jnp.float32) * op.astype(jnp.float32), axis=-1, keepdims=True
    )  # [B, H, Tq_p, 1]

    q_spec = pl.BlockSpec((1, 1, block_q, hd_p), lambda b, h, i: (b, h, i, 0))
    kv_spec = pl.BlockSpec((1, 1, Tk_p, hd_p), lambda b, h, i: (b, h // G, 0, 0))
    bias_spec = pl.BlockSpec((1, 1, Tk_p), lambda b, h, i: (b, 0, 0))
    row_spec = pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0))

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, causal=causal, block_q=block_q
        ),
        grid=(B, H, Tq_p // block_q),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Tq_p, hd_p), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, bias_p, dop, lse_p, delta)

    # dk/dv per query head, grouped-summed to the NKV axis afterwards.
    # Row stats transpose to [B,H,1,Tq_p] and bias to [B,Tk_p,1] so kernel
    # reads are plain slices (no Mosaic gathers).
    lse_t = lse_p.transpose(0, 1, 3, 2)
    delta_t = delta.transpose(0, 1, 3, 2)
    bias_t = bias_p.transpose(0, 2, 1)

    kblk_spec = pl.BlockSpec((1, 1, block_k, hd_p), lambda b, h, i: (b, h // G, i, 0))
    kbias_spec = pl.BlockSpec((1, block_k, 1), lambda b, h, i: (b, i, 0))
    qfull_spec = pl.BlockSpec((1, 1, Tq_p, hd_p), lambda b, h, i: (b, h, 0, 0))
    rowT_spec = pl.BlockSpec((1, 1, 1, Tq_p), lambda b, h, i: (b, h, 0, 0))
    okv_spec = pl.BlockSpec((1, 1, block_k, hd_p), lambda b, h, i: (b, h, i, 0))

    dk_h, dv_h = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, causal=causal, block_k=block_k
        ),
        grid=(B, H, Tk_p // block_k),
        in_specs=[
            qfull_spec, kblk_spec, kblk_spec, kbias_spec,
            qfull_spec, rowT_spec, rowT_spec,
        ],
        out_specs=[okv_spec, okv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Tk_p, hd_p), k.dtype),
            jax.ShapeDtypeStruct((B, H, Tk_p, hd_p), v.dtype),
        ],
        interpret=interpret,
    )(qp, kp, vp, bias_t, dop, lse_t, delta_t)

    dk = dk_h.reshape(B, NKV, G, Tk_p, hd_p).sum(2).astype(k.dtype)
    dv = dv_h.reshape(B, NKV, G, Tk_p, hd_p).sum(2).astype(v.dtype)
    return (
        dq[:, :, :Tq, :hd],
        dk[:, :, :Tk, :hd],
        dv[:, :, :Tk, :hd],
    )
