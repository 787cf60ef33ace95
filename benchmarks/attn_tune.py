"""ViT attention kernel tuning at the production shape (B=16, H=16, T=577,
hd=64).  vit_ablate.py showed attention costs 165 ms/video — 4x its padded
FLOP cost — while the surrounding matmuls run at ~90% MXU.  Suspects: 768
tiny grid programs per chunk and a ~2.5 MB vmem_limit_bytes that can stop
Mosaic from double-buffering block DMAs.

    python benchmarks/attn_tune.py
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

B, H, T, HD = 16, 16, 577, 64
REPS = 64  # amortize 25 ms dispatch via an inner scan


def fence(x):
    np.asarray(jnp.sum(x.ravel()[:8].astype(jnp.float32)))


def bench(name, fn, q, k, v):
    """fn: (q,k,v)->o.  Times REPS applications inside one lax.scan program."""

    @jax.jit
    def loop(q, k, v):
        def body(c, _):
            o = fn(q + c * 0.0, k, v)  # data dep keeps iterations live
            return jnp.sum(o[..., :1, :1].astype(jnp.float32)), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c

    try:
        fence(loop(q, k, v))
        t0 = time.perf_counter()
        fence(loop(q, k, v))
        dt = (time.perf_counter() - t0) / REPS
        per_video = dt * 8 * 23 * 1e3  # 8 chunks x 23 layers
        print(f"{name:28s}: {dt*1e6:8.1f} us/chunk-layer  (~{per_video:6.1f} ms/video)",
              flush=True)
    except Exception as e:
        print(f"{name:28s}: FAIL {type(e).__name__}: {str(e)[:90]}", flush=True)


# ---------------------------------------------------------------------------
# current production kernel
from trace_tpu.kernels.flash_attention import flash_attention


def kernel_single_block(q_ref, k_ref, v_ref, o_ref, *, scale, tq):
    """One program per (b, h): whole-sequence scores in VMEM."""
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    pad = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) >= tq
    s = jnp.where(pad, -1e30, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def single_block(q, k, v, *, pad_to=640, vmem_mb=None, dtype_probs=False):
    Bq, Hq, Tq, hd = q.shape
    P = pad_to
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, P - Tq), (0, 128 - hd)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, P - Tq), (0, 128 - hd)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, P - Tq), (0, 128 - hd)))
    params = {}
    if vmem_mb:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20
        )
    out = pl.pallas_call(
        functools.partial(kernel_single_block, scale=hd ** -0.5, tq=Tq),
        grid=(Bq, Hq),
        in_specs=[
            pl.BlockSpec((1, 1, P, 128), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P, 128), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P, 128), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, P, 128), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bq, Hq, P, 128), q.dtype),
        **params,
    )(qp, kp, vp)
    return out[:, :, :Tq, :hd]


def kernel_single_block_bf16(q_ref, k_ref, v_ref, o_ref, *, scale, tq):
    """bf16 MXU dots (fp32 accum), fp32 softmax, bf16 probs for PV.
    The fp32-everything variant runs the dots at the MXU's fp32 rate
    (~1/8 of bf16 on v5e) — likely the whole mystery."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    pad = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) >= tq
    s = jnp.where(pad, -1e30, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def kernel_single_block_bf16_exp(q_ref, k_ref, v_ref, o_ref, *, scale, tq):
    """As bf16 variant but exp on bf16 (2 elems/lane VPU) — accuracy probe."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    pad = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) >= tq
    s = jnp.where(pad, -1e30, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp((s - m).astype(jnp.bfloat16))
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def kernel_nosoftmax(q_ref, k_ref, v_ref, o_ref, *, scale, tq):
    """Dots only — isolates the softmax VPU share of the program."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    o = jax.lax.dot_general(s.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def kernel_multihead_unrolled(q_ref, k_ref, v_ref, o_ref, *, scale, tq, nh):
    """NH heads per program, python-unrolled: independent per-head DAGs let
    the Mosaic scheduler overlap head h's softmax (VPU) with head h+1's
    dots (MXU)."""
    for h in range(nh):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        pad = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) >= tq
        s = jnp.where(pad, -1e30, s)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


def multihead(q, k, v, *, pad_to=592, heads_per=4):
    Bq, Hq, Tq, hd = q.shape
    P = pad_to
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, P - Tq), (0, 128 - hd)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, P - Tq), (0, 128 - hd)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, P - Tq), (0, 128 - hd)))
    HP = heads_per
    out = pl.pallas_call(
        functools.partial(kernel_multihead_unrolled, scale=hd ** -0.5,
                          tq=Tq, nh=HP),
        grid=(Bq, Hq // HP),
        in_specs=[
            pl.BlockSpec((1, HP, P, 128), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec((1, HP, P, 128), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bq, Hq, P, 128), q.dtype),
    )(qp, kp, vp)
    return out[:, :, :Tq, :hd]


def kernel_btd(q_ref, k_ref, v_ref, o_ref, *, scale, tq, nh_blk, hd):
    """[B, T, D]-layout attention: heads lane-sliced in-kernel.

    Per program: one batch row, nh_blk heads (the D block is nh_blk*hd
    lanes).  No input transpose, no head-dim padding; output lands back in
    [B, T, D] ready for the output projection."""
    for h in range(nh_blk):
        sl = slice(h * hd, (h + 1) * hd)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        pad = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) >= tq
        s = jnp.where(pad, -1e30, s)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


def kernel_btd_interleaved(q_ref, k_ref, v_ref, o_ref, *, scale, tq, nh_blk, hd):
    """btd with software-pipelined issue order: all QK dots first, then the
    softmaxes, then the PV dots — lets head 1's MXU dot run concurrently
    with head 0's VPU softmax (in-order issue + scoreboarding)."""
    ss = []
    for h in range(nh_blk):
        sl = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(q_ref[0, :, sl], k_ref[0, :, sl],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        ss.append(s)
    ps, ls = [], []
    for h in range(nh_blk):
        s = ss[h]
        pad = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) >= tq
        s = jnp.where(pad, -1e30, s)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        ls.append(jnp.sum(p, axis=-1, keepdims=True))
        ps.append(p.astype(jnp.bfloat16))
    for h in range(nh_blk):
        sl = slice(h * hd, (h + 1) * hd)
        o = jax.lax.dot_general(ps[h], v_ref[0, :, sl],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / ls[h]).astype(o_ref.dtype)


def attention_btd_i(q, k, v, *, tq, nh=16, heads_per=2):
    Bq, P, D = q.shape
    hd = D // nh
    W = heads_per * hd
    out = pl.pallas_call(
        functools.partial(kernel_btd_interleaved, scale=hd ** -0.5, tq=tq,
                          nh_blk=heads_per, hd=hd),
        grid=(Bq, nh // heads_per),
        in_specs=[
            pl.BlockSpec((1, P, W), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec((1, P, W), lambda b, h: (b, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bq, P, D), q.dtype),
    )(q, k, v)
    return out


def attention_btd(q, k, v, *, tq, nh=16, heads_per=2):
    """q,k,v: [B, P, D] (P sublane-aligned, D = nh*hd)."""
    Bq, P, D = q.shape
    hd = D // nh
    W = heads_per * hd  # lane width per program
    out = pl.pallas_call(
        functools.partial(kernel_btd, scale=hd ** -0.5, tq=tq,
                          nh_blk=heads_per, hd=hd),
        grid=(Bq, nh // heads_per),
        in_specs=[
            pl.BlockSpec((1, P, W), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec((1, P, W), lambda b, h: (b, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bq, P, D), q.dtype),
    )(q, k, v)
    return out


def single_block_k(kernel, q, k, v, *, pad_to=640):
    Bq, Hq, Tq, hd = q.shape
    P = pad_to
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, P - Tq), (0, 128 - hd)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, P - Tq), (0, 128 - hd)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, P - Tq), (0, 128 - hd)))
    out = pl.pallas_call(
        functools.partial(kernel, scale=hd ** -0.5, tq=Tq),
        grid=(Bq, Hq),
        in_specs=[
            pl.BlockSpec((1, 1, P, 128), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec((1, 1, P, 128), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bq, Hq, P, 128), q.dtype),
    )(qp, kp, vp)
    return out[:, :, :Tq, :hd]


def kernel_heads_resident(q_ref, k_ref, v_ref, o_ref, *, scale, tq, nh):
    """One program per frame; all heads live in VMEM, fori over heads."""
    def body(h, _):
        q = q_ref[0, h].astype(jnp.float32)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        pad = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) >= tq
        s = jnp.where(pad, -1e30, s)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / l).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nh, body, 0)


def heads_resident(q, k, v, *, pad_to=640):
    Bq, Hq, Tq, hd = q.shape
    P = pad_to
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, P - Tq), (0, 128 - hd)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, P - Tq), (0, 128 - hd)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, P - Tq), (0, 128 - hd)))
    out = pl.pallas_call(
        functools.partial(kernel_heads_resident, scale=hd ** -0.5, tq=Tq, nh=Hq),
        grid=(Bq,),
        in_specs=[
            pl.BlockSpec((1, Hq, P, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hq, P, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hq, P, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hq, P, 128), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bq, Hq, P, 128), q.dtype),
    )(qp, kp, vp)
    return out[:, :, :Tq, :hd]


def main():
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (B, H, T, HD), jnp.bfloat16)
               for kk in jax.random.split(key, 3))

    # [B, P, D] layout inputs (the layer's natural layout, pre-padded once)
    P = 592
    qb = jnp.pad(q.transpose(0, 2, 1, 3).reshape(B, T, H * HD), ((0, 0), (0, P - T), (0, 0)))
    kb = jnp.pad(k.transpose(0, 2, 1, 3).reshape(B, T, H * HD), ((0, 0), (0, P - T), (0, 0)))
    vb = jnp.pad(v.transpose(0, 2, 1, 3).reshape(B, T, H * HD), ((0, 0), (0, P - T), (0, 0)))

    bench("btd x2",
          lambda q_, k_, v_: attention_btd(q_, k_, v_, tq=T, heads_per=2),
          qb, kb, vb)
    for hp in (2, 4):
        bench(f"btd-interleaved x{hp}",
              lambda q_, k_, v_, hp=hp: attention_btd_i(q_, k_, v_, tq=T, heads_per=hp),
              qb, kb, vb)

    # correctness cross-check vs XLA
    from trace_tpu.kernels.flash_attention import xla_attention
    ref = xla_attention(q, k, v)  # [B, H, T, hd]
    ref_btd = ref.transpose(0, 2, 1, 3).reshape(B, T, H * HD)
    got = attention_btd(qb, kb, vb, tq=T, heads_per=2)[:, :T]
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref_btd.astype(jnp.float32))))
    print(f"max|btd - xla| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
