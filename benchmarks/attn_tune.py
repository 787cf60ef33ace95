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

    bench("flash (production)", lambda q, k, v: flash_attention(q, k, v), q, k, v)
    bench("flash block_q=128",
          lambda q, k, v: flash_attention(q, k, v, block_q=128), q, k, v)
    bench("single-block 640", lambda q, k, v: single_block(q, k, v), q, k, v)
    bench("single-block 640 vmem8",
          lambda q, k, v: single_block(q, k, v, vmem_mb=8), q, k, v)
    bench("single-block 592",
          lambda q, k, v: single_block(q, k, v, pad_to=592), q, k, v)
    bench("heads-resident/frame", lambda q, k, v: heads_resident(q, k, v), q, k, v)

    # correctness cross-check vs XLA
    from trace_tpu.kernels.flash_attention import xla_attention
    ref = xla_attention(q, k, v)
    for name, fn in [("single-block", lambda: single_block(q, k, v)),
                     ("heads-resident", lambda: heads_resident(q, k, v))]:
        err = float(jnp.max(jnp.abs(fn().astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"max|{name} - xla| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
