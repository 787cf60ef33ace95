"""Probe: can int8 x int8 MXU dots beat the int8-dequant-into-bf16 path?

Prefill is pinned at ~145 TFLOP/s through convert(int8)->bf16 dots
(BENCH_NOTES.md); the v5e's int8 MXU peak is ~2x its bf16 peak, so true
s8 x s8 -> s32 dots with dynamic per-token activation quantization are the
structural lever. This probe measures, at prefill/ViT shapes:

  bf16:   x_bf16 @ w_bf16
  wdq:    x_bf16 @ convert(w_int8)  * col_scale          (current path)
  w8a8:   quant(x) -> s8; s8 @ s8 -> s32; * row*col scale (candidate)
  w8a8nq: s8 @ s8 only (activation quant cost excluded — upper bound)

Usage: python benchmarks/w8a8_probe.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@jax.jit
def mm_bf16(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)


@jax.jit
def mm_wdq(x, q, s):
    acc = jax.lax.dot_general(
        x, q.astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (acc * s.astype(jnp.float32)[None, :]).astype(jnp.bfloat16)


@jax.jit
def mm_w8a8(x, q, s):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * xs * s.astype(jnp.float32)[None, :]).astype(
        jnp.bfloat16
    )


@jax.jit
def mm_w8a8_noquant(xq, q, s, xs):
    acc = jax.lax.dot_general(
        xq, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * xs * s.astype(jnp.float32)[None, :]).astype(
        jnp.bfloat16
    )


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    shapes = [
        (2048, 4096, 4096),    # prefill attention proj, B*P=2048
        (8192, 4096, 14336),   # prefill MLP at batch 4 x 2048
        (2048, 4096, 14336),   # prefill MLP single row-block
        (73728, 1024, 1024),   # ViT qkv/out, 128 frames x 577 tokens
        (73728, 1024, 4096),   # ViT fc1
        (73728, 4096, 1024),   # ViT fc2
    ]
    for M, K, N in shapes:
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.02
        q = jnp.clip(
            jnp.round(w.astype(jnp.float32) / 0.001), -127, 127
        ).astype(jnp.int8)
        s = jnp.full((N,), 0.001, jnp.bfloat16)
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        xs = jnp.maximum(amax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)

        flops = 2 * M * K * N
        res = {}
        res["bf16"] = timeit(mm_bf16, x, w)
        res["wdq"] = timeit(mm_wdq, x, q, s)
        res["w8a8"] = timeit(mm_w8a8, x, q, s)
        res["w8a8nq"] = timeit(mm_w8a8_noquant, xq, q, s, xs)
        line = f"M={M:6d} K={K:5d} N={N:5d} | " + " | ".join(
            f"{k}: {v*1e3:7.2f} ms {flops/v/1e12:6.1f} TF/s" for k, v in res.items()
        )
        print(line, flush=True)

        # numeric sanity: w8a8 vs bf16 reference
        ref = np.asarray(mm_bf16(x, w), np.float32)
        got = np.asarray(mm_w8a8(x, q, s), np.float32)
        denom = np.maximum(np.abs(ref).mean(), 1e-6)
        print(f"            w8a8 rel-err vs bf16: {np.abs(got-ref).mean()/denom:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
