"""Block-size sweep for quant_matmul_p4 at decode shapes, timed in-program.

The standalone probe's per-dispatch timing through the tunnel measures RPC
latency, not the kernel (BENCH_NOTES). Here every config runs N_ITER kernel
invocations inside ONE jitted fori_loop (a result scalar folds back into the
input so nothing hoists), so the per-iteration time is device time.

Context: first e2e int4p run (2026-08-18) measured decode_loop 1218 tok/s at
B=32 vs int8's 1460 — the packed kernel LOST to int8 XLA dequant despite
streaming half the bytes. Hypothesis: 512x512 tiles at M=32 make per-program
overhead dominate (the weight floor per matmul is ~10 us; 32 grid programs
x ~1-2 us overhead trebles it).

Usage: python benchmarks/qmm_p4_sweep.py [--platform cpu] [--iters 64]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--m", type=int, default=32, help="decode batch rows")
    ap.add_argument("--prefill", action="store_true",
                    help="compare prefill-M paths instead: bf16 dense, "
                         "int8-xla, W8A8 s8 dot, W4A8 two-dot unpack")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from trace_tpu.kernels.quant_matmul import quant_matmul_p4

    dev = jax.devices()[0]
    cpu = dev.platform == "cpu"
    print("device:", dev, flush=True)
    n_iter = 4 if cpu else args.iters

    def loop_time(fn, x, *rest):
        @jax.jit
        def run(x):
            def body(i, carry):
                xc, acc = carry
                y = fn(xc, *rest)
                # fold a scalar of y back into x: defeats hoisting/CSE
                return (
                    xc + (y[0, 0] * 0).astype(xc.dtype),
                    acc + y[0, 0].astype(jnp.float32),
                )
            return jax.lax.fori_loop(0, n_iter, body, (x, jnp.float32(0)))

        _, acc = run(x)
        np.asarray(acc)  # compile + first run fence
        t0 = time.perf_counter()
        _, acc = run(x)
        np.asarray(acc)
        return (time.perf_counter() - t0) / n_iter

    rng = np.random.default_rng(0)
    M = args.m

    if args.prefill:
        from trace_tpu.kernels.quant_matmul import quant_apply_w8a8, quantize_acts

        M = 4864 if not cpu else 64  # pb=2 x bucket 2432 rows
        n_iter = 2 if cpu else max(4, args.iters // 8)
        for K, N in ((4096, 14336),) if not cpu else ((256, 512),):
            x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
            w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32), jnp.bfloat16)
            q8 = jnp.asarray(rng.integers(-127, 128, size=(K, N)).astype(np.int8))
            qp = jnp.asarray(rng.integers(-128, 128, size=(K // 2, N)).astype(np.int8))
            s = jnp.asarray(rng.uniform(0.01, 0.02, size=(N,)).astype(np.float32))
            tf = 2 * M * K * N / 1e12

            def bf16_dense(xc):
                return jax.lax.dot_general(
                    xc, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)

            def int8_xla(xc):
                acc = jax.lax.dot_general(
                    xc, q8.astype(xc.dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return (acc * s[None, :]).astype(xc.dtype)

            def w8a8(xc):
                xq, xs = quantize_acts(xc)
                return quant_apply_w8a8(xq, xs, {"q": q8, "s": s}, (N,))

            def w4a8(xc):
                xq, xs = quantize_acts(xc)
                return quant_apply_w8a8(xq, xs, {"qp": qp, "s": s}, (N,))

            for name, fn in (("bf16-dense", bf16_dense), ("int8-xla", int8_xla),
                             ("w8a8", w8a8), ("w4a8-2dot", w4a8)):
                dt = loop_time(fn, x)
                print(f"M={M} K={K} N={N}  {name:10s}: {dt*1e3:8.2f} ms "
                      f"({tf/dt:6.1f} TF/s-eq)", flush=True)
        return 0

    shapes = ((4096, 4096), (4096, 14336), (14336, 4096))
    if cpu:
        shapes = ((256, 512),)
    for K, N in shapes:
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
        qp = jnp.asarray(rng.integers(-128, 128, size=(K // 2, N)).astype(np.int8))
        q8 = jnp.asarray(rng.integers(-127, 128, size=(K, N)).astype(np.int8))
        s = jnp.asarray(rng.uniform(0.01, 0.02, size=(N,)).astype(np.float32))
        gb = K / 2 * N / 1e9  # packed bytes the kernel must stream

        def xla_int8(xc):
            acc = jax.lax.dot_general(
                xc, q8.astype(xc.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (acc * s[None, :]).astype(xc.dtype)

        dt = loop_time(xla_int8, x)
        print(
            f"K={K:6d} N={N:6d}  int8-xla : {dt*1e6:8.1f} us "
            f"({2*gb/dt:7.1f} GB/s int8-byte)",
            flush=True,
        )
        configs = (
            ((512, 512), (1024, 512), (512, 2048), (1024, 1024),
             (1024, 2048), (2048, 2048), (min(N, 4096), 2048))
            if not cpu else ((256, 128),)
        )
        for bn, bk in configs:
            fn = functools.partial(
                quant_matmul_p4, out_dtype=jnp.bfloat16,
                bn=bn, bk=bk, interpret=cpu,
            )
            try:
                dt = loop_time(lambda xc: fn(xc, qp, s), x)
            except Exception as e:  # config may exceed VMEM
                print(f"K={K:6d} N={N:6d}  p4 bn={bn:5d} bk={bk:5d}: "
                      f"{type(e).__name__}: {str(e)[:80]}", flush=True)
                continue
            print(
                f"K={K:6d} N={N:6d}  p4 bn={bn:5d} bk={bk:5d}: "
                f"{dt*1e6:8.1f} us ({gb/dt:7.1f} GB/s packed-byte)",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
