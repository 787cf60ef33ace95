"""Mosaic compile + correctness probe for quant_matmul_p4 on the real TPU.

Round-3 shipped the packed-int4 kernel CPU-validated only; its first chip
contact (2026-08-18) failed Mosaic compile at `shift_left` (sub-32-bit int
shift vectors unsupported on v5e). The unpack is now float arithmetic; this
probe compiles and runs the kernel at decode- and prefill-like shapes and
checks exactness against the XLA unpack path.

Usage: python benchmarks/qmm_p4_probe.py [--platform cpu]
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
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    if args.platform:
        # the env's sitecustomize pins jax_platforms='axon,cpu'; the config
        # override after import is the working pattern (see tests/conftest)
        jax.config.update("jax_platforms", args.platform)

    from trace_tpu.kernels.quant_matmul import quant_matmul_p4
    from trace_tpu.model.quantize import unpack4

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    cpu = dev.platform == "cpu"
    rng = np.random.default_rng(0)
    ok = True
    # [M, K, N]: decode row (padded-8), decode batch 32, prefill chunk.
    # CPU (1 core here) gets tiny shapes — it only checks the math.
    shapes = (
        ((8, 256, 256), (32, 256, 512)) if cpu
        else ((8, 4096, 4096), (32, 4096, 14336), (4096, 4096, 4096))
    )
    for M, K, N in shapes:
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
        qp = jnp.asarray(
            rng.integers(-128, 128, size=(K // 2, N)).astype(np.int8)
        )
        s = jnp.asarray(rng.uniform(0.01, 0.02, size=(N,)).astype(np.float32))
        t0 = time.perf_counter()
        y = quant_matmul_p4(x, qp, s, out_dtype=jnp.float32, interpret=cpu)
        np.asarray(y[:1, :1])  # fence (block_until_ready is a tunnel no-op)
        t_compile = time.perf_counter() - t0
        ref = (
            jnp.einsum(
                "mk,kn->mn",
                x.astype(jnp.float32),
                unpack4(qp).astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            * s[None, :]
        )
        err = float(jnp.max(jnp.abs(y - ref)))
        rel = err / max(float(jnp.max(jnp.abs(ref))), 1e-9)
        # bf16 x exact-int4 dot: identical operands both paths -> tiny rel err
        good = rel < 2e-2
        ok &= good
        # steady-state timing: 5 fenced iterations
        t0 = time.perf_counter()
        for _ in range(5):
            y = quant_matmul_p4(x, qp, s, out_dtype=jnp.float32, interpret=cpu)
        np.asarray(y[:1, :1])
        dt = (time.perf_counter() - t0) / 5
        gb = (K / 2 * N) / 1e9
        print(
            f"M={M:5d} K={K} N={N:6d}: compile+run {t_compile:6.1f}s, "
            f"steady {dt*1e3:7.2f} ms ({gb/dt:6.1f} GB/s packed-weight), "
            f"rel_err {rel:.2e} {'OK' if good else 'FAIL'}",
            flush=True,
        )
    print("p4 probe:", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
