"""quant_matmul_stacked streaming-bandwidth probe (isolated, no scan/while).

Measures the in-place stacked-weight kernel against the XLA slice+dequant
path on the decode step's exact shapes: x [B, 4096] bf16 against one layer
stripe of [L, 4096, N] int8, looped over all L stripes (what one decode
step's q/o projections do across the stack).

    python benchmarks/stacked_qmm_probe.py [--batch 32]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass


def fence(x):
    np.asarray(jnp.sum(x.ravel()[:8].astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from trace_tpu.kernels.quant_matmul import quant_apply, quant_matmul_stacked

    L, K, N, B = args.layers, 4096, args.n, args.batch
    q = jnp.zeros((L, K, N), jnp.int8)
    s = jnp.ones((L, N), jnp.bfloat16)
    x = jnp.ones((B, K), jnp.bfloat16)
    li_seq = jnp.arange(L)

    REPEAT = 10  # amortize the tunnel's per-dispatch latency (~25 ms/call)

    @jax.jit
    def stacked_sweep(x, q, s):
        def sweep(acc, _):
            def body(a, li):
                y = quant_matmul_stacked(x, q, s, li, out_dtype=jnp.bfloat16)
                return a + jnp.sum(y.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, acc, li_seq)
            return acc, None
        acc, _ = jax.lax.scan(sweep, jnp.float32(0), None, length=REPEAT)
        return acc

    @jax.jit
    def sliced_sweep(x, q, s):
        # the current decode path's structure: scan slices the stacked
        # weight, XLA dequant-dots the slice
        def sweep(acc, _):
            def body(a, inp):
                ql, sl = inp
                y = quant_apply(x, {"q": ql, "s": sl}, (N,), out_dtype=jnp.bfloat16)
                return a + jnp.sum(y.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, acc, (q, s))
            return acc, None
        acc, _ = jax.lax.scan(sweep, jnp.float32(0), None, length=REPEAT)
        return acc

    gb = L * K * N / 1e9 * 10  # x REPEAT
    for name, fn in (("stacked", stacked_sweep), ("sliced", sliced_sweep)):
        t0 = time.perf_counter()
        fence(fn(x, q, s))
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fence(fn(x, q, s))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(
            f"{name}: {best*1e3:.2f} ms for {gb:.2f} GB of weights "
            f"-> {gb/best:.0f} GB/s effective", flush=True,
        )


if __name__ == "__main__":
    main()
