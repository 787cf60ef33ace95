"""Standalone decode-attention microbench: 32-layer sweep over the stacked
cache, pallas kernel vs XLA slice+attend, implied HBM bandwidth.

    python benchmarks/attn_probe.py 8 2112
"""

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

from trace_tpu.kernels.decode_attention import decode_attention
from trace_tpu.model.mistral import _attention

L, NKV, G, HD = 32, 8, 4, 128
H = NKV * G


def main():
    args = [int(a) for a in sys.argv[1:]]
    B = args[0] if args else 8
    S = args[1] if len(args) > 1 else 2112
    reps = 8

    k = jnp.zeros((L, B, NKV, S, HD), jnp.bfloat16)
    v = jnp.zeros((L, B, NKV, S, HD), jnp.bfloat16)
    q = jnp.zeros((B, H, 1, HD), jnp.bfloat16)
    bias = jnp.zeros((B, S), jnp.float32)

    @jax.jit
    def sweep_pallas(q, k, v, bias):
        def body(acc, li):
            o = decode_attention(q, (k, v), li, bias)
            return acc + o.astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros(q.shape, jnp.float32), jnp.arange(L))
        return jnp.sum(acc)

    @jax.jit
    def sweep_xla(q, k, v, bias):
        def body(acc, li):
            ks = jax.lax.dynamic_index_in_dim(k, li, 0, keepdims=False)
            vs = jax.lax.dynamic_index_in_dim(v, li, 0, keepdims=False)
            o = _attention(q, ks, vs, bias[:, None, None, :])
            return acc + o.astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros(q.shape, jnp.float32), jnp.arange(L))
        return jnp.sum(acc)

    gb = 2 * L * B * NKV * S * HD * 2 / 1e9  # one full k+v read, bf16
    for name, fn in (("pallas", sweep_pallas), ("xla", sweep_xla)):
        t0 = time.time()
        np.asarray(fn(q, k, v, bias))
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            r = fn(q, k, v, bias)
        np.asarray(r)
        dt = (time.time() - t0) / reps
        print(
            f"{name}: compile {tc:.0f}s sweep {dt*1e3:.2f} ms "
            f"({gb/dt:.0f} GB/s effective, {dt/L*1e6:.0f} us/layer) B={B} S={S}",
            flush=True,
        )


if __name__ == "__main__":
    main()
