"""Isolate the Pallas quant-matmul compile pathology.

Stages: (1) standalone kernel, (2) kernel inside lax.scan over stacked
weights, (3) scan inside a small lax.while_loop — timing each compile.
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

from trace_tpu.kernels.quant_matmul import quant_matmul

D, I, L = 4096, 14336, 8
x = jnp.zeros((8, D), jnp.bfloat16)
q = jnp.zeros((D, I), jnp.int8)
s = jnp.ones((I,), jnp.bfloat16)
qs = jnp.zeros((L, D, I), jnp.int8)
ss = jnp.ones((L, I), jnp.bfloat16)


def report(name, fn, *args):
    t0 = time.time()
    try:
        out = fn(*args)
        np.asarray(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        print(f"{name}: OK compile+run {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:100]}", flush=True)


# 1. standalone
report("standalone", jax.jit(lambda a, b, c: quant_matmul(a, b, c)), x, q, s)

# 2. inside scan
@jax.jit
def scanned(x, qs, ss):
    def body(h, inp):
        qq, sc = inp
        return quant_matmul(h, qq, sc)[:, :D], None

    out, _ = jax.lax.scan(body, x, (qs[..., :D], ss[..., :D]))
    return out

report("scan", scanned, x, qs, ss)

# 3. scan inside while
@jax.jit
def whiled(x, qs, ss):
    def w_body(state):
        i, h = state
        def body(h, inp):
            qq, sc = inp
            return quant_matmul(h, qq, sc)[:, :D], None
        h, _ = jax.lax.scan(body, h, (qs[..., :D], ss[..., :D]))
        return i + 1, h

    _, out = jax.lax.while_loop(lambda s: s[0] < 4, w_body, (0, x))
    return out

report("while(scan)", whiled, x, qs, ss)
