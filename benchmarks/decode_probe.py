"""Decode batch-scaling probe: tok/s vs batch size for the int8 config.

    TRACE_TPU_QMM=xla python benchmarks/decode_probe.py 1 8 16 24
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

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import init_decoder_params
from trace_tpu.model.quantize import quantize_decoder_params
from trace_tpu.runtime.generate import build_combined_embedding, generate_jit


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 8, 16]
    cfg = DecoderConfig()
    qshapes = jax.eval_shape(
        lambda k: quantize_decoder_params(
            init_decoder_params(cfg, k, dtype=jnp.bfloat16)
        ),
        jax.random.PRNGKey(0),
    )
    qp = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), qshapes)
    emb = build_combined_embedding(
        qp["embed"], jnp.zeros((1, 4096), jnp.bfloat16),
        jnp.zeros((13, 4096), jnp.bfloat16), jnp.zeros((13, 4096), jnp.bfloat16),
    )
    qp2 = dict(qp)
    qp2.pop("embed")

    P, new = 2048, 64
    for B in batches:
        try:
            prefix = jnp.zeros((B, P, 4096), jnp.bfloat16)
            args = dict(
                max_new_tokens=new, cache_len=P + new, use_flash=True,
            )
            t0 = time.time()
            tokens, _ = generate_jit(
                qp2, cfg, prefix, jnp.ones((B, P), bool), emb,
                jnp.ones((B,), jnp.int32), rng=jax.random.PRNGKey(0), **args,
            )
            np.asarray(tokens)
            t1 = time.time()
            tokens, _ = generate_jit(
                qp2, cfg, prefix, jnp.ones((B, P), bool), emb,
                jnp.ones((B,), jnp.int32), rng=jax.random.PRNGKey(1), **args,
            )
            np.asarray(tokens)
            dt = time.time() - t1
            print(
                f"B={B}: compile {t1-t0:.0f}s steady {dt:.2f}s "
                f"-> {B*new/dt:.1f} tok/s agg, {dt/new*1e3:.1f} ms/step",
                flush=True,
            )
        except Exception as e:
            print(f"B={B}: FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
