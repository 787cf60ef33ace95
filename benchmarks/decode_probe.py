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
    import os

    batches = [int(a) for a in sys.argv[1:]] or [1, 8, 16]
    cfg = DecoderConfig(kv_cache_dtype=os.environ.get("TRACE_TPU_KV", "bf16"))
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

    # Two decode lengths at the SAME cache_len isolate the per-step decode
    # cost from prefill: decode_ms = (t_long - t_short) / (long - short).
    P, short, long_ = 2048, 8, 136
    for B in batches:
        try:
            prefix = jnp.zeros((B, P, 4096), jnp.bfloat16)
            times = {}
            for new in (short, long_):
                args = dict(max_new_tokens=new, cache_len=P + long_, use_flash=True)
                t0 = time.time()
                for i in range(2):
                    t1 = time.time()
                    tokens, _ = generate_jit(
                        qp2, cfg, prefix, jnp.ones((B, P), bool), emb,
                        jnp.ones((B,), jnp.int32),
                        rng=jax.random.PRNGKey(i), **args,
                    )
                    np.asarray(tokens)
                times[new] = time.time() - t1
                compile_s = t1 - t0
            step_ms = (times[long_] - times[short]) / (long_ - short) * 1e3
            prefill_s = times[short] - short * step_ms / 1e3
            print(
                f"B={B}: prefill {prefill_s*1e3:.0f} ms, decode "
                f"{step_ms:.1f} ms/step ({B/step_ms*1e3:.0f} tok/s agg) "
                f"[last compile {compile_s:.0f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"B={B}: FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
