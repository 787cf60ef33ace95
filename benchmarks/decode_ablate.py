"""Decode cost decomposition: step time vs cache length S at fixed batch.

    TRACE_TPU_QMM=xla python benchmarks/decode_ablate.py 8 512 1024 2048

Per-step time ~= W (weight traffic, S-independent) + c * B * S.  The slope
c distinguishes "attention reads the cache once" (~0.5 us/row/KS) from
"XLA copies the cache carry every step" (~3x that).
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
    args = [int(a) for a in sys.argv[1:]]
    B = args[0] if args else 8
    lengths = args[1:] or [512, 1024, 2048]
    new = 64
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

    times = []
    for P in lengths:
        prefix = jnp.zeros((B, P, 4096), jnp.bfloat16)

        def run(n_new):
            # cache_len shared across n_new so the two programs differ only
            # in the decode-loop trip count
            kw = dict(max_new_tokens=n_new, cache_len=P + new, use_flash=True)
            best = None
            for i in range(2):
                t0 = time.time()
                tokens, _ = generate_jit(
                    qp2, cfg, prefix, jnp.ones((B, P), bool), emb,
                    jnp.ones((B,), jnp.int32), rng=jax.random.PRNGKey(i), **kw,
                )
                np.asarray(tokens)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            return best

        # differential timing: (T(new) - T(new/4)) / (new - new/4) cancels
        # the in-program PREFILL + dispatch — naive T(new)/new attributed
        # B x P x 7B prefill FLOPs to "decode" and fabricated a 2x-too-slow,
        # B-scaling step time (round-3 postmortem, BENCH_NOTES)
        short = new // 4
        t_long = run(new)
        t_short = run(short)
        ms = (t_long - t_short) / (new - short) * 1e3
        times.append((P + new, ms))
        print(
            f"B={B} S={P+new}: {ms:.1f} ms/step "
            f"(gross {t_long/new*1e3:.1f} incl prefill; prefill+dispatch "
            f"~{(t_short - short*(t_long-t_short)/(new-short))*1e3:.0f} ms)",
            flush=True,
        )

    if len(times) >= 2:
        (s0, t0), (s1, t1) = times[0], times[-1]
        slope = (t1 - t0) / (s1 - s0) * 1e3  # us per cache slot
        print(f"slope {slope:.2f} us/step per slot (B={B}); intercept "
              f"~{t0 - slope * s0 / 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
