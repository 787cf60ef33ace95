"""AOT memory analysis of the SPLIT corpus path at decode batch B.

The corpus path for batch > 8 runs three executables per chunk
(pipeline.infer_events_corpus -> generate_split):

  1. prefill_into_jit  (prefill_batch rows -> donated big cache)
  2. decode_jit        (full-batch FSM decode, donated cache aliases out)

This probe compiles both (no execution) and prints, per executable, XLA's
buffer breakdown PLUS the whole-phase peak: executable peak + the other
live buffers the program doesn't see (the stacked prefix during prefill,
the big cache held between calls).  Finds what OOMs decode batch 32.

python benchmarks/split_mem_probe.py --batch 32 --prefill-batch 2
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import init_decoder_params
from trace_tpu.model.quantize import quantize_decoder_params
from trace_tpu.runtime.generate import decode_jit, init_kv_cache, prefill_into_jit

GB = 1024 ** 3


def tree_bytes(shapes) -> int:
    return sum(
        int(jnp.dtype(l.dtype).itemsize) * int(jnp.prod(jnp.asarray(l.shape or (1,))))
        for l in jax.tree.leaves(shapes)
    )


def report(tag, compiled):
    m = compiled.memory_analysis()
    peak = (
        m.argument_size_in_bytes + m.output_size_in_bytes
        + m.temp_size_in_bytes - m.alias_size_in_bytes
    )
    print(
        f"{tag}: args={m.argument_size_in_bytes/GB:.2f} "
        f"out={m.output_size_in_bytes/GB:.2f} "
        f"temp={m.temp_size_in_bytes/GB:.2f} "
        f"alias={m.alias_size_in_bytes/GB:.2f} "
        f"peak={peak/GB:.2f} GiB",
        flush=True,
    )
    return peak


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--prefix", type=int, default=1920)
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--prefill-batch", type=int, default=2)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    cfg = DecoderConfig(kv_cache_dtype="int8", act_quant=True)
    pshapes = jax.eval_shape(
        lambda k: quantize_decoder_params(
            init_decoder_params(cfg, k, dtype=jnp.bfloat16)
        ),
        jax.random.PRNGKey(0),
    )
    pshapes = dict(
        jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), pshapes)
    )
    del pshapes["embed"]  # the pipeline drops the decoder embed for serving
    CV = cfg.combined_vocab_size
    B, P, pb = args.batch, args.prefix, args.prefill_batch
    S = P + args.tokens
    a = jax.ShapeDtypeStruct

    big_shapes = jax.eval_shape(
        lambda: init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)
    )
    big_b = tree_bytes(big_shapes)
    w_b = tree_bytes(pshapes)
    prefix_b = B * P * 4096 * 2
    emb_b = CV * 4096 * 2
    print(
        f"resident: weights={w_b/GB:.2f} big_cache={big_b/GB:.2f} "
        f"prefix={prefix_b/GB:.2f} combined_embed={emb_b/GB:.2f} GiB",
        flush=True,
    )

    pf = prefill_into_jit.lower(
        pshapes, cfg, big_shapes,
        a((pb, P, 4096), jnp.bfloat16),
        a((pb, P), jnp.bool_),
        a((), jnp.int32),
        cache_len=S, use_flash=True,
    ).compile()
    pf_peak = report(f"prefill_into pb={pb}", pf)
    # prefill-phase whole-chip peak: executable args already include weights
    # and the big cache; add the full stacked prefix (minus the pb rows the
    # executable counts) + combined embed held for decode
    phase1 = pf_peak + (prefix_b - pb * P * 4096 * 2) + emb_b
    print(f"prefill-phase peak ~= {phase1/GB:.2f} GiB", flush=True)

    dec = decode_jit.lower(
        pshapes, cfg, big_shapes,
        a((B, S), jnp.bool_),
        a((B, 4096), jnp.bfloat16),
        a((B,), jnp.int32),
        a((CV, 4096), jnp.bfloat16),
        a((B,), jnp.int32),
        prefix_len=P, max_new_tokens=args.tokens,
        temperature=0.0, eos_id=2,
        rng=a((2,), jnp.uint32),
    ).compile()
    dec_peak = report(f"decode B={B}", dec)
    print(f"decode-phase peak ~= {dec_peak/GB:.2f} GiB", flush=True)


if __name__ == "__main__":
    main()
