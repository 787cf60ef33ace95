"""AOT memory analysis of the corpus-path generate program at batch B.

Compiles (no execution) generate_jit exactly as infer_events_corpus invokes
it (prefill_batch sub-prefills into the in-program cache + FSM decode) and
prints XLA's buffer breakdown — finds what blocks decode batch 24.

python benchmarks/decode_mem_probe.py --batch 16 24
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import init_decoder_params
from trace_tpu.model.quantize import quantize_decoder_params
from trace_tpu.runtime.generate import generate_jit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[16, 24])
    ap.add_argument("--prefix", type=int, default=2048)
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--prefill-batch", type=int, default=4)
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
    pshapes = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), pshapes
    )
    pshapes = dict(pshapes)
    del pshapes["embed"]  # the pipeline drops the decoder embed for serving
    CV = cfg.combined_vocab_size

    for B in args.batch:
        P = args.prefix
        S = P + args.tokens
        a = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
        lowered = generate_jit.lower(
            pshapes, cfg,
            a((B, P, 4096), jnp.bfloat16),        # prefix embeds
            a((B, P), jnp.bool_),                 # mask
            a((CV, 4096), jnp.bfloat16),          # combined embedding
            a((B,), jnp.int32),                   # initial head
            max_new_tokens=args.tokens, cache_len=S,
            temperature=0.0, eos_id=2, use_flash=True,
            constrain_time=False, frame_time_ids=None,
            rng=a((2,), jnp.uint32),
            prefill_batch=args.prefill_batch,
            stop_ids=None,
        )
        compiled = lowered.compile()
        m = compiled.memory_analysis()
        gb = 1024 ** 3
        print(
            f"B={B}: args={m.argument_size_in_bytes/gb:.2f} GiB "
            f"out={m.output_size_in_bytes/gb:.2f} GiB "
            f"temp={m.temp_size_in_bytes/gb:.2f} GiB "
            f"alias={m.alias_size_in_bytes/gb:.2f} GiB "
            f"peak(args+out+temp-alias)="
            f"{(m.argument_size_in_bytes + m.output_size_in_bytes + m.temp_size_in_bytes - m.alias_size_in_bytes)/gb:.2f} GiB",
            flush=True,
        )


if __name__ == "__main__":
    main()


def analyze_split(batches, prefix=2048, tokens=256):
    """Memory analysis of the decode_jit-only program (serving split)."""
    from trace_tpu.model.mistral import init_kv_cache
    from trace_tpu.runtime.generate import decode_jit

    cfg = DecoderConfig(kv_cache_dtype="int8", act_quant=True)
    pshapes = jax.eval_shape(
        lambda k: quantize_decoder_params(
            init_decoder_params(cfg, k, dtype=jnp.bfloat16)
        ),
        jax.random.PRNGKey(0),
    )
    pshapes = jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), pshapes)
    pshapes = dict(pshapes)
    del pshapes["embed"]
    CV = cfg.combined_vocab_size

    for B in batches:
        S = prefix + tokens
        cache = jax.eval_shape(lambda: init_kv_cache(cfg, B, S, dtype=jnp.bfloat16))
        cache = jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), cache)
        a = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
        lowered = decode_jit.lower(
            pshapes, cfg, cache,
            a((B, S), jnp.bool_),
            a((B, 4096), jnp.bfloat16),
            a((B,), jnp.int32),
            a((CV, 4096), jnp.bfloat16),
            a((B,), jnp.int32),
            prefix_len=prefix, max_new_tokens=tokens,
            temperature=0.0, eos_id=2,
            constrain_time=False, frame_time_ids=None,
            rng=a((2,), jnp.uint32), stop_ids=None,
        )
        compiled = lowered.compile()
        m = compiled.memory_analysis()
        gb = 1024 ** 3
        print(
            f"decode_jit B={B}: args={m.argument_size_in_bytes/gb:.2f} "
            f"out={m.output_size_in_bytes/gb:.2f} temp={m.temp_size_in_bytes/gb:.2f} "
            f"alias={m.alias_size_in_bytes/gb:.2f} "
            f"peak={(m.argument_size_in_bytes + m.output_size_in_bytes + m.temp_size_in_bytes - m.alias_size_in_bytes)/gb:.2f} GiB",
            flush=True,
        )
