"""Prefill-phase decomposition at serving shapes: sub-batch dispatch cost.

The streamed pipeline's fenced prefill_s runs ~0.15-0.22 s/video at
decode_batch 24 / prefill_batch 2 (12 sequential prefill_into_jit
dispatches per chunk), while the W8A8 FLOP budget at P=768 predicts
~0.04 s/video — the gap is either per-dispatch overhead through the
tunneled runtime or sub-batch MXU inefficiency at M = pb*768.  This probe
times the full prefill loop of generate_split (max_new_tokens=1, shared
512 budget, donated arena recycled between reps) at prefill_batch 2/4/8
over the SAME batch-24 corpus: if wall time drops ~2x per doubling, the
cost is per-dispatch; if flat, it's the sub-batch program itself.

    python benchmarks/prefill_probe.py [--batch 24] [--prefix 768]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--prefix", type=int, default=768)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sub-batches", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true", help="tiny config (CPU smoke)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from bench import zero_params
    from trace_tpu.model.config import DecoderConfig, TraceConfig, VisionConfig
    from trace_tpu.runtime import generate as gen

    if args.tiny:
        config = TraceConfig.tiny()
        config = __import__("dataclasses").replace(
            config,
            decoder=__import__("dataclasses").replace(
                config.decoder, kv_cache_dtype="int8", act_quant=True
            ),
        )
    else:
        config = TraceConfig(
            decoder=DecoderConfig(kv_cache_dtype="int8", act_quant=True),
            vision=VisionConfig(),
            dtype=jnp.bfloat16,
        )
    params = zero_params(config, quant=args.quant)["decoder"]
    combined = jnp.zeros(
        (config.decoder.combined_vocab_size, config.decoder.hidden_size),
        jnp.bfloat16,
    )

    B, P = args.batch, args.prefix
    D = config.decoder.hidden_size
    rng = np.random.default_rng(0)
    prefix_host = rng.standard_normal((B, P, D), np.float32) * 0.02
    prefix = jax.device_put(jnp.asarray(prefix_host, jnp.bfloat16))
    mask = jnp.ones((B, P), bool)
    np.asarray(jnp.sum(prefix.ravel()[:8].astype(jnp.float32)))  # fence upload

    # matmul weight count from the actual tree (int4p leaves pack 2/byte)
    import jax.tree_util as jtu

    n_w = sum(
        l.size * (2 if "qp" in jtu.keystr(kp) else 1)
        for kp, l in jtu.tree_leaves_with_path(params)
        if l.dtype == jnp.int8 or str(l.dtype) == "int4"
    ) or sum(
        l.size for kp, l in jtu.tree_leaves_with_path(params)
        if l.ndim >= 2 and l.dtype == jnp.bfloat16
    )
    tf = 2 * B * P * n_w / 1e12
    print(f"B={B} P={P} quant={args.quant}: {tf:.1f} TF per full prefill",
          flush=True)

    cache = None
    for pb in args.sub_batches:
        if B % pb:
            continue
        times = []
        for r in range(args.reps):
            out = gen.generate_split(
                params, config.decoder,
                [jnp.copy(prefix)], mask, combined,
                prefill_batch=pb, max_new_tokens=1, token_budget=512,
                temperature=0.0, eos_id=-5, time_phases=True, cache=cache,
            )
            cache = out.cache
            times.append(out.phase_times["prefill_s"])
        best = min(times)
        print(
            f"prefill_batch={pb}: {[round(t, 3) for t in times]} s "
            f"(best {best:.3f} = {best / B * 1e3:.0f} ms/video, "
            f"{tf / best:.0f} TF/s eq, {B // pb} dispatches "
            f"-> {best / (B // pb) * 1e3:.0f} ms/dispatch)",
            flush=True,
        )


if __name__ == "__main__":
    main()
