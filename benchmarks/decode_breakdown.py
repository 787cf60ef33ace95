"""Decode-step decomposition: which part carries the per-batch-row cost?

decode_ablate.py showed the full step is S-independent (38.7 ms at B=32,
S=576 vs 40.7 at S=2816) and strongly B-dependent above B=8 (B=1: 17,
B=8: 18.1, B=32: 38.7 ms/step) — ~0.85 ms per extra row that no roofline
term explains.  This probe times stripped variants of the step in the same
while-loop structure:

  layers      decoder_forward with cache (attention + weights + KV update)
  layers_nc   decoder_forward WITHOUT cache (pure weight path, no attention)
  heads       compute_logits + head-FSM + embed gather only (no decoder)
  full        all of it (should reproduce decode_ablate)

    python benchmarks/decode_breakdown.py --batch 32 --variants layers heads
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

from functools import partial

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import (
    compute_logits,
    decoder_forward,
    init_decoder_params,
    init_kv_cache,
)
from trace_tpu.model.quantize import quantize_decoder_params
from trace_tpu.runtime.generate import head_mask_table, swap_heads


def fence(x):
    np.asarray(jnp.sum(jax.tree.leaves(x)[0].ravel()[:8].astype(jnp.float32)))


def zeros_like_shapes(tree):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--prefix", type=int, default=512)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", nargs="+",
                    default=["full", "layers", "layers_nc", "heads"])
    args = ap.parse_args()

    cfg = DecoderConfig(kv_cache_dtype="int8", act_quant=True)
    B, P, N = args.batch, args.prefix, args.steps
    S = P + N
    D = cfg.hidden_size
    CV = cfg.combined_vocab_size

    pshapes = jax.eval_shape(
        lambda k: quantize_decoder_params(
            init_decoder_params(cfg, k, dtype=jnp.bfloat16)
        ),
        jax.random.PRNGKey(0),
    )
    pshapes = dict(pshapes)
    del pshapes["embed"]
    params = zeros_like_shapes(pshapes)
    table = jnp.zeros((CV, D), jnp.bfloat16)
    mask_table = head_mask_table(cfg)

    def mk_cache():
        return init_kv_cache(cfg, B, S, dtype=jnp.bfloat16)

    cache_mask0 = jnp.zeros((B, S), bool).at[:, :P].set(True)

    @partial(jax.jit, donate_argnums=(1,))
    def run_layers(params, cache, with_cache=True):
        x0 = jnp.zeros((B, 1, D), jnp.bfloat16)

        def body(s):
            step, x, c, cm = s
            h, c = decoder_forward(
                params, cfg, x, jnp.ones((B, 1), bool),
                jnp.full((B, 1), P, jnp.int32) + step,
                cache=c, cache_index=P + step, cache_mask=cm,
            )
            cm = cm.at[:, P + step].set(True)
            return step + 1, h.astype(jnp.bfloat16), c, cm

        def cond(s):
            return s[0] < N

        _, x, c, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), x0, cache, cache_mask0))
        return x, c

    @jax.jit
    def run_layers_nc(params):
        x0 = jnp.zeros((B, 1, D), jnp.bfloat16)

        def body(s):
            step, x = s
            h, _ = decoder_forward(
                params, cfg, x, jnp.ones((B, 1), bool),
                jnp.full((B, 1), P, jnp.int32) + step,
                causal=False,
            )
            return step + 1, h.astype(jnp.bfloat16)

        _, x = jax.lax.while_loop(lambda s: s[0] < N, body, (jnp.int32(0), x0))
        return x

    @jax.jit
    def run_heads(params, table):
        h0 = jnp.zeros((B, D), jnp.bfloat16)
        tok0 = jnp.zeros((B,), jnp.int32)
        head0 = jnp.ones((B,), jnp.int32)

        def body(s):
            step, tok, head, acc = s
            emb = table[tok]  # the per-step gather
            h = h0 + emb.astype(jnp.bfloat16)
            logits = compute_logits(params, h)
            masked = logits + mask_table[head]
            tok = jnp.argmax(masked, axis=-1).astype(jnp.int32)
            head = swap_heads(cfg, head, tok)
            return step + 1, tok, head, acc + jnp.sum(h.astype(jnp.float32))

        _, tok, _, acc = jax.lax.while_loop(
            lambda s: s[0] < N, body, (jnp.int32(0), tok0, head0, jnp.float32(0))
        )
        return tok, acc

    variants = {
        "layers": lambda: run_layers(params, mk_cache()),
        "layers_nc": lambda: run_layers_nc(params),
        "heads": lambda: run_heads(params, table),
    }

    for name in args.variants:
        if name == "full":
            continue  # use decode_ablate for the full step
        fn = variants[name]
        t0 = time.perf_counter()
        fence(fn())
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fence(fn())
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / N * 1e3
        print(f"{name}: {ms:.2f} ms/step (B={B}, S={S})", flush=True)


if __name__ == "__main__":
    main()
