"""Decode-step time: fused QKV/gate|up vs per-weight, int8 vs int4p.

The decode step at serving batch is per-dot-latency-bound (qmm_p4_sweep:
a [32,4096]x[4096,4096] dot costs ~= a [32,4096]x[4096,14336] dot), so
fuse_decoder_serving's 7 dots/layer -> 4 should cut step time directly.
This probe measures it with the same differential timing decode_ablate
uses (T(64 steps) - T(16 steps) cancels prefill + dispatch).

    python benchmarks/decode_fuse_probe.py [--b 32] [--s 1088] \
        [--quant int8|int4p] [--w8a8-decode]

Env: TRACE_TPU_FUSE_DEC is irrelevant here (fusion applied explicitly).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--s", type=int, default=640, help="total cache len "
                    "(640 keeps the monolithic probe prefill on-chip; the "
                    "step's weight path is S-independent)")
    ap.add_argument("--quant", choices=["int8", "int4p"], default="int8")
    ap.add_argument("--w8a8-decode", action="store_true",
                    help="also probe TRACE_TPU_DECODE_W8A8=1 (s8xs8 T=1 dots)")
    ap.add_argument("--prefill-batch", type=int, default=0,
                    help="sub-batch the probe's prefill INSIDE generate_jit "
                    "(needed at real serving cache lens, e.g. --s 3072, "
                    "where a monolithic B=24 prefill OOMs next to the "
                    "weights+cache)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--modes", default="unfused,fused",
                    help="comma list: unfused,fused")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from trace_tpu.model.config import DecoderConfig
    from trace_tpu.model.mistral import init_decoder_params
    from trace_tpu.model.quantize import (
        fuse_decoder_serving,
        quantize_decoder_params,
    )
    from trace_tpu.runtime.generate import build_combined_embedding, generate_jit

    import dataclasses

    cpu = jax.devices()[0].platform == "cpu"
    cfg = DecoderConfig() if not cpu else DecoderConfig.tiny()
    # serving KV layout: int8 cache (the e2e arena's dtype); halves the
    # cache-read term so the weight-path difference under test stands out.
    # act_quant mirrors model_init serving configs: int8 prefill runs W8A8
    # and int4p prefill runs W4A8 — without it the int4p probe's prefill
    # falls onto the weight-only p4 kernel at M=B*P (never a serving path).
    cfg = dataclasses.replace(cfg, kv_cache_dtype="int8", act_quant=True)
    D = cfg.hidden_size
    B = args.b if not cpu else 2
    new = 64 if not cpu else 8
    P = args.s - new if not cpu else 24

    bits, pack = (8, False) if args.quant == "int8" else (4, True)
    qshapes = jax.eval_shape(
        lambda k: quantize_decoder_params(
            init_decoder_params(cfg, k, dtype=jnp.bfloat16),
            bits=bits, pack=pack,
        ),
        jax.random.PRNGKey(0),
    )
    qp = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), qshapes)
    emb = build_combined_embedding(
        qp["embed"], jnp.zeros((1, D), jnp.bfloat16),
        jnp.zeros((13, D), jnp.bfloat16), jnp.zeros((13, D), jnp.bfloat16),
    )
    base = dict(qp)
    base.pop("embed")

    def step_ms(params, label):
        prefix = jnp.zeros((B, P, D), jnp.bfloat16)

        def run(n_new):
            kw = dict(max_new_tokens=n_new, cache_len=P + new,
                      use_flash=not cpu,
                      prefill_batch=args.prefill_batch or None)
            best = None
            for i in range(2):
                t0 = time.time()
                tokens, _ = generate_jit(
                    params, cfg, prefix, jnp.ones((B, P), bool), emb,
                    jnp.ones((B,), jnp.int32), rng=jax.random.PRNGKey(i), **kw,
                )
                np.asarray(tokens)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            return best

        short = new // 4
        t_long, t_short = run(new), run(short)
        ms = (t_long - t_short) / (new - short) * 1e3
        print(f"{label:28s}: {ms:7.2f} ms/step  "
              f"({B / ms * 1e3:7.0f} tok/s at B={B})", flush=True)
        return ms

    modes = args.modes.split(",")
    results = {}
    if "unfused" in modes:
        results["unfused"] = step_ms(base, f"{args.quant} unfused")
    if "fused" in modes:
        fused = fuse_decoder_serving(base)
        assert "wqkv" in fused["layers"], "fusion did not engage"
        results["fused"] = step_ms(fused, f"{args.quant} fused")
        if args.w8a8_decode:
            os.environ["TRACE_TPU_DECODE_W8A8"] = "1"
            cfg_aq = dataclasses.replace(cfg, act_quant=True)
            prefix = jnp.zeros((B, P, D), jnp.bfloat16)

            def run_aq(n_new):
                kw = dict(max_new_tokens=n_new, cache_len=P + new,
                          use_flash=not cpu)
                t0 = time.time()
                tokens, _ = generate_jit(
                    fused, cfg_aq, prefix, jnp.ones((B, P), bool), emb,
                    jnp.ones((B,), jnp.int32), rng=jax.random.PRNGKey(0), **kw,
                )
                np.asarray(tokens)
                return time.time() - t0

            short = new // 4
            run_aq(new)  # compile
            t_long = min(run_aq(new), run_aq(new))
            t_short = min(run_aq(short), run_aq(short))
            ms = (t_long - t_short) / (new - short) * 1e3
            print(f"{args.quant + ' fused+w8a8dec':28s}: {ms:7.2f} ms/step  "
                  f"({B / ms * 1e3:7.0f} tok/s at B={B})", flush=True)
            del os.environ["TRACE_TPU_DECODE_W8A8"]
    if {"unfused", "fused"} <= results.keys():
        print(f"fusion speedup: {results['unfused'] / results['fused']:.3f}x",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
