"""Measure real prefill + ViT programs with W8A8 on vs off (int8 weights).

python benchmarks/w8a8_model_probe.py [--what prefill|vit|both]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def fence(x):
    """block_until_ready is a no-op on the tunneled backend (measured 0 ms
    for a 128-frame ViT); a D2H scalar fetch is the only reliable fence.
    The device stream is serial, so fetching the LAST output's value
    implies all prior enqueued work finished."""
    import numpy as np

    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def bench(fn, params, cfg, make_input, iters=4, warmup=1):
    inputs = [make_input(i) for i in range(iters + warmup)]
    for i in range(warmup):
        fence(fn(params, cfg, inputs[i]))
    t0 = time.perf_counter()
    outs = [fn(params, cfg, inputs[warmup + i]) for i in range(iters)]
    fence(outs[-1])
    return (time.perf_counter() - t0) / iters


def zeros_like_shapes(tree):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tree)


def probe_prefill(B=4, P=2048):
    from functools import partial

    from trace_tpu.model.config import DecoderConfig
    from trace_tpu.model.mistral import (
        decoder_forward, init_decoder_params, init_kv_cache,
    )
    from trace_tpu.model.quantize import quantize_decoder_params

    cfg = DecoderConfig(kv_cache_dtype="int8")
    shapes = jax.eval_shape(
        lambda k: quantize_decoder_params(
            init_decoder_params(cfg, k, dtype=jnp.bfloat16)
        ),
        jax.random.PRNGKey(0),
    )
    params = zeros_like_shapes(shapes)

    S = P + 256
    mask = jnp.ones((B, P), bool)
    pos = jnp.broadcast_to(jnp.arange(P), (B, P)).astype(jnp.int32)

    def make_embeds(i):
        return jnp.full((B, P, 4096), 0.01 * (i + 1), jnp.bfloat16)

    @partial(jax.jit, static_argnames=("c",))
    def prefill(p, c, e):  # e from make_embeds
        cache = init_kv_cache(c, B, S)
        h, cache = decoder_forward(
            p, c, e, mask, pos, cache=cache, cache_index=jnp.int32(0),
            cache_mask=jnp.zeros((B, S), bool), use_flash=True,
        )
        return h[:, -1, :]

    flops = 2 * 7.2e9 * B * P
    for aq in (False, True):
        c = dataclasses.replace(cfg, act_quant=aq)
        t = bench(prefill, params, c, make_embeds)
        print(
            f"prefill B={B} P={P} act_quant={aq}: {t*1e3:.0f} ms "
            f"({flops/t/1e12:.0f} TFLOP/s eq)",
            flush=True,
        )


def probe_vit(frames=128, chunk=16):
    from functools import partial

    from trace_tpu.model.config import VisionConfig
    from trace_tpu.model.quantize import quantize_vision_params
    from trace_tpu.model.vit import init_vit_params, vit_forward

    cfg = VisionConfig()
    shapes = jax.eval_shape(
        lambda k: quantize_vision_params(
            init_vit_params(cfg, k, dtype=jnp.bfloat16)
        ),
        jax.random.PRNGKey(0),
    )
    params = zeros_like_shapes(shapes)

    def make_imgs(i):
        return jnp.full((frames, 336, 336, 3), 0.01 * (i + 1), jnp.bfloat16)

    @partial(jax.jit, static_argnames=("c",))
    def encode(p, c, im):
        def body(x):
            return vit_forward(p, c, x, use_flash=True)

        return jax.lax.map(body, im.reshape(-1, chunk, 336, 336, 3))

    # ~0.30B params x 2 x 577 tokens x frames, 23 of 24 layers
    flops = 2 * 0.303e9 * 577 * frames * 23 / 24
    for aq in (False, True):
        c = dataclasses.replace(cfg, act_quant=aq)
        t = bench(encode, params, c, make_imgs)
        print(
            f"vit frames={frames} chunk={chunk} act_quant={aq}: {t*1e3:.0f} ms "
            f"({frames/t:.0f} f/s, {flops/t/1e12:.0f} TFLOP/s eq)",
            flush=True,
        )

    # bf16 reference (unquantized weights)
    bf = zeros_like_shapes(
        jax.eval_shape(
            lambda k: init_vit_params(cfg, k, dtype=jnp.bfloat16),
            jax.random.PRNGKey(0),
        )
    )
    t = bench(encode, bf, cfg, make_imgs)
    print(
        f"vit frames={frames} chunk={chunk} bf16 weights: {t*1e3:.0f} ms "
        f"({frames/t:.0f} f/s, {flops/t/1e12:.0f} TFLOP/s eq)",
        flush=True,
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="both", choices=["prefill", "vit", "both"])
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    print(f"device: {jax.devices()[0]}", flush=True)
    if args.what in ("vit", "both"):
        probe_vit()
    if args.what in ("prefill", "both"):
        probe_prefill(B=args.batch)
