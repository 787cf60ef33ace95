"""ViT-L per-component cost decomposition (differential ablation).

528 ms/video measured vs ~290 ms of ideal MXU time — this probe finds where
the other ~240 ms lives by swapping individual components for near-free
stand-ins and differencing full-program times (dispatch latency through the
tunnel cancels in the difference):

  full        the production path (chunk 16, btd attention kernel)
  noflash     XLA einsum attention instead of the Pallas kernel
  blockq      the OLD generic flash kernel (pre-btd comparison point)
  noattn      attention -> identity (keeps QKV/O matmuls)
  noln        both LayerNorms -> identity
  nogelu      quick_gelu -> identity

    python benchmarks/vit_ablate.py [--frames 128] [--chunk 16]
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


def fence(x):
    np.asarray(jnp.sum(jax.tree.leaves(x)[0].ravel()[:8].astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--vit-int8", action="store_true",
                    help="W8A8 int8 tower (s8xs8 MXU dots). Re-test with the "
                         "btd attention: the old in-context loss was layout "
                         "overhead this kernel removed")
    args = ap.parse_args()

    from trace_tpu.model import vit as vit_mod
    from trace_tpu.model.config import VisionConfig
    from trace_tpu.model.vit import init_vit_params, vit_forward

    cfg = VisionConfig(act_quant=args.vit_int8)
    S = cfg.image_size

    def build(k):
        p = init_vit_params(cfg, k, dtype=jnp.bfloat16)
        if args.vit_int8:
            from trace_tpu.model.quantize import quantize_vision_params

            p = quantize_vision_params(p)
        return p

    shapes = jax.eval_shape(build, jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    T, chunk = args.frames, args.chunk
    frames = jnp.zeros((T, S, S, 3), jnp.bfloat16)

    def timed(tag, use_flash):
        def chunked(fr):
            def body(f):
                return vit_forward(params, cfg, f, use_flash=use_flash)
            return jax.lax.map(body, fr.reshape(-1, chunk, S, S, 3)).reshape(
                T, -1, cfg.hidden_size
            )

        f = jax.jit(chunked)
        fence(f(frames))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fence(f(frames))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{tag:10s}: {dt*1e3:6.1f} ms ({T/dt:6.1f} f/s)", flush=True)
        return dt

    import trace_tpu.kernels.flash_attention as fa

    orig_layer_norm = vit_mod.layer_norm
    orig_gelu = vit_mod.quick_gelu
    orig_flash = fa.flash_attention
    orig_btd = vit_mod._btd_attention

    variants = {}

    def base():
        return timed("full", True)

    variants["full"] = base

    def noflash():
        return timed("noflash", False)

    variants["noflash"] = noflash

    def blockq():
        # the pre-btd path: head-split transpose + generic flash kernel
        def old_path(q, k, v, config, tq):
            B, T, D = q.shape
            NH = config.num_heads
            HD = D // NH
            qh = q.reshape(B, T, NH, HD).transpose(0, 2, 1, 3)
            kh = k.reshape(B, T, NH, HD).transpose(0, 2, 1, 3)
            vh = v.reshape(B, T, NH, HD).transpose(0, 2, 1, 3)
            o = orig_flash(qh, kh, vh, causal=False)
            return o.transpose(0, 2, 1, 3).reshape(B, T, D)
        vit_mod._btd_attention = old_path
        try:
            return timed("oldflash", True)
        finally:
            vit_mod._btd_attention = orig_btd

    variants["blockq"] = blockq

    def noattn():
        def ident(q, k, v, config, tq):
            return v
        vit_mod._btd_attention = ident
        try:
            return timed("noattn", True)
        finally:
            vit_mod._btd_attention = orig_btd

    variants["noattn"] = noattn

    def noln():
        vit_mod.layer_norm = lambda x, s, b, e: x
        try:
            return timed("noln", True)
        finally:
            vit_mod.layer_norm = orig_layer_norm

    variants["noln"] = noln

    def nogelu():
        vit_mod.quick_gelu = lambda x: x
        try:
            return timed("nogelu", True)
        finally:
            vit_mod.quick_gelu = orig_gelu

    variants["nogelu"] = nogelu

    order = args.only.split(",") if args.only else list(variants)
    results = {}
    for name in order:
        try:
            results[name] = variants[name]()
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)

    if "full" in results:
        base_t = results["full"]
        for name, t in results.items():
            if name != "full":
                print(
                    f"  {name:10s} saves {1e3*(base_t - t):6.1f} ms/video",
                    flush=True,
                )


if __name__ == "__main__":
    main()
