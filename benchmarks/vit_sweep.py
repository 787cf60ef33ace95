"""ViT-L encode throughput sweep: chunk size x flash x batch.

The e2e bench runs CLIP ViT-L/336 at ~50% of the v5e's bf16 peak
(~259 f/s isolated, 44 TFLOP per 128-frame video => 445 f/s at peak).
This sweep isolates which knob moves it: the lax.map chunk size (MXU
amortization vs temp footprint), the Pallas flash kernel vs XLA attention
at seq 577, and the video batch.

python benchmarks/vit_sweep.py [--frames 128]
"""

import argparse
import itertools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    np.asarray(jnp.sum(jax.tree.leaves(x)[0].ravel()[:8].astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from trace_tpu.model.config import VisionConfig
    from trace_tpu.model.vit import init_vit_params, vit_forward

    cfg = VisionConfig()
    S = cfg.image_size
    shapes = jax.eval_shape(
        lambda k: init_vit_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    T = args.frames
    frames = jnp.zeros((T, S, S, 3), jnp.bfloat16)

    def run(chunk, use_flash):
        def chunked(fr):
            def body(f):
                return vit_forward(params, cfg, f, use_flash=use_flash)
            return jax.lax.map(body, fr.reshape(-1, chunk, S, S, 3)).reshape(
                T, -1, cfg.hidden_size
            )

        f = jax.jit(chunked)
        fence(f(frames))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            fence(f(frames))
        dt = (time.perf_counter() - t0) / args.reps
        return T / dt

    for chunk, flash in itertools.product([16, 32, 64, 128], [True, False]):
        if T % chunk:
            continue
        try:
            fps = run(chunk, flash)
            tf = fps * 2 * 0.303e9 * 577 / 1e12
            print(
                f"chunk={chunk:3d} flash={int(flash)}: {fps:7.1f} f/s "
                f"(~{tf:5.1f} TF/s, {100*tf/197:.0f}% peak)",
                flush=True,
            )
        except Exception as e:
            print(f"chunk={chunk:3d} flash={int(flash)}: {type(e).__name__} {str(e)[:80]}",
                  flush=True)


if __name__ == "__main__":
    main()
