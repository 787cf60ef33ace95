"""Component microbenchmark: preprocess / ViT / connector timings on-chip.

Run after changing the vision path; identifies where encode time goes
(bench.py showed ~50 frames/s end-to-end encode — ~9% MXU utilization).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    """block_until_ready is unreliable over the axon relay; a host fetch of a
    reduction forces real completion."""
    leaves = jax.tree.leaves(out)
    np.asarray(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(fn, *args, n=5):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        _force(out)
    return (time.perf_counter() - t0) / n


def main():
    from trace_tpu.model.config import TraceConfig, VisionConfig
    from trace_tpu.model.vit import init_vit_params, vit_forward
    from trace_tpu.model.connector import build_connector
    from trace_tpu.video.preprocess import preprocess_frames

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = VisionConfig()
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16),
        jax.eval_shape(lambda k: init_vit_params(cfg, k), jax.random.PRNGKey(0)),
    )

    rng = np.random.default_rng(0)
    frames_u8 = jnp.asarray(rng.integers(0, 255, (T, 360, 480, 3), dtype=np.uint8))

    pre = jax.jit(lambda f: preprocess_frames(f, 336).astype(jnp.bfloat16))
    t_pre = timeit(pre, frames_u8)
    print(f"preprocess {T}f: {t_pre*1e3:.1f} ms ({T/t_pre:.0f} f/s)")

    x = pre(frames_u8)
    for chunk in (16, 32, 64, 128):
        if T % chunk:
            continue
        for flash in (False, True):
            def run(xx, c=chunk, fl=flash):
                cs = xx.reshape(T // c, c, 336, 336, 3)
                return jax.lax.map(
                    lambda f: vit_forward(params, cfg, f, use_flash=fl), cs
                )
            try:
                t = timeit(jax.jit(run), x)
                flops = 2 * 0.30e9 * 577 * T  # ~params*tokens*2
                print(f"vit chunk={chunk} flash={flash}: {t*1e3:.0f} ms "
                      f"({T/t:.0f} f/s, {flops/t/1e12:.0f} TFLOP/s)")
            except Exception as e:
                print(f"vit chunk={chunk} flash={flash}: FAIL {str(e)[:80]}")

    init, fwd = build_connector("spatial_slot")
    cp = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16),
        jax.eval_shape(lambda k: init(k, 1024, 4096, num_slots=8), jax.random.PRNGKey(0)),
    )
    feats = jnp.zeros((1, T, 576, 1024), jnp.bfloat16)
    t_conn = timeit(jax.jit(fwd), cp, feats)
    print(f"connector: {t_conn*1e3:.1f} ms")


if __name__ == "__main__":
    main()
