"""Can H2D uploads overlap device compute through the tunnel?

The encode phase measures ~0.27 s/video of non-overlapped upload next to
~0.4 s of device compute.  This probe measures:

  1. upload-only throughput (N bands, producer-thread style device_put)
  2. compute-only time (a matmul loop sized ~1 s)
  3. both concurrently (uploads from a thread while compute dispatches)

If (3) ~= max(1, 2): overlap works and the serving pipeline leaves time on
the table.  If (3) ~= (1) + (2): the tunnel serializes H2D with compute
and the only encode levers are fewer bytes / faster device programs.

    python benchmarks/upload_overlap_probe.py
"""

import sys
import threading
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
    np.asarray(jnp.sum(x.ravel()[:8].astype(jnp.float32)))


def main():
    MB = 1 << 20
    n_bands = 8
    band_np = [
        np.random.default_rng(i).integers(0, 255, (128, 378, 336), np.uint8)
        for i in range(n_bands)
    ]  # ~16.2 MB each, the serving band shape (252-row 4:3 band, I420)

    # compute: bf16 matmul chain ~1 s
    w = jnp.zeros((4096, 4096), jnp.bfloat16)

    from functools import partial

    @partial(jax.jit, static_argnames=("steps",))
    def burn(x, steps):
        def body(c, _):
            return jnp.tanh(c @ w), None
        out, _ = jax.lax.scan(body, x, None, length=steps)
        return out

    x0 = jnp.ones((4096, 4096), jnp.bfloat16)
    fence(burn(x0, 8))
    # ~4 s of MXU work: 137 GF/step at ~190 TF/s
    steps = 5500

    def upload_all():
        devs = [jnp.asarray(b) for b in band_np]
        # fence the last one
        np.asarray(jnp.sum(devs[-1][:1, :1, :8].astype(jnp.float32)))
        return devs

    # 1. upload only
    t0 = time.perf_counter()
    devs = upload_all()
    t_up = time.perf_counter() - t0
    total_mb = sum(b.nbytes for b in band_np) / MB
    print(f"upload-only : {t_up:6.2f} s  ({total_mb/t_up:6.1f} MB/s)", flush=True)
    del devs

    # 2. compute only
    t0 = time.perf_counter()
    fence(burn(x0, steps))
    t_comp = time.perf_counter() - t0
    print(f"compute-only: {t_comp:6.2f} s", flush=True)

    # 3. concurrent
    out = {}
    th = threading.Thread(target=lambda: out.update(devs=upload_all()))
    t0 = time.perf_counter()
    th.start()
    fence(burn(x0, steps))
    t_comp_c = time.perf_counter() - t0
    th.join()
    t_both = time.perf_counter() - t0
    print(f"concurrent  : {t_both:6.2f} s  (compute finished at {t_comp_c:5.2f})",
          flush=True)
    ideal = max(t_up, t_comp)
    serial = t_up + t_comp
    print(f"ideal overlap {ideal:5.2f} s | serial {serial:5.2f} s -> "
          f"overlap efficiency {(serial - t_both) / max(serial - ideal, 1e-9):4.2f}",
          flush=True)


if __name__ == "__main__":
    main()
