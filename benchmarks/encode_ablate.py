"""Encode-program decomposition beyond the ViT: connector, towers, splice.

encode_phase_probe measures the whole encode executable; vit_ablate the ViT
alone.  The difference (~120 ms/video pre-btd) is the connector + time
towers + combined-table gather + video-span scatter — this probe ablates
each to a near-free stand-in and differences full-program times.

    python benchmarks/encode_ablate.py
"""

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
    from trace_tpu.model import trace_model as tm
    from trace_tpu.model import connector as conn_mod
    from trace_tpu.model.config import TraceConfig
    from trace_tpu.model.trace_model import tokens_per_frame
    from trace_tpu.runtime import pipeline as pl
    from trace_tpu.runtime.generate import default_use_flash

    sys.argv = sys.argv[:1] + ["--quant", "int8"]
    from bench import zero_params

    config = TraceConfig(dtype=jnp.bfloat16, upload_format="yuv420")
    params = zero_params(config, quant="int8")
    from trace_tpu.tokenizers.text import ByteTokenizer

    pipe = pl.TracePipeline(params=params, config=config, tokenizer=ByteTokenizer())
    pipe._prepare_memory_layout()

    T = config.num_frames
    size = config.vision.image_size
    EB = 2
    n_video = T * tokens_per_frame(config)
    L = n_video + 640
    token_ids = jnp.zeros((EB, L), jnp.int32)
    video_pos = jnp.full((EB,), 4, jnp.int32)
    frames = jnp.zeros((EB, T, size, size, 3), config.dtype)
    time_ids = jnp.full((EB, T, 6), 3, jnp.int32)

    def timed(tag):
        def run():
            return pl._encode_prefix_jit(
                pipe._encode_params, config, token_ids, video_pos, frames,
                time_ids, pipe._combined, default_use_flash(),
            )

        fence(run())
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            fence(run())
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{tag:12s}: {dt*1e3:7.1f} ms (B={EB}) -> {dt/EB*1e3:6.1f} ms/video",
              flush=True)
        return dt

    results = {}
    results["full"] = timed("full")

    # connector -> near-free stand-in (keeps output shapes/dtype, removes
    # its compute); trace_model resolves build_connector at trace time
    orig_build = conn_mod.build_connector

    def fake_build(projector_type):
        init, fwd = orig_build(projector_type)

        def fake_fwd(params_, x, **kw):
            B, Tn, N, D = x.shape
            S = 8
            out_d = pipe.config.decoder.hidden_size
            m = jnp.mean(x, axis=(2, 3))  # [B, T] data dep, ~free
            return jnp.broadcast_to(
                m[..., None, None], (B, Tn, S, out_d)
            ).astype(x.dtype)

        return init, fake_fwd

    conn_mod.build_connector = fake_build
    pl._encode_prefix_jit.clear_cache()  # same avals+statics would cache-hit
    try:
        results["noconn"] = timed("noconnector")
    except Exception as e:
        print(f"noconnector: FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
    finally:
        conn_mod.build_connector = orig_build
        pl._encode_prefix_jit.clear_cache()

    base = results.get("full")
    for k, v in results.items():
        if k != "full" and base:
            print(f"  {k}: saves {1e3*(base - v):.1f} ms (B={EB})", flush=True)


if __name__ == "__main__":
    main()
