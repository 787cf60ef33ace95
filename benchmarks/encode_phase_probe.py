"""Serving encode-phase decomposition: the programs the corpus loop runs.

The in-context encode measures 143-190 f/s while the isolated ViT runs
321 f/s (vit_sweep) — nearly half the encode phase is NOT the ViT.  This
probe times the exact serving programs at encode_batch=2:

  band     _preprocess_yuv_band_jit  (I420 -> RGB -> pad canvas, per video)
  encode   _encode_prefix_jit        (patch embed -> ViT -> connector ->
                                      time towers -> combined-space splice)

    python benchmarks/encode_phase_probe.py
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
    EB = 2  # serving encode_batch at decode 32

    # --- band preprocess program (per video) ------------------------------
    H, W = 252, 336  # the 4:3 band inside a 336 canvas
    yuv = jnp.zeros((T, H * 3 // 2, W), jnp.uint8)
    canvas = jnp.zeros((size, size, 3), jnp.float32)
    t_band = None
    band_fn = pl._preprocess_yuv_band_jit
    top = jnp.int32((size - H) // 2)
    try:
        out = band_fn(yuv, top, jnp.int32(0), canvas, size)
        fence(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fence(band_fn(yuv, top, jnp.int32(0), canvas, size))
            ts.append(time.perf_counter() - t0)
        t_band = min(ts)
        print(f"band preprocess ({T}f): {t_band*1e3:.1f} ms/video", flush=True)
    except Exception as e:
        print(f"band preprocess: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)

    # --- straight-to-patches band program (serving path) ------------------
    try:
        from trace_tpu.runtime.pipeline import _preprocess_yuv_band_patches_jit

        patch = config.vision.patch_size
        canvas3 = jnp.asarray([0.45, 0.43, 0.41], jnp.float32)
        out = _preprocess_yuv_band_patches_jit(
            yuv, top, jnp.int32(0), canvas3, size, patch, out_dtype=config.dtype
        )
        fence(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fence(_preprocess_yuv_band_patches_jit(
                yuv, top, jnp.int32(0), canvas3, size, patch,
                out_dtype=config.dtype,
            ))
            ts.append(time.perf_counter() - t0)
        t_bandp = min(ts)
        print(f"band->patches ({T}f): {t_bandp*1e3:.1f} ms/video", flush=True)
    except Exception as e:
        t_bandp = None
        print(f"band->patches: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)

    # --- full encode program, PATCH input (serving path) ------------------
    n_video = T * tokens_per_frame(config)
    L = n_video + 640
    NP = (size // config.vision.patch_size) ** 2
    CPP = 3 * config.vision.patch_size ** 2
    token_ids = jnp.zeros((EB, L), jnp.int32)
    video_pos = jnp.full((EB,), 4, jnp.int32)
    patches_in = jnp.zeros((EB, T, NP, CPP), config.dtype)
    time_ids = jnp.full((EB, T, 6), 3, jnp.int32)
    from trace_tpu.runtime.generate import default_use_flash as _duf
    t0 = time.perf_counter()
    out = pl._encode_prefix_jit(
        pipe._encode_params, config, token_ids, video_pos, patches_in, time_ids,
        pipe._combined, _duf(),
    )
    fence(out)
    print(f"encode(patches) compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(pl._encode_prefix_jit(
            pipe._encode_params, config, token_ids, video_pos, patches_in,
            time_ids, pipe._combined, _duf(),
        ))
        ts.append(time.perf_counter() - t0)
    t_encp = min(ts)
    print(
        f"encode(patches) (B={EB}): {t_encp*1e3:.0f} ms -> {EB*T/t_encp:.0f} f/s "
        f"({t_encp/EB*1e3:.0f} ms/video)", flush=True,
    )
    if t_bandp is not None:
        pv = t_encp / EB + t_bandp
        print(f"device encode total (patches): {pv*1e3:.0f} ms/video "
              f"({T/pv:.0f} f/s serialized)", flush=True)

    # --- full encode program (per encode batch of EB videos) -------------
    n_video = T * tokens_per_frame(config)
    L = n_video + 640
    token_ids = jnp.zeros((EB, L), jnp.int32)
    video_pos = jnp.full((EB,), 4, jnp.int32)
    frames = jnp.zeros((EB, T, size, size, 3), config.dtype)
    time_ids = jnp.full((EB, T, 6), 3, jnp.int32)

    t0 = time.perf_counter()
    out = pl._encode_prefix_jit(
        pipe._encode_params, config, token_ids, video_pos, frames, time_ids,
        pipe._combined, default_use_flash(),
    )
    fence(out)
    print(f"encode compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(pl._encode_prefix_jit(
            pipe._encode_params, config, token_ids, video_pos, frames, time_ids,
            pipe._combined, default_use_flash(),
        ))
        ts.append(time.perf_counter() - t0)
    t_enc = min(ts)
    fps = EB * T / t_enc
    print(
        f"encode program (B={EB}, {EB*T} frames): {t_enc*1e3:.0f} ms "
        f"-> {fps:.0f} f/s ({t_enc/EB*1e3:.0f} ms/video)", flush=True,
    )
    if t_band is not None:
        per_video = t_enc / EB + t_band
        print(
            f"device encode total: {per_video*1e3:.0f} ms/video "
            f"({T/per_video:.0f} f/s serialized)", flush=True,
        )


if __name__ == "__main__":
    main()
