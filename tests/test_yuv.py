"""I420 wire-format: device conversion matches cv2; pipeline accepts it."""

import dataclasses

import jax
import numpy as np

from trace_tpu.video.preprocess import i420_to_rgb, rgb_to_i420_np


def test_roundtrip_matches_cv2():
    import cv2

    rng = np.random.default_rng(0)
    # smooth-ish content (chroma subsampling on noise is not meaningful)
    base = rng.normal(size=(1, 12, 16, 3))
    img = np.clip(
        255 * (base - base.min()) / (base.max() - base.min()), 0, 255
    ).astype(np.uint8)
    img = np.repeat(np.repeat(img, 4, axis=1), 4, axis=2)  # [1, 48, 64, 3]

    yuv = rgb_to_i420_np(img)
    mine = np.asarray(i420_to_rgb(yuv))
    ref = cv2.cvtColor(yuv[0], cv2.COLOR_YUV2RGB_I420).astype(np.float32)[None]
    assert np.abs(mine - ref).max() < 1.0  # rounding only


def test_pipeline_yuv_mode_runs():
    from trace_tpu.model.config import TraceConfig
    from trace_tpu.model.trace_model import init_trace_params
    from trace_tpu.runtime.pipeline import TracePipeline
    from trace_tpu.tokenizers.text import ByteTokenizer

    cfg = dataclasses.replace(TraceConfig.tiny(), upload_format="yuv420")
    params = init_trace_params(cfg, jax.random.PRNGKey(0))
    pipe = TracePipeline(params=params, config=cfg, tokenizer=ByteTokenizer())
    T, S = cfg.num_frames, cfg.vision.image_size
    frames = np.random.default_rng(1).integers(0, 255, (T, S, S, 3), dtype=np.uint8)
    ts = [[float(i)] for i in range(T)]
    preds = pipe.infer_events_from_frames(frames, ts, "q", max_new_tokens=8)
    assert preds is not None
