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


def test_band_upload_matches_full_frame():
    """Content-band upload must be bit-identical to uploading the whole
    pad-squared frame: outside the band the squared frame is the uniform
    fill, whose wire round-trip the device canvas reproduces exactly."""
    import jax.numpy as jnp

    from trace_tpu.model.vit import CLIP_IMAGE_MEAN
    from trace_tpu.runtime.pipeline import (
        _preprocess_yuv_band_jit,
        _preprocess_yuv_jit,
    )
    from trace_tpu.video.preprocess import (
        content_band,
        host_downscale,
        i420_fill_rgb01,
        rgb_to_i420_np,
    )

    rng = np.random.default_rng(2)
    S = 64
    for H, W in [(48, 64), (64, 40), (36, 64)]:  # landscape, portrait, 16:9-ish
        base = rng.normal(size=(2, H // 4, W // 4, 3))
        frames = np.clip(
            255 * (base - base.min()) / (base.max() - base.min()), 0, 255
        ).astype(np.uint8)
        frames = np.repeat(np.repeat(frames, 4, axis=1), 4, axis=2)

        squared = host_downscale(frames, S, "pad")
        full = np.asarray(_preprocess_yuv_jit(jnp.asarray(rgb_to_i420_np(squared))))

        top, h, left, w = content_band(H, W, S)
        assert (h, w) != (S, S)
        band = np.ascontiguousarray(squared[:, top : top + h, left : left + w])
        fill = (np.asarray(CLIP_IMAGE_MEAN) * 255).astype(np.uint8)
        got = np.asarray(_preprocess_yuv_band_jit(
            jnp.asarray(rgb_to_i420_np(band)),
            jnp.int32(top), jnp.int32(left),
            jnp.asarray(i420_fill_rgb01(fill)), S,
        ))
        np.testing.assert_allclose(got, full, atol=1e-5)


def test_content_band_geometry():
    """Band bounds: I420-aligned (even offsets, sizes % 4), inside [0, S],
    covering the content + bicubic bleed; full frame when square."""
    from trace_tpu.video.preprocess import content_band

    S = 336
    assert content_band(100, 100, S) == (0, S, 0, S)     # square: full
    for H, W in [(360, 480), (720, 1280), (1080, 1920), (480, 360),
                 (2, 10_000), (10_000, 2)]:
        top, h, left, w = content_band(H, W, S)
        assert top % 2 == 0 and left % 2 == 0
        assert h % 4 == 0 and w % 4 == 0
        assert 0 <= top and top + h <= S
        assert 0 <= left and left + w <= S
        side = max(H, W)
        if W > H:   # landscape: full width, banded rows
            assert (left, w) == (0, S)
            lo = (side - H) // 2 / (side / S)
            hi = lo + H / (side / S)
            assert top <= lo and top + h >= min(S, hi)
        elif H > W:
            assert (top, h) == (0, S)


def test_band_patches_match_pixel_path_exactly():
    """The straight-to-patches band preprocess must equal the pixel band
    preprocess + extract_patches bit-for-bit (same elementwise ops, layout
    permutation only)."""
    import jax.numpy as jnp
    import numpy as np

    from trace_tpu.model.vit import extract_patches
    from trace_tpu.runtime.pipeline import (
        _preprocess_yuv_band_jit,
        _preprocess_yuv_band_patches_jit,
    )

    rng = np.random.default_rng(3)
    T, S, p = 4, 48, 8
    h, w = 32, 48
    band = rng.integers(0, 255, (T, h * 3 // 2, w), np.uint8)
    canvas = np.asarray([0.45, 0.43, 0.41], np.float32)
    top, left = jnp.int32((S - h) // 2), jnp.int32(0)

    pixels = _preprocess_yuv_band_jit(
        jnp.asarray(band), top, left, jnp.asarray(canvas), S,
        out_dtype=jnp.bfloat16,
    )
    want = extract_patches(pixels, p)
    got = _preprocess_yuv_band_patches_jit(
        jnp.asarray(band), top, left, jnp.asarray(canvas), S, p,
        out_dtype=jnp.bfloat16,
    )
    assert got.shape == want.shape == (T, (S // p) ** 2, 3 * p * p)
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)), np.asarray(want.astype(jnp.float32))
    )


def test_host_downscale_band_matches_full_path():
    """Band-only downscale must be bit-identical to pad-square + full
    resize + band extraction, across landscape shapes (and decline
    portrait/square so callers fall back)."""
    import numpy as np

    from trace_tpu.video.preprocess import (
        content_band, host_downscale, host_downscale_band,
    )

    rng = np.random.default_rng(7)
    S = 48  # small canvas: the alignment math is size-generic
    for H, W in [(36, 48), (30, 64), (34, 60), (46, 48)]:
        frames = rng.integers(0, 255, (3, H, W, 3), np.uint8)
        got = host_downscale_band(frames, S)
        assert got is not None, (H, W)
        band, top, left = got
        t, h, l, w = content_band(H, W, S)
        assert (top, left) == (t, l)
        ref = host_downscale(frames, S, "pad")[:, t : t + h, l : l + w]
        np.testing.assert_array_equal(band, ref)
    # portrait and square fall back to the full path
    assert host_downscale_band(
        rng.integers(0, 255, (2, 64, 40, 3), np.uint8), S) is None
    assert host_downscale_band(
        rng.integers(0, 255, (2, 48, 48, 3), np.uint8), S) is None


def test_prepared_np_band_route_matches_direct():
    """prepare_sample_host_np + _upload_prepared must reproduce the direct
    defer_preprocess sample bit-for-bit on the band (serving) route, and
    must not create device buffers during host prep."""
    import jax.numpy as jnp

    from trace_tpu.model.config import TraceConfig
    from trace_tpu.runtime.pipeline import TracePipeline
    from trace_tpu.tokenizers.text import ByteTokenizer

    cfg = dataclasses.replace(TraceConfig.tiny(), upload_format="yuv420")
    # params never touched by host prep; tokenizer+config suffice
    pipe = TracePipeline(params={}, config=cfg, tokenizer=ByteTokenizer())
    T, S = cfg.num_frames, cfg.vision.image_size
    rng = np.random.default_rng(3)
    frames = np.repeat(np.repeat(
        rng.integers(0, 255, (T, (S * 3) // 8, (S * 4) // 8, 3), dtype=np.uint8),
        4, axis=1), 4, axis=2)  # 1.5*S x 2*S: forces the band downscale
    ts = [[float(i)] for i in range(T)]

    direct = pipe._prepare_sample_host(frames, ts, "q", defer_preprocess=True)
    ps = pipe.prepare_sample_host_np(frames, ts, "q")
    assert not any(
        isinstance(x, jax.Array)
        for x in jax.tree.leaves((ps.token_ids, ps.frames_spec, ps.time_ids))
    )
    up = pipe._upload_prepared(ps)

    np.testing.assert_array_equal(direct[0], up[0])   # token ids
    assert direct[1] == up[1]                          # video_pos
    np.testing.assert_array_equal(direct[3], up[3])   # time ids
    fd, fu = direct[2], up[2]
    assert isinstance(fd, tuple) and fd[0] == fu[0]    # same route tag
    for a, b in zip(fd[1:], fu[1:]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
