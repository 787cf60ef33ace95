"""Frame preprocessing: pad-to-square + resize + CLIP normalization.

The reference does this on host with PIL + CLIPImageProcessor per frame
(expand2square + processor.preprocess, mm_utils.py:259-270, 459-464).  Here
the whole transform is a jittable device function so XLA fuses it with (or
ahead of) the ViT patch-embed — raw uint8 frames are the only host->device
transfer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from trace_tpu.model.vit import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD


def host_downscale(
    frames: np.ndarray, image_size: int = 336, aspect_ratio: str = "pad"
) -> np.ndarray:
    """Host-side pad-square + resize to [T, S, S, 3] uint8 (cv2 bicubic).

    Used when the host->device link is the bottleneck (the tunneled bench
    setup): shrinking 480p frames to 336^2 before upload cuts transferred
    bytes ~35%; the device then only normalizes.  Numerically this matches
    the reference more closely than the device path (the reference resizes
    on host with PIL, mm_utils.py:459-464).
    """
    import cv2

    T, H, W, C = frames.shape
    if aspect_ratio == "pad" and H != W:
        fill = (CLIP_IMAGE_MEAN * 255).astype(np.uint8)
        frames = pad_to_square_np(frames, fill)
    out = np.empty((T, image_size, image_size, 3), np.uint8)
    for i in range(T):
        out[i] = cv2.resize(
            frames[i], (image_size, image_size), interpolation=cv2.INTER_CUBIC
        )
    return out


def rgb_to_i420_np(frames: np.ndarray) -> np.ndarray:
    """Host: uint8 RGB [T, H, W, 3] -> planar I420 [T, H*3//2, W] uint8.

    Halves host->device bytes (4:2:0 chroma subsampling — the format H.264
    sources are already stored in, so for decoded video this loses nothing
    the source had)."""
    import cv2

    T, H, W, _ = frames.shape
    out = np.empty((T, H * 3 // 2, W), np.uint8)
    for i in range(T):
        out[i] = cv2.cvtColor(frames[i], cv2.COLOR_RGB2YUV_I420)
    return out


def i420_to_rgb(yuv: jax.Array) -> jax.Array:
    """Device: planar I420 [T, H*3//2, W] uint8 -> RGB float [T, H, W, 3] in
    [0, 255] (BT.601 full-range inverse of cv2's RGB2YUV_I420)."""
    T, H15, W = yuv.shape
    H = H15 * 2 // 3
    y = yuv[:, :H, :].astype(jnp.float32)
    # planar quarter-size U then V, each packed as H/4 rows of width W
    u = yuv[:, H : H + H // 4, :].reshape(T, H // 2, W // 2)
    v = yuv[:, H + H // 4 :, :].reshape(T, H // 2, W // 2)

    # upsample chroma 2x (nearest)
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2).astype(jnp.float32) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2).astype(jnp.float32) - 128.0

    # BT.601 studio swing (what cv2's I420 conversions use)
    yf = 1.164 * (y - 16.0)
    r = yf + 1.596 * v
    g = yf - 0.391 * u - 0.813 * v
    b = yf + 2.018 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def pad_to_square_np(frames: np.ndarray, fill: np.ndarray) -> np.ndarray:
    """Host fallback of expand2square (mm_utils.py:259-270): center the frame
    on a square canvas filled with the CLIP mean color."""
    T, H, W, C = frames.shape
    if H == W:
        return frames
    side = max(H, W)
    canvas = np.empty((T, side, side, C), frames.dtype)
    canvas[:] = fill
    top, left = (side - H) // 2, (side - W) // 2
    canvas[:, top : top + H, left : left + W] = frames
    return canvas


def preprocess_frames(
    frames: jax.Array,  # [T, H, W, 3] uint8 or float in [0, 255]
    image_size: int = 336,
    *,
    aspect_ratio: str = "pad",
    normalize: bool = True,
) -> jax.Array:
    """uint8 frames -> CLIP-ready [T, S, S, 3] float32, fully on device.

    'pad' centers the frame on a square mean-color canvas before the resize
    (matching the production image_aspect_ratio='pad'); otherwise the frame is
    resized directly (aspect distortion, like CLIPImageProcessor on
    pre-squared inputs).
    """
    T, H, W, C = frames.shape
    x = frames.astype(jnp.float32) / 255.0

    if aspect_ratio == "pad" and H != W:
        side = max(H, W)
        mean = jnp.asarray(CLIP_IMAGE_MEAN, jnp.float32)
        canvas = jnp.broadcast_to(mean, (T, side, side, C))
        top, left = (side - H) // 2, (side - W) // 2
        x = jax.lax.dynamic_update_slice(canvas, x, (0, top, left, 0))

    if x.shape[1] != image_size or x.shape[2] != image_size:
        x = jax.image.resize(
            x, (T, image_size, image_size, C), method="bicubic", antialias=True
        )
        x = jnp.clip(x, 0.0, 1.0)

    if normalize:
        mean = jnp.asarray(CLIP_IMAGE_MEAN, jnp.float32)
        std = jnp.asarray(CLIP_IMAGE_STD, jnp.float32)
        x = (x - mean) / std
    return x
