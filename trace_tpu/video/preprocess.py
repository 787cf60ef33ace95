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


def host_downscale_band(
    frames: np.ndarray, image_size: int = 336
) -> tuple[np.ndarray, int, int] | None:
    """Pad-square + bicubic resize computing ONLY the content band.

    Returns (band_u8 [T, h, w, 3], top, left) with (top, h, left, w) =
    ``content_band(H, W, S)`` — bit-identical (tested) to
    ``host_downscale(frames, S)[:, top:top+h, left:left+w]`` without ever
    materializing the [T, side, side, 3] padded canvas or the full output
    canvas.  On the single-core bench host the canvas broadcast + full
    resize + band-extraction copy were most of the per-video host cost
    (the producer-thread ceiling, BENCH_NOTES round 4).

    Exactness argument: the band's input start row ``bi`` is aligned to
    the output grid (``bi * S % side == 0``), so cv2's sampling phases
    ``(dst + 0.5) * side/S - 0.5`` inside the band match the full-canvas
    resize; and every returned output row's bicubic support (2 input px)
    lies inside the band input, which reproduces pad fill rows exactly.

    Returns None for shapes the fast path doesn't cover (portrait/square)
    — callers fall back to :func:`host_downscale`.
    """
    import math

    import cv2

    T, H, W, C = frames.shape
    S = image_size
    if not (H < W):  # landscape-only fast path (the dominant video shape)
        return None
    side = W
    top_out, h, left_out, w = content_band(H, W, S)
    assert (left_out, w) == (0, S)
    fill = (CLIP_IMAGE_MEAN * 255).astype(np.uint8)
    pad0 = (side - H) // 2
    p = side // math.gcd(side, S)  # input rows per aligned output block
    # input rows whose bicubic support the output band rows [top, top+h) read
    c0 = math.floor((top_out + 0.5) * side / S - 0.5) - 1
    c1 = math.floor((top_out + h - 0.5) * side / S - 0.5) + 2
    bi = max(0, (c0 // p) * p)
    be = min(side, ((c1 + p) // p) * p)
    bh_in = be - bi
    bh_out = bh_in * S // side
    bo = bi * S // side
    assert bo <= top_out and bo + bh_out >= top_out + h, (bi, be, top_out, h)
    a0, a1 = max(bi, pad0), min(be, pad0 + H)  # content rows inside the band
    band_in = np.empty((bh_in, W, C), np.uint8)
    out = np.empty((T, h, S, C), np.uint8)
    tmp = np.empty((bh_out, S, C), np.uint8)
    r0 = top_out - bo
    if a0 > bi:  # fill margins are frame-invariant
        band_in[: a0 - bi] = fill
    if be > a1:
        band_in[a1 - bi :] = fill
    for i in range(T):
        band_in[a0 - bi : a1 - bi] = frames[i, a0 - pad0 : a1 - pad0]
        cv2.resize(band_in, (S, bh_out), dst=tmp, interpolation=cv2.INTER_CUBIC)
        out[i] = tmp[r0 : r0 + h]
    return out, top_out, 0


def content_band(H: int, W: int, S: int) -> tuple:
    """Rows/cols of the pad-squared+resized S x S frame that can differ from
    the uniform fill color: the resized content plus the bicubic bleed into
    the first pad rows.  Everything outside is EXACTLY the fill color
    (bicubic of a constant is that constant), so only the band needs to
    cross the host->device link; the device reconstructs the rest.

    Returns (top, h, left, w) aligned for I420 (even offsets, sizes % 4),
    covering the full frame when it is square.
    """
    side = max(H, W)
    scale = side / S  # input px per output px
    # cv2 bicubic support radius is 2 input px; an output px whose support
    # lies fully inside the uniform pad equals the fill exactly
    margin = int(np.ceil(2.0 / scale)) + 2

    def band(extent_in: int, offset_in: int):
        lo = int(np.floor(offset_in / scale)) - margin
        hi = int(np.ceil((offset_in + extent_in) / scale)) + margin
        lo, hi = max(0, lo), min(S, hi)
        lo -= lo % 2                      # chroma-pair alignment
        n = hi - lo
        n += (-n) % 4                     # I420 plane packing wants % 4
        if lo + n > S:
            lo = S - n
        return lo, n

    if W > H:
        top, h = band(H, (side - H) // 2)
        return top, h, 0, S
    if H > W:
        left, w = band(W, (side - W) // 2)
        return 0, S, left, w
    return 0, S, 0, S


def i420_fill_rgb01(fill: np.ndarray) -> np.ndarray:
    """The fill color's RGB in [0, 1] after the I420 wire round-trip — what
    pad pixels come out as on the full-frame yuv420 path.  The device-side
    canvas uses this so band reconstruction is bit-identical to uploading
    the whole squared frame."""
    import cv2

    patch = np.empty((4, 4, 3), np.uint8)
    patch[:] = fill
    yuv = cv2.cvtColor(patch, cv2.COLOR_RGB2YUV_I420)  # [6, 4]: Y*4, U, V
    y, u, v = float(yuv[0, 0]), float(yuv[4, 0]) - 128.0, float(yuv[5, 0]) - 128.0
    yf = 1.164 * (y - 16.0)
    rgb = np.asarray(
        [yf + 1.596 * v, yf - 0.391 * u - 0.813 * v, yf + 2.018 * u], np.float32
    )
    return np.clip(rgb, 0.0, 255.0) / 255.0


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


def i420_to_planes(yuv: jax.Array) -> tuple:
    """Device: planar I420 [T, H*3//2, W] uint8 -> (r, g, b) fp32 planes
    [T, H, W] in [0, 255] (BT.601 studio swing, inverse of cv2's
    RGB2YUV_I420).  Kept PLANAR so downstream patch extraction never
    materializes a channels-minor [H, W, 3] tensor (3-wide lane dim =
    pathological TPU layout; measured ~60 ms/video in the band program)."""
    T, H15, W = yuv.shape
    H = H15 * 2 // 3
    y = yuv[:, :H, :].astype(jnp.float32)
    # planar quarter-size U then V, each packed as H/4 rows of width W
    u = yuv[:, H : H + H // 4, :].reshape(T, H // 2, W // 2)
    v = yuv[:, H + H // 4 :, :].reshape(T, H // 2, W // 2)

    # upsample chroma 2x (nearest)
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2).astype(jnp.float32) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2).astype(jnp.float32) - 128.0

    yf = 1.164 * (y - 16.0)
    r = yf + 1.596 * v
    g = yf - 0.391 * u - 0.813 * v
    b = yf + 2.018 * u
    clip = lambda x: jnp.clip(x, 0.0, 255.0)
    return clip(r), clip(g), clip(b)


def i420_to_rgb(yuv: jax.Array) -> jax.Array:
    """Device: planar I420 -> RGB float [T, H, W, 3] in [0, 255]."""
    r, g, b = i420_to_planes(yuv)
    return jnp.stack([r, g, b], axis=-1)


def patchify_plane(x: jax.Array, patch: int) -> jax.Array:
    """[T, S, S] single-channel plane -> [T, n_patches, patch*patch]
    (row-major patch grid, matching extract_patches' per-channel block)."""
    T, H, W = x.shape
    gh, gw = H // patch, W // patch
    x = x.reshape(T, gh, patch, gw, patch)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(T, gh * gw, patch * patch)


def i420_band_to_patches(
    yuv_band: jax.Array,     # [T, h*3//2, w] uint8 content band
    top, left,               # band placement on the S x S canvas
    canvas_rgb01: jax.Array, # [3] fill color (wire round-trip value, 0..1)
    size: int,
    patch: int,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Content-band I420 -> CLIP-normalized ViT patches [T, N, 3*p*p].

    Elementwise math identical to _preprocess_yuv_band_jit + the ViT's
    extract_patches (same ops per element, channel-major patch rows), but
    every intermediate stays planar [T, S, S] — no channels-minor tensor.
    """
    from trace_tpu.model.vit import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    planes = i420_to_planes(yuv_band)
    T = yuv_band.shape[0]
    out = []
    for ci, plane in enumerate(planes):
        mean = jnp.float32(CLIP_IMAGE_MEAN[ci])
        std = jnp.float32(CLIP_IMAGE_STD[ci])
        band = ((plane / 255.0 - mean) / std).astype(out_dtype)
        fill = ((canvas_rgb01[ci] - mean) / std).astype(out_dtype)
        canvas = jnp.broadcast_to(fill, (T, size, size))
        canvas = jax.lax.dynamic_update_slice(
            canvas, band, (jnp.int32(0), top, left)
        )
        out.append(patchify_plane(canvas, patch))
    return jnp.concatenate(out, axis=-1)


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
