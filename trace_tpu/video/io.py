"""Video decode front end: batched random-access frame extraction.

Replaces the reference's decord/imageio/moviepy stack (process_video,
/root/reference/trace/mm_utils.py:379-471) with a pluggable reader registry:

* native C++ libavformat/libavcodec decoder (trace_tpu/native/videodec) when
  built — the decord-class fast path;
* OpenCV (FFmpeg-backed) fallback for mp4/webm/mkv;
* imageio for gif;
* image directories and .npy tensors for tests/synthetic data.

All readers return (frames uint8 [T, H, W, 3] RGB, timestamps [[sec], ...]).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from trace_tpu.constants import NUM_FRAMES
from trace_tpu.video.sampling import cap_to_max_frames, frame_timestamps, sample_frame_indices

Frames = np.ndarray
Timestamps = list


def _read_gif(path: str, indices: np.ndarray, fps: float) -> Frames:
    import imageio

    reader = imageio.get_reader(path)
    wanted = set(int(i) for i in indices)
    frames = [np.asarray(f)[..., :3] for i, f in enumerate(reader) if i in wanted]
    return np.stack(frames)


def _read_cv2(path: str, indices: np.ndarray) -> Frames:
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    frames = []
    last_pos = -2
    for idx in indices:
        idx = int(idx)
        if idx != last_pos + 1:
            cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
        ok, frame = cap.read()
        if not ok:
            raise IOError(f"failed to read frame {idx} of {path}")
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        last_pos = idx
    cap.release()
    return np.stack(frames)


def _probe_cv2(path: str) -> Tuple[int, float]:
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    duration = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = float(cap.get(cv2.CAP_PROP_FPS)) or 30.0
    cap.release()
    return duration, fps


def probe(path: str) -> Tuple[int, float]:
    """(frame_count, fps) of a video file."""
    return _probe_cv2(path)


def probe_media(path: str) -> None:
    """Cheap openability check: container header only, NO frame decode.

    Raises on missing / unreadable media. Used by eval drivers to pre-filter
    corpora without a second full decode pass (the reference's eval loop
    decodes each video exactly once; a probe keeps that property)."""
    if os.path.isdir(path):
        if not any(
            f.lower().endswith((".jpg", ".jpeg", ".png")) for f in os.listdir(path)
        ):
            raise IOError(f"no frame images in directory: {path}")
        return
    if not os.path.exists(path):
        raise IOError(f"no such file: {path}")
    if path.endswith(".npy") or path.lower().endswith(
        (".jpg", ".jpeg", ".png", ".bmp", ".webp")
    ):
        return  # existence is enough; decode failures surface in the loader
    if path.endswith(".gif"):
        import imageio

        imageio.get_reader(path).close()
        return
    count, _fps = _probe_cv2(path)
    if count <= 0:
        raise IOError(f"no frames reported by container: {path}")


def read_frames_at(
    path: str, indices: np.ndarray, use_native: bool = True,
    max_side: int | None = None,
) -> Frames:
    """Random-access decode of specific frame indices (native fast path,
    OpenCV fallback).  max_side caps the decoded resolution in the native
    decoder's swscale pass (one resample; HD never hits host RAM)."""
    if use_native:
        try:
            from trace_tpu.native import videodec

            return videodec.read_frames(path, indices, max_side=max_side)
        except (ImportError, OSError):
            pass
    return _read_cv2(path, indices)


def load_video_frames(
    path: str,
    num_frames: int = NUM_FRAMES,
    sample_scheme: str = "uniform",
    *,
    rng: Optional[np.random.Generator] = None,
    use_native: bool = True,
    max_side: int | None = None,
) -> Tuple[Frames, Timestamps]:
    """Decode + sample frames from a video file / gif / image dir / npy.

    Mirrors process_video's container routing (mm_utils.py:400-448) and the
    MAX_FRAMES cap, returning per-frame timestamps in the reference's nested
    shape.
    """
    if os.path.isdir(path):
        return _load_image_dir(path, num_frames)
    if path.endswith(".npy"):
        return _load_npy(path, num_frames)
    if path.lower().endswith((".jpg", ".jpeg", ".png", ".bmp", ".webp")):
        return load_image_as_video(path, num_frames)

    if path.endswith(".gif"):
        import imageio

        reader = imageio.get_reader(path)
        duration = reader.get_length()
        if not np.isfinite(duration) or duration <= 0:
            duration = sum(1 for _ in imageio.get_reader(path))
        fps = 10.0  # the reference hard-codes gif fps=10 (mm_utils.py:406)
        indices = sample_frame_indices(duration, num_frames, sample_scheme, fps=fps, rng=rng)
        indices = cap_to_max_frames(indices, duration)
        frames = _read_gif(path, indices, fps)
        return frames, frame_timestamps(indices, fps)

    duration, fps = _probe_cv2(path)
    indices = sample_frame_indices(duration, num_frames, sample_scheme, fps=fps, rng=rng)
    indices = cap_to_max_frames(indices, duration)

    if use_native:
        try:
            from trace_tpu.native import videodec

            frames = videodec.read_frames(path, indices, max_side=max_side)
            return frames, frame_timestamps(indices, fps)
        except (ImportError, OSError):
            pass
    frames = _read_cv2(path, indices)
    return frames, frame_timestamps(indices, fps)


def load_image_as_video(path: str, num_frames: int = NUM_FRAMES) -> Tuple[Frames, Timestamps]:
    """Image modality: replicate the image across the frame axis with zero
    timestamps (reference: trace_arch.py:221 expand, train_mt.py:838
    video_timestamps=[[0]]*num_frames)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"))
    frames = np.broadcast_to(img, (num_frames,) + img.shape).copy()
    return frames, [[0.0]] * num_frames


def _load_image_dir(path: str, num_frames: int) -> Tuple[Frames, Timestamps]:
    """A directory of ordered frame images (MVBench 'frame' reader style,
    reference mvbench/evaluate.py:268-289)."""
    from PIL import Image

    files = sorted(
        f for f in os.listdir(path) if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    duration = len(files)
    fps = 3.0  # MVBench frame dirs are 3 fps (mvbench/evaluate.py:270)
    indices = sample_frame_indices(duration, num_frames, "uniform")
    indices = cap_to_max_frames(indices, duration)
    frames = np.stack([
        np.asarray(Image.open(os.path.join(path, files[int(i)])).convert("RGB"))
        for i in indices
    ])
    return frames, frame_timestamps(indices, fps)


def _load_npy(path: str, num_frames: int) -> Tuple[Frames, Timestamps]:
    """Pre-decoded uint8 [T, H, W, 3] tensor (tests / cached decode)."""
    video = np.load(path)
    duration = video.shape[0]
    fps = 30.0
    indices = sample_frame_indices(duration, num_frames, "uniform")
    indices = cap_to_max_frames(indices, duration)
    return video[indices], frame_timestamps(indices, fps)
