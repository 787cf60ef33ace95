"""Aux utilities: scene detection, anyres tiling, image-as-video, sampling."""

import numpy as np

from trace_tpu.video.anyres import (
    get_anyres_image_grid_shape,
    process_anyres_image,
    select_best_resolution,
)
from trace_tpu.video.io import load_image_as_video
from trace_tpu.video.sampling import frame_timestamps, sample_frame_indices
from trace_tpu.video.scene import detect_scenes, merge_scenes


class TestSceneDetection:
    def test_detects_hard_cut(self):
        dark = np.zeros((30, 32, 32, 3), np.uint8)
        bright = np.full((30, 32, 32, 3), 250, np.uint8)
        frames = np.concatenate([dark, bright])
        scenes = detect_scenes(frames, fps=30.0, threshold=27.0, min_scene_len=5)
        assert len(scenes) == 2
        assert abs(scenes[0][1] - 1.0) < 0.05  # cut at ~1 s

    def test_merge_to_cap(self):
        scenes = [(float(i), float(i + 1)) for i in range(20)]
        merged = merge_scenes(scenes, max_scenes=5)
        assert len(merged) == 5
        assert merged[0][0] == 0.0 and merged[-1][1] == 20.0


class TestAnyRes:
    def test_best_resolution_square(self):
        cands = [(672, 672), (336, 672), (336, 1008)]
        assert select_best_resolution((640, 640), cands) == (672, 672)

    def test_grid_shape(self):
        cols, rows = get_anyres_image_grid_shape((672, 672), 336)
        assert (cols, rows) == (2, 2)

    def test_tiling_count(self):
        img = np.zeros((672, 672, 3), np.uint8)
        tiles = process_anyres_image(img, 336)
        assert len(tiles) == 1 + 4  # global view + 2x2 grid
        assert all(t.shape == (336, 336, 3) for t in tiles)


class TestImageAsVideo:
    def test_replication(self, tmp_path):
        from PIL import Image

        p = tmp_path / "im.png"
        Image.fromarray(np.full((20, 30, 3), 7, np.uint8)).save(p)
        frames, ts = load_image_as_video(str(p), num_frames=4)
        assert frames.shape == (4, 20, 30, 3)
        assert ts == [[0.0]] * 4


class TestSampling:
    def test_fps_scheme(self):
        idx = sample_frame_indices(300, 8, "fps", fps=30.0)
        assert (np.diff(idx) == 30).all()

    def test_rand_scheme_within_intervals(self):
        rng = np.random.default_rng(0)
        idx = sample_frame_indices(100, 8, "rand", rng=rng)
        assert len(idx) == 8
        assert all(0 <= i < 100 for i in idx)
        assert (np.diff(idx) >= 0).all()

    def test_too_long_video_raises(self):
        import pytest

        with pytest.raises(ValueError):
            frame_timestamps([0, 500000], fps=1.0)
