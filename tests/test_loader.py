"""Prefetch loader: ordering, shapes, drop_last."""

import numpy as np

from trace_tpu.data.loader import PrefetchLoader


class _FakeDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return {
            "frames_u8": np.full((2, 4, 4, 3), i, np.uint8),
            "frame_time_ids": np.zeros((2, 6), np.int32),
            "token_ids": np.full((8,), i, np.int32),
            "labels": np.zeros((8,), np.int32),
            "time_labels": np.zeros((8,), np.int32),
            "score_labels": np.zeros((8,), np.int32),
            "attn_mask": np.ones((8,), bool),
            "video_pos": np.int32(i),
        }


def test_batches_and_order():
    ds = _FakeDataset()
    loader = PrefetchLoader(ds, batch_size=3, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3  # drop_last: 10 // 3
    seen = [int(v) for b in batches for v in b["video_pos"]]
    assert seen == list(range(9))
    assert batches[0]["frames_u8"].shape == (3, 2, 4, 4, 3)


def test_keep_last():
    loader = PrefetchLoader(_FakeDataset(), batch_size=3, drop_last=False)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[-1]["video_pos"].shape[0] == 1


class TestNativeDecoder:
    def _synth(self, tmp_path, w=640, h=360, n=12):
        import cv2

        p = str(tmp_path / "synth.mp4")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
        if not wr.isOpened():
            import pytest

            pytest.skip("no mp4 encoder available")
        for i in range(n):
            wr.write(np.full((h, w, 3), i * 20, np.uint8))
        wr.release()
        return p

    def test_max_side_prescaled_decode(self, tmp_path):
        """max_side decodes aspect-preserved, capped, even dims — in the
        native swscale pass (no full-res host materialization)."""
        import pytest

        try:
            from trace_tpu.native import videodec
        except Exception:
            pytest.skip("native decoder unavailable")
        p = self._synth(tmp_path)
        try:
            full = videodec.read_frames(p, [0, 5, 11])
        except OSError:
            pytest.skip("libav cannot open cv2-written mp4 here")
        sc = videodec.read_frames(p, [0, 5, 11], max_side=320)
        assert full.shape == (3, 360, 640, 3)
        assert sc.shape == (3, 180, 320, 3)
        # constant-color frames survive any resampler exactly-ish
        assert abs(int(full[1, 5, 5, 0]) - int(sc[1, 5, 5, 0])) <= 2

        from trace_tpu.video.io import load_video_frames

        fr, ts = load_video_frames(p, 4, max_side=320)
        assert fr.shape[1:] == (180, 320, 3) and len(ts) == 4
