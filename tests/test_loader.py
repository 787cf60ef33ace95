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
