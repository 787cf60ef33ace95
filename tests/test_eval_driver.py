"""Eval driver plumbing + batched-vs-single inference consistency."""

import json
import os

import jax
import numpy as np
import pytest

from trace_tpu.model.config import TraceConfig
from trace_tpu.model.trace_model import init_trace_params
from trace_tpu.runtime.pipeline import TracePipeline
from trace_tpu.tokenizers.text import ByteTokenizer


@pytest.fixture(scope="module")
def pipe():
    cfg = TraceConfig.tiny()
    params = init_trace_params(cfg, jax.random.PRNGKey(0))
    return TracePipeline(params=params, config=cfg, tokenizer=ByteTokenizer())


def _frames(seed, T, h=56, w=56):
    return np.random.default_rng(seed).integers(0, 255, (T, h, w, 3), dtype=np.uint8)


class TestBatchedInference:
    def test_batch_matches_single_greedy(self, pipe):
        T = pipe.config.num_frames
        f1, f2 = _frames(1, T), _frames(2, T)
        ts = [[float(i)] for i in range(T)]
        singles = [
            pipe.infer_events_from_frames(f, ts, q, max_new_tokens=16)
            for f, q in ((f1, "what happens"), (f2, "find events please"))
        ]
        batch = pipe.infer_events_batch(
            [f1, f2], [ts, ts], ["what happens", "find events please"],
            max_new_tokens=16,
        )
        for s, b in zip(singles, batch):
            assert s.to_dict() == b.to_dict()


class TestEvalDriver:
    def test_run_and_score_tvg(self, pipe, tmp_path):
        from trace_tpu.eval.evaluate import run_vtg_eval, score_results

        T = pipe.config.num_frames
        video_dir = tmp_path / "videos"
        video_dir.mkdir()
        anno = []
        for i in range(3):
            np.save(video_dir / f"v{i}.npy", _frames(i, 8))
            anno.append({
                "image_id": f"v{i}.npy",
                "caption": f"query number {i}",
                "id": i,
                "timestamp": [0.0, 1.0],
            })
        gt_file = tmp_path / "test.caption_coco_format.json"
        with open(gt_file, "w") as f:
            json.dump({"annotations": anno}, f)

        results = run_vtg_eval(
            pipe, "tvg", anno, str(video_dir),
            num_frames=T, batch_size=2, max_new_tokens=12, progress=False,
        )
        assert len(results) == 3
        assert all("timestamps" in r for r in results)

        metrics = score_results("tvg", results, str(gt_file))
        assert "R@0.5" in metrics and "mIoU" in metrics

    def test_reformat_dvc_filters_non_pairs(self):
        from trace_tpu.eval.reformat import reformat_dvc

        out = reformat_dvc([
            {"video": "a.mp4", "id": 0,
             "timestamps": [[0.0, 1.0], [2.0]], "scores": [[1.0], [2.0]],
             "captions": ["keep", "drop"]},
        ])
        assert out == {"a.mp4": [{"caption": "keep", "timestamp": [0.0, 1.0]}]}

    def test_clip_saliency(self):
        from trace_tpu.eval.reformat import clip_saliency_scores

        scores = clip_saliency_scores([[4.0], [5.9]], [[3.0], [5.0]], duration=10.0)
        assert len(scores) == 5
        # both events land in clip max(0, int(t/2)-1): t=4 -> 1, t=5.9 -> 1
        assert scores[1] == 4.0


class TestCorpusSkipPaths:
    def test_probe_media(self, tmp_path):
        from trace_tpu.video.io import probe_media

        ok = tmp_path / "v.npy"
        np.save(ok, _frames(0, 4))
        probe_media(str(ok))  # no raise

        with pytest.raises(Exception):
            probe_media(str(tmp_path / "missing.mp4"))

        bad = tmp_path / "corrupt.mp4"
        bad.write_bytes(b"not a video at all")
        with pytest.raises(Exception):
            probe_media(str(bad))

        empty_dir = tmp_path / "frames"
        empty_dir.mkdir()
        with pytest.raises(Exception):
            probe_media(str(empty_dir))

    def test_corpus_skips_failures_one_decode_pass(self, pipe, tmp_path, monkeypatch):
        """Header-bad files are pre-filtered; stream-bad files are recorded
        and dropped; good files decode exactly once."""
        from trace_tpu.eval.evaluate import run_vtg_eval
        import trace_tpu.video.io as vio

        T = pipe.config.num_frames
        video_dir = tmp_path / "videos"
        video_dir.mkdir()
        np.save(video_dir / "good.npy", _frames(0, 8))
        (video_dir / "header_bad.mp4").write_bytes(b"junk")
        np.save(video_dir / "stream_bad.npy", _frames(1, 8))

        anno = [
            {"image_id": "good.npy", "caption": "q", "id": 0, "timestamp": [0, 1]},
            {"image_id": "header_bad.mp4", "caption": "q", "id": 1, "timestamp": [0, 1]},
            {"image_id": "stream_bad.npy", "caption": "q", "id": 2, "timestamp": [0, 1]},
        ]

        decode_calls = {}
        real_load = vio.load_video_frames

        def counting_load(path, num_frames, *a, **k):
            decode_calls[path] = decode_calls.get(path, 0) + 1
            if "stream_bad" in path:
                raise IOError("simulated mid-stream corruption")
            return real_load(path, num_frames, *a, **k)

        monkeypatch.setattr(vio, "load_video_frames", counting_load)

        results = run_vtg_eval(
            pipe, "tvg", anno, str(video_dir),
            num_frames=T, batch_size=2, max_new_tokens=8, progress=False,
        )
        assert [r["id"] for r in results] == [0]
        good_path = str(video_dir / "good.npy")
        assert decode_calls.get(good_path, 0) == 1  # exactly one decode pass
        assert not any("header_bad" in p for p in decode_calls)
