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
