"""End-to-end inference slice on a tiny random model + synthetic video."""

import numpy as np
import jax

from trace_tpu.constants import MODAL_TOKEN_INDEX
from trace_tpu.model.config import TraceConfig
from trace_tpu.model.trace_model import init_trace_params, tokens_per_frame
from trace_tpu.runtime.pipeline import TracePipeline, expand_prompt_ids
from trace_tpu.tokenizers.text import ByteTokenizer


class TestExpandPromptIds:
    def test_video_span_and_sync(self):
        ids = [1, 5, 6, MODAL_TOKEN_INDEX["VIDEO"], 7, MODAL_TOKEN_INDEX["SYNC"]]
        out, vp = expand_prompt_ids(ids, num_video_tokens=4, text_vocab_size=100)
        assert vp == 3
        assert out.tolist() == [1, 5, 6, 0, 0, 0, 0, 7, 100]

    def test_requires_exactly_one_video(self):
        import pytest

        with pytest.raises(AssertionError):
            expand_prompt_ids([1, 2], 4, 100)


class TestPipelineE2E:
    def test_synthetic_video_event_inference(self):
        cfg = TraceConfig.tiny()
        params = init_trace_params(cfg, jax.random.PRNGKey(0))
        tok = ByteTokenizer()
        pipe = TracePipeline(params=params, config=cfg, tokenizer=tok)

        rng = np.random.default_rng(0)
        T = cfg.num_frames
        frames = rng.integers(0, 255, size=(T, 64, 48, 3), dtype=np.uint8)
        timestamps = [[float(i)] for i in range(T)]

        preds = pipe.infer_events_from_frames(
            frames, timestamps, "Find the events.",
            max_new_tokens=48, temperature=1.0,
        )
        # Random weights => content is noise, but the FSM guarantees structure:
        # decoding starts on the time head, so any finished timestamps field
        # holds floats; scores likewise.
        assert isinstance(preds.timestamps, list)
        for field in preds.timestamps:
            assert all(isinstance(v, float) for v in field)
        for field in preds.scores:
            assert all(isinstance(v, float) for v in field)
        for cap in preds.captions:
            assert isinstance(cap, str)

    def test_greedy_is_deterministic(self):
        cfg = TraceConfig.tiny()
        params = init_trace_params(cfg, jax.random.PRNGKey(1))
        tok = ByteTokenizer()
        pipe = TracePipeline(params=params, config=cfg, tokenizer=tok)

        rng = np.random.default_rng(1)
        frames = rng.integers(0, 255, size=(cfg.num_frames, 56, 56, 3), dtype=np.uint8)
        ts = [[float(i)] for i in range(cfg.num_frames)]
        a = pipe.infer_events_from_frames(frames, ts, "q", max_new_tokens=16)
        b = pipe.infer_events_from_frames(frames, ts, "q", max_new_tokens=16)
        assert a.to_dict() == b.to_dict()

    def test_prefix_length_matches_token_budget(self):
        cfg = TraceConfig.tiny()
        params = init_trace_params(cfg, jax.random.PRNGKey(2))
        tok = ByteTokenizer()
        pipe = TracePipeline(params=params, config=cfg, tokenizer=tok)
        rng = np.random.default_rng(2)
        frames = rng.integers(0, 255, size=(cfg.num_frames, 56, 56, 3), dtype=np.uint8)
        ts = [[float(i)] for i in range(cfg.num_frames)]
        prefix = pipe._prepare_prefix(frames, ts, "hello")
        n_video = cfg.num_frames * tokens_per_frame(cfg)
        assert prefix.shape[1] > n_video  # video span + prompt text
