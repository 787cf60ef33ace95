"""Two-phase corpus inference: parity with per-video calls + offload cycle."""

import numpy as np
import jax
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


def _items(pipe, n):
    T = pipe.config.num_frames
    rng = np.random.default_rng(0)
    items = [
        (
            rng.integers(0, 255, (T, 56, 56, 3), dtype=np.uint8),
            [[float(i)] for i in range(T)],
            f"question {i}",
        )
        for i in range(n)
    ]
    return items


def test_corpus_matches_per_video(pipe):
    items = _items(pipe, 3)
    singles = [
        pipe.infer_events_from_frames(f, ts, q, max_new_tokens=12)
        for f, ts, q in items
    ]
    corpus = pipe.infer_events_corpus(
        lambda i: items[i], 3, encode_batch=2, decode_batch=2, max_new_tokens=12,
    )
    for s, c in zip(singles, corpus):
        assert s.to_dict() == c.to_dict()


def test_vision_offload_roundtrip(pipe):
    items = _items(pipe, 2)
    a = pipe.infer_events_corpus(lambda i: items[i], 2, max_new_tokens=8)
    # vision tower was offloaded at the end of the corpus run; the next
    # single-video call must transparently restore it
    b = pipe.infer_events_from_frames(*items[0], max_new_tokens=8)
    assert a[0].to_dict() == b.to_dict()

    # constrained corpus decode also runs
    c = pipe.infer_events_corpus(
        lambda i: items[i], 2, max_new_tokens=8, constrain_time=True
    )
    assert len(c) == 2
