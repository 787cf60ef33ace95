"""Package-level infer APIs: plain text inference and x_infer templates."""

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


def test_infer_text_returns_string(pipe):
    T = pipe.config.num_frames
    frames = np.random.default_rng(0).integers(0, 255, (T, 56, 56, 3), dtype=np.uint8)
    ts = [[float(i)] for i in range(T)]
    out = pipe.infer_text(frames, ts, "describe", max_new_tokens=8)
    assert isinstance(out, str)


def test_x_infer_templates(pipe, tmp_path):
    import trace_tpu

    T = pipe.config.num_frames
    video = tmp_path / "v.npy"
    np.save(video, np.random.default_rng(1).integers(0, 255, (8, 56, 56, 3), dtype=np.uint8))
    out = trace_tpu.x_infer(pipe, str(video), "What is shown?", mode="mcqa",
                            max_new_tokens=6)
    assert isinstance(out, str)
    with pytest.raises(ValueError):
        trace_tpu.x_infer(pipe, str(video), "q", mode="bogus")
