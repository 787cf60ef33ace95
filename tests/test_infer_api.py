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


def test_serve_batch_cli(pipe, tmp_path, monkeypatch):
    """The batch-serving CLI runs the corpus path end-to-end and writes
    JSONL (errors recorded per video, not swallowed)."""
    import importlib.util
    import json
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "serve_batch", "scripts/inference/serve_batch.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    T = pipe.config.num_frames
    rng = np.random.default_rng(2)
    for i in range(3):
        np.save(tmp_path / f"v{i}.npy",
                rng.integers(0, 255, (T, 56, 56, 3), dtype=np.uint8))
    (tmp_path / "bad.npy").write_bytes(b"not a numpy file")

    import trace_tpu.runtime.pipeline as pl
    monkeypatch.setattr(pl, "model_init", lambda *a, **k: pipe)

    out = tmp_path / "r.jsonl"
    monkeypatch.setattr(_sys, "argv", [
        "serve_batch", "--model-path", "ignored",
        "--videos", str(tmp_path), "--out", str(out),
        "--batch", "2", "--frames", str(T), "--max-new-tokens", "8",
    ])
    mod.main()
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 4
    errs = [l for l in lines if "error" in l]
    oks = [l for l in lines if "captions" in l]
    assert len(errs) == 1 and len(oks) == 3
