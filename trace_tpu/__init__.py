"""trace_tpu: TPU-native rebuild of the TRACE temporal-grounding video LLM.

Public API parity with the reference package (/root/reference/trace/__init__.py):
  model_init(path)  -> TracePipeline (tokenizer+model+processor bundle)
  infer(...)        -> plain video QA / captioning text
  infer_events(...) -> causal event triplets {timestamps, scores, captions}

The compute path is JAX/XLA/Pallas; video decode is host-side (native C++
decoder when built, OpenCV fallback).
"""

from trace_tpu.runtime.pipeline import TracePipeline, model_init  # noqa: F401
from trace_tpu.tokenizers.event_codec import (  # noqa: F401
    EventPredictions,
    decode_event_stream,
    encode_event_stream,
)

__version__ = "0.1.0"


def infer_events(pipeline: TracePipeline, video_path: str, instruction: str, **kw):
    """Single-video causal event inference (scripts/inference/inference.py parity)."""
    return pipeline.infer_events(video_path, instruction, **kw)


def infer(pipeline: TracePipeline, video_path: str, instruct: str, **kw):
    """Plain captioning/QA: returns the first caption text (trace/__init__.py:23-75
    analog — no event structure requested, text head only)."""
    preds = pipeline.infer_events(video_path, instruct, **kw)
    if preds.captions:
        return preds.captions[0]
    return ""
