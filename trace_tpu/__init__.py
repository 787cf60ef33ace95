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
    """Plain captioning/QA text (reference trace/__init__.py:23-75: no event
    decoding — generation starts on the text head, free-form response)."""
    from trace_tpu.video.io import load_video_frames

    frames, ts = load_video_frames(video_path, pipeline.config.num_frames)
    return pipeline.infer_text(frames, ts, instruct, **kw)


def x_infer(
    pipeline: TracePipeline,
    video_path: str,
    question: str,
    mode: str = "vanilla",
    **kw,
):
    """Instruction-templated QA (reference trace/__init__.py:78-87)."""
    if mode == "mcqa":
        instruction = (
            f"{question}\nAnswer with the option's letter from the given "
            "choices directly and only give the best option."
        )
    elif mode == "openend":
        instruction = (
            f"{question}\nAnswer the question using a single word or a short "
            "phrase with multiple words."
        )
    elif mode == "vanilla":
        instruction = question
    else:
        raise ValueError(f"unknown x_infer mode: {mode}")
    return infer(pipeline, video_path, instruction, **kw)
