"""End-to-end VTG inference throughput benchmark (one chip).

Workload = the reference's Youcook2 dense-captioning eval unit
(trace/eval/evaluate.py:298-422): one 128-frame video -> CLIP ViT-L/336
encode -> spatial_slot connector -> ~1930-token prefix splice -> greedy
FSM decode of N event tokens on Mistral-7B, bf16.

Weights are zeros (throughput is weight-independent; zero logits give a
deterministic never-EOS decode so every run emits exactly --decode-tokens).

Prints ONE json line:
  {"metric": "videos/sec/chip", "value": ..., "unit": "videos/s",
   "vs_baseline": ..., "extra": {...}}

Baseline: the reference publishes no throughput numbers (SURVEY.md §6).  The
V100 eval-loop estimate is derived in BENCH_NOTES.md from the reference's
FLOP budget (~75 TFLOPs/video) at a measured-class 20% HF-eval utilization of
a 125-TFLOP V100: ~0.33 videos/s.  vs_baseline = value / 0.33.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

V100_BASELINE_VIDEOS_PER_SEC = 0.33


def zero_params(config):
    import jax
    import jax.numpy as jnp
    from trace_tpu.model.trace_model import init_trace_params

    shapes = jax.eval_shape(
        lambda k: init_trace_params(config, k, dtype=config.dtype),
        jax.random.PRNGKey(0),
    )
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--decode-tokens", type=int, default=256)
    ap.add_argument("--videos", type=int, default=2, help="timed batches")
    ap.add_argument("--batch", type=int, default=4, help="videos per batch")
    ap.add_argument("--small", action="store_true", help="tiny config smoke run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from trace_tpu.model.config import DecoderConfig, TraceConfig, VisionConfig
    from trace_tpu.model.trace_model import tokens_per_frame
    from trace_tpu.runtime.pipeline import TracePipeline
    from trace_tpu.tokenizers.text import ByteTokenizer

    if args.small:
        config = TraceConfig.tiny()
        args.frames = config.num_frames
        args.decode_tokens = min(args.decode_tokens, 32)
    else:
        config = TraceConfig(
            decoder=DecoderConfig(),       # Mistral-7B
            vision=VisionConfig(),          # CLIP ViT-L/14-336
            num_frames=args.frames,
            dtype=jnp.bfloat16,
        )

    dev = jax.devices()[0]
    params = zero_params(config)
    tok = ByteTokenizer()
    pipe = TracePipeline(params=params, config=config, tokenizer=tok)

    rng = np.random.default_rng(0)
    H = max(config.vision.image_size, 360) if not args.small else 64
    W = int(H * 4 / 3)
    instruction = (
        "Localize a series of activity events in the video, output the start "
        "and end timestamp for each event, and describe each event with sentences."
    )

    B = args.batch

    def one_batch(seed: int):
        frames = [
            rng.integers(0, 255, size=(args.frames, H, W, 3), dtype=np.uint8)
            for _ in range(B)
        ]
        ts = [[[round(i * 1.7, 1)] for i in range(args.frames)]] * B
        t0 = time.perf_counter()
        preds = pipe.infer_events_batch(
            frames, ts, [instruction] * B,
            max_new_tokens=args.decode_tokens, temperature=0.0, seed=seed,
        )
        return time.perf_counter() - t0, preds

    # warmup / compile
    compile_t, _ = one_batch(0)

    times = []
    for i in range(args.videos):
        dt, _ = one_batch(i + 1)
        times.append(dt)

    per_batch = float(np.median(times))
    per_video = per_batch / B
    videos_per_sec = B / per_batch

    # component timings (per batch)
    frames = [
        rng.integers(0, 255, size=(args.frames, H, W, 3), dtype=np.uint8)
        for _ in range(B)
    ]
    ts = [[[round(i * 1.7, 1)] for i in range(args.frames)]] * B
    t0 = time.perf_counter()
    prefix, _mask = pipe._prepare_prefix_batch(frames, ts, [instruction] * B)
    prefix.block_until_ready()
    encode_time = time.perf_counter() - t0
    vit_fps = B * args.frames / encode_time
    decode_time = per_batch - encode_time
    decode_tps = B * args.decode_tokens / max(decode_time, 1e-9)

    result = {
        "metric": "videos/sec/chip",
        "value": round(videos_per_sec, 4),
        "unit": "videos/s",
        "vs_baseline": round(videos_per_sec / V100_BASELINE_VIDEOS_PER_SEC, 3),
        "extra": {
            "device": str(dev),
            "frames": args.frames,
            "batch": B,
            "decode_tokens": args.decode_tokens,
            "sec_per_video": round(per_video, 3),
            "vit_frames_per_sec": round(vit_fps, 1),
            "decode_tok_per_sec": round(decode_tps, 1),
            "prefix_tokens": int(prefix.shape[1]),
            "compile_sec": round(compile_t, 1),
            "config": "tiny" if args.small else "trace-7b-bf16",
            "baseline_estimate": "V100 eval loop ~0.33 videos/s (see BENCH_NOTES.md)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
