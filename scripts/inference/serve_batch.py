"""Batch serving CLI: run causal-event inference over a directory (or list)
of videos at full serving throughput and write JSONL results.

The production path the bench measures (two-phase corpus mode: content-band
uploads, KV arena, auto prefill/decode split, int8 serving quantization) —
packaged as the operational entry point the reference lacks (its eval loop
is batch-1, trace/eval/evaluate.py:296-302).

    python scripts/inference/serve_batch.py \
        --model-path CKPT [--vision-path CLIP] \
        --videos DIR_OR_GLOB [--instruction "..."] \
        --out results.jsonl --batch 32 --frames 128 [--quant int8]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

VIDEO_EXTS = (".mp4", ".mkv", ".webm", ".avi", ".mov", ".gif", ".npy")
DEFAULT_INSTRUCTION = (
    "Localize a series of activity events in the video, output the start "
    "and end timestamp for each event, and describe each event with "
    "sentences."
)


def collect_videos(spec: str) -> list:
    if os.path.isdir(spec):
        return sorted(
            os.path.join(spec, f)
            for f in os.listdir(spec)
            if f.lower().endswith(VIDEO_EXTS)
        )
    return sorted(glob.glob(spec))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--vision-path", default=None)
    ap.add_argument("--videos", required=True, help="directory or glob")
    ap.add_argument("--instruction", default=DEFAULT_INSTRUCTION)
    ap.add_argument("--out", default="results.jsonl")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--max-new-tokens", type=int, default=512)
    ap.add_argument("--quant", choices=["bf16", "int8", "int4", "int4p"], default="int8")
    ap.add_argument("--streamed", dest="streamed", action="store_true",
                    default=True,
                    help="decode completed chunks while later chunks encode "
                         "(default since r4: result-identical to two-phase, "
                         "measured faster at every link quality)")
    ap.add_argument("--two-phase", dest="streamed", action="store_false",
                    help="encode the whole corpus before decoding")
    ap.add_argument("--constrain-time", action="store_true",
                    help="trace-retrieval timestamp constraint")
    ap.add_argument("--max-side", type=int, default=672,
                    help="native pre-scaled decode cap (0 = native res)")
    # fleet serving: shard the video list over independent workers (one
    # chip each); each writes its own JSONL
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--shard", type=int, default=0)
    args = ap.parse_args()

    paths = collect_videos(args.videos)
    if args.num_shards > 1:
        paths = paths[args.shard :: args.num_shards]
        root, ext = os.path.splitext(args.out)
        args.out = f"{root}_shard{args.shard}of{args.num_shards}{ext}"
    if not paths:
        raise SystemExit(f"no videos matched {args.videos!r}")

    from trace_tpu.runtime.pipeline import model_init
    from trace_tpu.video.io import load_video_frames

    pipe = model_init(
        args.model_path, vision_path=args.vision_path, quant=args.quant
    )

    import numpy as np

    failed = {}

    def load_item(i):
        try:
            frames, ts = load_video_frames(
                paths[i], args.frames, max_side=args.max_side or None
            )
        except Exception as e:
            failed[i] = str(e)
            frames = np.zeros((args.frames, 64, 64, 3), np.uint8)
            ts = [[0.0]] * args.frames
        return frames, ts, args.instruction

    t0 = time.perf_counter()
    preds = pipe.infer_events_corpus(
        load_item, len(paths),
        decode_batch=args.batch,
        max_new_tokens=args.max_new_tokens,
        constrain_time=args.constrain_time,
        streamed=args.streamed,
    )
    dt = time.perf_counter() - t0

    n_ok = 0
    with open(args.out, "w") as f:
        for i, (path, p) in enumerate(zip(paths, preds)):
            if i in failed:
                f.write(json.dumps({"video": path, "error": failed[i]}) + "\n")
                continue
            f.write(json.dumps({
                "video": path,
                "timestamps": p.timestamps,
                "scores": p.scores,
                "captions": p.captions,
            }) + "\n")
            n_ok += 1
    print(
        f"{n_ok}/{len(paths)} videos -> {args.out} "
        f"({len(paths)/dt:.2f} videos/s)"
    )


if __name__ == "__main__":
    main()
