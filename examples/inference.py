"""Single-video causal event inference demo.

The framework equivalent of the reference's scripts/inference/inference.py:
load a released checkpoint, sample 64 frames, decode the event triplets.

    python examples/inference.py --model-path CKPT \
        [--vision-path CLIP_DIR] --video VIDEO.mp4 [--retrieval]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--vision-path", default=None)
    ap.add_argument("--video", required=True)
    ap.add_argument("--question", default=(
        "Localize a series of activity events in the video, output the start "
        "and end timestamp for each event, and describe each event with "
        "sentences."
    ))
    ap.add_argument("--num-frames", type=int, default=64)
    ap.add_argument("--max-new-tokens", type=int, default=1024)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--retrieval", action="store_true",
                    help="constrain timestamps to input frame timestamps "
                         "(trace-retrieval behavior)")
    args = ap.parse_args()

    from trace_tpu import model_init
    from trace_tpu.video.io import load_video_frames

    pipe = model_init(args.model_path, vision_path=args.vision_path)

    if args.retrieval:
        frames, ts = load_video_frames(args.video, args.num_frames)
        preds = pipe.infer_events_corpus(
            lambda i: (frames, ts, args.question), 1,
            encode_batch=1, decode_batch=1,
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature,
            constrain_time=True,
        )[0]
    else:
        preds = pipe.infer_events(
            args.video, args.question,
            num_frames=args.num_frames,
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature,
        )
    print(json.dumps(preds.to_dict(), indent=2))


if __name__ == "__main__":
    main()
