"""End-to-end single-video demo (reference: scripts/inference/inference.py:15-128).

Load a converted checkpoint, decode+sample 64 frames, build the production
llama_2 prompt suffixed with <sync>, generate with the head-switching FSM
starting on the time head, and print the structured events.

    MODEL_PATH=... python scripts/inference/inference.py VIDEO.mp4 \
        "Localize a series of activity events in the video, ..."
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    video = sys.argv[1]
    instruction = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "Localize a series of activity events in the video, output the "
        "start and end timestamp for each event, and describe each event "
        "with sentences."
    )

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    except Exception:
        pass

    from trace_tpu import model_init

    model_path = os.environ.get("MODEL_PATH")
    if not model_path:
        raise SystemExit("set MODEL_PATH to a converted TRACE checkpoint dir")
    pipe = model_init(model_path)
    events = pipe.infer_events(
        video, instruction,
        num_frames=int(os.environ.get("FRAMES", "64")),
        max_new_tokens=int(os.environ.get("MAX_NEW_TOKENS", "1024")),
    )
    print(json.dumps(
        {
            "timestamps": events.timestamps,
            "scores": events.scores,
            "captions": events.captions,
        },
        indent=2,
    ))


if __name__ == "__main__":
    main()
