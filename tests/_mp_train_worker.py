"""Worker for multi-process train-step parity tests (test_multiprocess.py).

Runs ONE train step of the tiny TRACE model over a global batch of 4 on a
('data'=2, 'model'=4) mesh and prints the resulting loss.  Two modes:

* --mode single : one process, 8 virtual CPU devices (the parity baseline)
* --mode dist   : one of --num-processes cooperating processes, 4 virtual
  CPU devices each, joined via jax.distributed (runtime/distributed.py)

Sample i of the global batch is constructed deterministically from seed i,
so any process can materialize exactly its share.
"""

from __future__ import annotations

import argparse
import os
import sys


def build_sample(cfg, tok, seed: int) -> dict:
    import numpy as np

    from trace_tpu.data.dataset import (
        assemble_sequence,
        build_prompt_segments,
        event_response_segments,
    )
    from trace_tpu.model.trace_model import tokens_per_frame

    V = cfg.decoder.vocab_size
    rng = np.random.default_rng(1000 + seed)
    T = cfg.num_frames
    n_video = T * tokens_per_frame(cfg)
    prompt_segs, video_pos = build_prompt_segments(
        f"Find events {seed}.", tok, n_video, text_vocab_size=V
    )
    events = [
        {"timestamp": [0.0, 1.0 + seed], "score": [4.0], "caption": f"cat {seed}"},
        {"timestamp": [1.0, 3.0 + seed], "score": [2.5], "caption": f"dog {seed}"},
    ]
    resp = event_response_segments(events, tok, text_vocab_size=V)
    seq = assemble_sequence(
        prompt_segs + resp, max_len=n_video + 640, video_pos=video_pos,
        text_vocab_size=V, eos_id=tok.eos_token_id,
    )
    return {
        "frames_u8": rng.integers(0, 255, (T, 56, 56, 3), dtype=np.uint8),
        "frame_time_ids": rng.integers(2, 12, (T, 6)).astype(np.int32),
        "token_ids": seq.token_ids,
        "labels": seq.labels,
        "time_labels": seq.time_labels,
        "score_labels": seq.score_labels,
        "attn_mask": seq.attn_mask,
        "video_pos": __import__("numpy").int32(seq.video_pos),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["single", "dist"], required=True)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--port", type=int, default=19741)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from trace_tpu.runtime import distributed as dist

    if args.mode == "dist":
        dist.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.pid,
        )

    from trace_tpu.data.dataset import collate_batch
    from trace_tpu.model.config import TraceConfig
    from trace_tpu.model.trace_model import init_trace_params
    from trace_tpu.runtime.mesh import batch_shardings, build_mesh, shard_params
    from trace_tpu.tokenizers.text import ByteTokenizer
    from trace_tpu.train.train import TrainRecipe, build_optimizer, make_train_step

    assert len(jax.devices()) == 8, jax.devices()
    cfg = TraceConfig.tiny()
    tok = ByteTokenizer()
    params = init_trace_params(cfg, jax.random.PRNGKey(0))

    mesh = build_mesh()  # (data=2, model=4) over the 8 global devices
    params = shard_params(params, mesh)
    recipe = TrainRecipe.stage2(total_steps=2)
    tx = build_optimizer(params, recipe)
    opt_state = jax.jit(tx.init)(params)
    step_fn = jax.jit(
        make_train_step(cfg, tx, freeze_stage=recipe.stage, use_flash=False),
        donate_argnums=(0, 1),
    )

    global_bs = 4
    order = list(range(global_bs))
    local = dist.process_order_shard(order, global_bs)
    batch = collate_batch([build_sample(cfg, tok, i) for i in local])
    batch = dist.host_local_to_global(batch, mesh, batch_shardings(mesh, batch))

    _, _, metrics = step_fn(params, opt_state, batch)
    print(f"LOSS {float(metrics['loss']):.10f}", flush=True)
    print(f"GRAD_NORM {float(metrics['grad_norm']):.10f}", flush=True)


if __name__ == "__main__":
    main()
