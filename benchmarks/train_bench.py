"""Training-step throughput on one chip -> TRAIN_BENCH.json.

Measures the largest stage-1-style configuration that fits a single 16 GB
v5e: Mistral-7B backbone FROZEN (stage-1 recipe, reference
pretrain-128.sh:24-70 — projector + time/score/sync embeds/heads train),
frozen CLIP ViT-L over the full 128-frame video, remat on, bf16.

Gradients flow through all 32 decoder layers to reach the projector (full
backward compute), but no backbone optimizer state exists (multi_transform
set_to_zero), which is what makes 7B training fit one chip.

python benchmarks/train_bench.py [--frames 128] [--batch 1] [--steps 3]
Writes TRAIN_BENCH.json and prints one JSON line.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--text-len", type=int, default=256)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--stage", default="pretrain", choices=["pretrain", "sft", "lora"])
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu). The environment "
                         "registers the axon TPU unconditionally, so "
                         "JAX_PLATFORMS alone is not honored — this flag "
                         "re-overrides after import like tests/conftest.py")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from trace_tpu.model.config import DecoderConfig, TraceConfig, VisionConfig
    from trace_tpu.model.trace_model import init_trace_params, tokens_per_frame
    from trace_tpu.train.train import TrainRecipe, build_optimizer, make_train_step

    if args.small:
        config = TraceConfig.tiny()
        args.frames = config.num_frames
    else:
        config = TraceConfig(
            decoder=DecoderConfig(),
            vision=VisionConfig(),
            num_frames=args.frames,
            dtype=jnp.bfloat16,
        )

    dev = jax.devices()[0]

    # zero-params at the right shapes (no giant on-device init program)
    shapes = jax.eval_shape(
        lambda k: init_trace_params(config, k, dtype=config.dtype),
        jax.random.PRNGKey(0),
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    recipe = TrainRecipe(
        stage=args.stage, total_steps=1000,
        learning_rate=1e-3 if args.stage == "pretrain" else 5e-6,
    )
    tx = build_optimizer(params, recipe)
    opt_state = jax.jit(tx.init)(params)
    step_fn = jax.jit(
        make_train_step(config, tx, freeze_stage=args.stage),
        donate_argnums=(0, 1),
    )

    B, T = args.batch, args.frames
    n_video = T * tokens_per_frame(config)
    L = n_video + args.text_len
    S = config.vision.image_size
    rng = np.random.default_rng(0)

    def make_batch(i):
        ids = rng.integers(0, config.decoder.vocab_size, size=(B, L)).astype(np.int32)
        labels = ids.copy()
        labels[:, : n_video + 4] = -100
        return {
            "frames_u8": jnp.asarray(
                rng.integers(0, 255, (B, T, S, S, 3), dtype=np.uint8)
            ),
            "frame_time_ids": jnp.asarray(rng.integers(2, 12, (B, T, 6)), jnp.int32),
            "token_ids": jnp.asarray(ids),
            "video_pos": jnp.full((B,), 4, jnp.int32),
            "attn_mask": jnp.ones((B, L), bool),
            "labels": jnp.asarray(labels),
            "time_labels": jnp.full((B, L), -100, jnp.int32),
            "score_labels": jnp.full((B, L), -100, jnp.int32),
        }

    def fence(x):
        # block_until_ready is a no-op through the tunnel; D2H scalar fetch
        # is the reliable fence (BENCH_NOTES.md round 2)
        return float(np.asarray(x))

    t0 = time.perf_counter()
    params, opt_state, metrics = step_fn(params, opt_state, make_batch(0))
    fence(metrics["loss"])
    compile_t = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, metrics = step_fn(params, opt_state, make_batch(i + 1))
    fence(metrics["loss"])
    step_t = (time.perf_counter() - t0) / args.steps

    tokens_per_step = B * L
    result = {
        "metric": "train_tokens/sec/chip",
        "value": round(tokens_per_step / step_t, 1),
        "unit": "tokens/s",
        "extra": {
            "device": str(dev),
            "stage": args.stage,
            "batch": B,
            "frames": T,
            "seq_len": L,
            "step_sec": round(step_t, 3),
            "videos_per_sec": round(B / step_t, 4),
            "compile_sec": round(compile_t, 1),
            "config": "tiny" if args.small else "trace-7b-bf16-frozen-backbone",
        },
    }
    print(json.dumps(result))
    if not args.small:
        with open("TRAIN_BENCH.json", "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
