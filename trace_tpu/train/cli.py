"""Training CLI: the framework's equivalent of scripts/train/*.sh + train_mt.py.

Stage recipes (SURVEY.md §2.7):
  --stage pretrain   freeze LM backbone; tune connector (projector lr 1e-3)
                     + time/score/sync towers + aux heads     (pretrain-128.sh)
  --stage sft        unfreeze backbone; lr 5e-6; rand frame sampling
                     (sft-128.sh; task FT reuses this from a sft checkpoint)

Example:
  python -m trace_tpu.train.cli --stage pretrain \
      --data-path anno.json --data-folder /videos \
      --init-checkpoint /ckpts/trace-init --output-dir runs/stage1 \
      --num-frames 128 --batch-size 8 --epochs 1
"""

from __future__ import annotations

import argparse
import os


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="TRACE-TPU training")
    ap.add_argument("--stage", choices=["pretrain", "sft", "lora"], required=True)
    ap.add_argument("--data-path", required=True, help="annotation JSON")
    ap.add_argument("--data-folder", default="")
    ap.add_argument("--base-llm", default=None,
                    help="base HF LLM dir for stage-0 assembly (fresh "
                         "multimodal modules; reference --model_name_or_path)")
    ap.add_argument("--pretrain-mm-adapter", default=None,
                    help="stage-1 mm_projector.bin to resume the connector "
                         "from (reference --pretrain_mm_mlp_adapter)")
    ap.add_argument("--init-checkpoint", default=None,
                    help="HF checkpoint dir to start from (trace-init / trace)")
    ap.add_argument("--vision-path", default=None)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--num-frames", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=2, help="per-step global batch")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--learning-rate", type=float, default=None)
    ap.add_argument("--projector-lr", type=float, default=None)
    ap.add_argument("--max-len", type=int, default=4096)
    ap.add_argument("--sample-scheme", default=None,
                    help="uniform (stage1) / rand (stage2 default)")
    ap.add_argument("--save-steps", type=int, default=2000)
    ap.add_argument("--mesh-devices", type=int, default=0, help="0 = all")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--lora-r", type=int, default=128,
                    help="LoRA rank for --stage lora (reference default)")
    ap.add_argument("--lora-alpha", type=float, default=256.0)
    ap.add_argument("--pp-stages", type=int, default=0,
                    help="pipeline-parallel decoder stages over a 'stage' "
                         "mesh axis (0 = off; GPipe, parallel/pipeline.py)")
    ap.add_argument("--pp-microbatches", type=int, default=2)
    # multi-host launch (the torchrun --nnodes analog, pretrain-128.sh:24-28;
    # env fallbacks COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID or
    # MASTER_ADDR+MASTER_PORT/WORLD_SIZE/RANK are honored when flags absent)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0's coordination service")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax

    from trace_tpu.runtime.distributed import initialize, is_primary

    initialize(args.coordinator, args.num_processes, args.process_id)

    from trace_tpu.data.dataset import EventDataset
    from trace_tpu.model.config import TraceConfig
    from trace_tpu.model.trace_model import init_trace_params, tokens_per_frame
    from trace_tpu.runtime.mesh import build_mesh
    from trace_tpu.train.train import TrainRecipe, train_loop

    if args.init_checkpoint:
        from trace_tpu.checkpoint.loader import load_pretrained
        from trace_tpu.tokenizers.text import load_hf_tokenizer

        params, config = load_pretrained(
            args.init_checkpoint, vision_path=args.vision_path
        )
        tokenizer = load_hf_tokenizer(args.init_checkpoint)
    elif args.base_llm:
        # stage-0: base LLM + base CLIP + fresh multimodal modules
        # (reference trace_arch.py:60-186 initialize_*_modules)
        from trace_tpu.checkpoint.convert import build_from_base_models
        from trace_tpu.tokenizers.text import load_hf_tokenizer

        if not args.vision_path:
            ap.error("--base-llm requires --vision-path (CLIP dir)")
        params, config = build_from_base_models(
            args.base_llm, args.vision_path,
            mm_projector_path=args.pretrain_mm_adapter, seed=args.seed,
        )
        tokenizer = load_hf_tokenizer(args.base_llm)
    else:
        from trace_tpu.tokenizers.text import ByteTokenizer

        config = TraceConfig.tiny()
        params = init_trace_params(config, jax.random.PRNGKey(args.seed))
        tokenizer = ByteTokenizer()
        print("WARNING: no --init-checkpoint; training a tiny random model")

    sample_scheme = args.sample_scheme or (
        "rand" if args.stage == "sft" else "uniform"  # sft-128.sh:71
    )
    dataset = EventDataset(
        args.data_path, tokenizer,
        data_folder=args.data_folder,
        num_frames=args.num_frames,
        num_video_tokens_per_frame=tokens_per_frame(config),
        max_len=args.max_len,
        sample_scheme=sample_scheme,
        image_size=config.vision.image_size,
        text_vocab_size=config.decoder.vocab_size,
        seed=args.seed,
    )

    steps_per_epoch = max(len(dataset) // args.batch_size, 1)
    total_steps = steps_per_epoch * args.epochs
    if args.stage == "pretrain":
        recipe = TrainRecipe.stage1(total_steps)
    elif args.stage == "lora":
        import dataclasses as dc

        import jax as _jax

        from trace_tpu.model.lora import add_lora_params

        config = dc.replace(
            config,
            decoder=dc.replace(
                config.decoder, lora_r=args.lora_r, lora_alpha=args.lora_alpha
            ),
        )
        params = dict(params)
        params["decoder"] = add_lora_params(
            params["decoder"], config.decoder, _jax.random.PRNGKey(args.seed),
            targets=("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"),
        )
        recipe = TrainRecipe(stage="lora", learning_rate=1e-4, total_steps=total_steps)
    else:
        recipe = TrainRecipe.stage2(total_steps)
    if args.learning_rate is not None:
        recipe = TrainRecipe(
            stage=recipe.stage, learning_rate=args.learning_rate,
            projector_lr=args.projector_lr, total_steps=total_steps,
        )

    mesh = None
    pp_mesh = None
    if args.pp_stages:
        # PP owns the devices: layers staged over 'stage' (GPipe); combine
        # with DP/TP meshes on larger slices by passing n_devices > stages
        from trace_tpu.parallel.pipeline import build_pp_mesh

        pp_mesh = build_pp_mesh(args.pp_stages)
        if is_primary():
            print(f"pipeline mesh: {dict(pp_mesh.shape)}")
    elif len(jax.devices()) > 1:
        mesh = build_mesh(args.mesh_devices or None)
        if is_primary():
            print(f"mesh: {dict(mesh.shape)} over {jax.process_count()} processes")

    os.makedirs(args.output_dir, exist_ok=True)
    params, _, metrics = train_loop(
        params, config, dataset, recipe,
        batch_size=args.batch_size, mesh=mesh,
        checkpoint_dir=os.path.join(args.output_dir, "checkpoints"),
        save_every=args.save_steps,
        pp_mesh=pp_mesh, pp_microbatches=args.pp_microbatches,
    )
    if is_primary():
        print("final metrics:", {k: float(v) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
