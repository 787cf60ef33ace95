"""Training: optimizer groups, freeze policies, compiled train step.

Re-implements the reference recipe (SURVEY.md §2.7; scripts/train/
pretrain-128.sh, sft-128.sh; trace_trainer.py:152-230) on optax + GSPMD:

* stage 1 ("pretrain"): freeze the LM backbone; train connector at
  mm_projector_lr plus time/score/sync towers and aux heads; LM embed/head
  frozen (train_mt.py:1014-1016, 1102-1106, 1153-1165)
* stage 2 ("sft"): unfreeze backbone; also tune LM embed + lm_head
* AdamW with LayerNorm/bias excluded from weight decay and a separate
  mm_projector learning-rate group (trace_trainer.py:152-230)
* cosine schedule with 3% warmup (pretrain-128.sh:49-64)
* DP+TP sharding comes from runtime/mesh.py; rematerialization via
  jax.checkpoint in the layer scan replaces HF gradient checkpointing.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from trace_tpu.model.config import TraceConfig
from trace_tpu.model.trace_model import forward_train
from trace_tpu.video.preprocess import preprocess_frames


# ---------------------------------------------------------------------------
# Parameter grouping
# ---------------------------------------------------------------------------

def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def param_group(path_s: str, stage: str) -> str:
    """'frozen' | 'projector' | 'base' for a param path under the stage recipe."""
    if path_s.startswith("vision"):
        return "frozen"  # CLIP tower is frozen in every stage (clip_encoder.py:27)
    if "_lora_" in path_s:
        return "base"  # adapters always train when present
    if path_s.startswith("connector"):
        return "projector"
    if path_s.startswith("towers"):
        return "base"  # time/score/sync embeds: tuned in both stages
    if path_s.startswith("decoder"):
        tail = path_s.split("/", 1)[1]
        if tail in ("time_head", "score_head", "sync_head"):
            return "base"  # --tune_mm_embed_head (train_mt.py:1153-1159)
        if stage in ("pretrain", "lora"):
            # stage 1 freezes the backbone; LoRA stage freezes the base
            # weights and trains only the adapters (train_mt.py:1017-1050)
            return "frozen"
        return "base"
    return "base"


def param_labels(params: dict, stage: str) -> dict:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: param_group(_path_str(path), stage), params
    )


def _no_weight_decay(path_s: str) -> bool:
    """Norm scales / biases excluded from decay (trace_trainer.py:171-176)."""
    name = path_s.rsplit("/", 1)[-1]
    if "norm" in name:
        return True
    return name in (
        "bias", "ln_scale", "ln_bias", "class_embedding",
        "bq", "bk", "bv", "bo", "b1", "b2",
    )


def decay_mask(params: dict) -> dict:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _no_weight_decay(_path_str(path)), params
    )


# ---------------------------------------------------------------------------
# Optimizer / schedule
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TrainRecipe:
    stage: str = "sft"                 # 'pretrain' | 'sft'
    learning_rate: float = 5e-6        # sft-128.sh:49 (pretrain: 1e-3)
    projector_lr: Optional[float] = None  # separate mm_projector_lr group
    weight_decay: float = 0.0          # --weight_decay 0. in launch scripts
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    max_grad_norm: float = 1.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    grad_accum_steps: int = 1  # HF gradient_accumulation_steps equivalent

    @classmethod
    def stage1(cls, total_steps: int) -> "TrainRecipe":
        return cls(stage="pretrain", learning_rate=1e-3, total_steps=total_steps)

    @classmethod
    def stage2(cls, total_steps: int) -> "TrainRecipe":
        return cls(stage="sft", learning_rate=5e-6, total_steps=total_steps)


def cosine_schedule(recipe: TrainRecipe, lr: float) -> optax.Schedule:
    warmup = max(1, int(recipe.warmup_ratio * recipe.total_steps))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=warmup,
        decay_steps=recipe.total_steps,
        end_value=0.0,
    )


def build_optimizer(params: dict, recipe: TrainRecipe) -> optax.GradientTransformation:
    def adamw(lr):
        return optax.chain(
            optax.clip_by_global_norm(recipe.max_grad_norm),
            optax.adamw(
                cosine_schedule(recipe, lr),
                b1=recipe.b1, b2=recipe.b2, eps=recipe.eps,
                weight_decay=recipe.weight_decay,
                mask=decay_mask(params) if recipe.weight_decay else None,
            ),
        )

    labels = param_labels(params, recipe.stage)
    tx = optax.multi_transform(
        {
            "base": adamw(recipe.learning_rate),
            "projector": adamw(recipe.projector_lr or recipe.learning_rate),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if recipe.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=recipe.grad_accum_steps)
    return tx


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def preprocess_batch_frames(frames_u8: jax.Array, config: TraceConfig) -> jax.Array:
    """uint8 [B,T,H,W,3] -> normalized [B,T,S,S,3] on device, inside the step."""
    B = frames_u8.shape[0]
    fn = lambda f: preprocess_frames(
        f, config.vision.image_size, aspect_ratio=config.image_aspect_ratio
    )
    return jax.vmap(fn)(frames_u8).astype(config.dtype)


def make_train_step(
    config: TraceConfig,
    tx: optax.GradientTransformation,
    *,
    remat: bool = True,
    use_flash: Optional[bool] = None,
    pp_mesh=None,
    pp_microbatches: int = 1,
    freeze_stage: Optional[str] = None,
):
    """Returns jittable (params, opt_state, batch) -> (params, opt_state, metrics).

    use_flash=None picks the Pallas flash kernels (fwd + dq/dkv bwd) on
    accelerators and the XLA path on CPU.  pp_mesh pipelines the decoder
    over its 'stage' axis (GPipe, parallel/pipeline.py) — the Pallas flash
    path is disabled there (custom calls don't partition under shard_map's
    stage loop).

    freeze_stage applies the stage's freeze policy (param_group) as
    stop_gradient INSIDE the loss: the optimizer's set_to_zero already
    nulls frozen updates, but without this the full frozen-grads tree
    materializes — +14 GB for a frozen 7B backbone, the difference between
    stage-1 training fitting one 16 GB chip or not.  Cotangents for
    stopped params are symbolic zeros XLA folds away; the backward pass
    through the frozen layers still runs (the projector's grads need it)."""
    if use_flash is None:
        from trace_tpu.runtime.generate import default_use_flash

        use_flash = default_use_flash()
    if pp_mesh is not None:
        use_flash = False

    def train_step(params, opt_state, batch):
        if "frames" not in batch:
            batch = dict(batch)
            batch["frames"] = preprocess_batch_frames(batch.pop("frames_u8"), config)

        if freeze_stage is not None:
            labels = param_labels(params, freeze_stage)

        def loss_fn(p):
            if freeze_stage is not None:
                p = jax.tree.map(
                    lambda l, x: jax.lax.stop_gradient(x) if l == "frozen" else x,
                    labels, p,
                )
            return forward_train(
                p, config, batch, remat=remat, use_flash=use_flash,
                pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return train_step


# ---------------------------------------------------------------------------
# High-level loop (host side)
# ---------------------------------------------------------------------------

def train_loop(
    params: dict,
    config: TraceConfig,
    dataset,
    recipe: TrainRecipe,
    *,
    batch_size: int = 2,
    mesh=None,
    log_every: int = 1,
    checkpoint_dir: Optional[str] = None,
    save_every: int = 2000,
    resume: bool = True,
    metrics_path: Optional[str] = None,
    pp_mesh=None,
    pp_microbatches: int = 1,
):
    """Minimal epoch loop with modality-grouped order, orbax checkpointing,
    and auto-resume (reference: trainer auto-resume train_mt.py:1177-1180).

    Multi-process (multi-host): call runtime.distributed.initialize() first;
    batch_size stays the GLOBAL batch — each process loads its
    1/process_count share (process_order_shard keeps modality-grouped
    batches intact) and batches assemble into global sharded arrays
    (host_local_to_global).  Checkpoint saves are collective (orbax);
    logging is process-0 gated."""
    import numpy as np

    from trace_tpu.data.sampler import modality_grouped_indices
    from trace_tpu.runtime.distributed import (
        host_local_to_global,
        is_primary,
        process_order_shard,
    )

    # shard params BEFORE tx.init so the jitted init propagates the mesh
    # placement into opt_state — initializing on unsharded params would pin
    # the optimizer state replicated and force a full reshard (or OOM at 7B)
    # on the first donated step
    if mesh is not None:
        from trace_tpu.runtime.mesh import shard_params

        params = shard_params(params, mesh)

    tx = build_optimizer(params, recipe)
    opt_state = jax.jit(tx.init)(params)
    step_fn = jax.jit(
        make_train_step(
            config, tx, pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
            freeze_stage=recipe.stage,
        ),
        donate_argnums=(0, 1),
    )

    start_step = 0
    ckpt = None
    if checkpoint_dir:
        from trace_tpu.checkpoint.io import CheckpointManager

        ckpt = CheckpointManager(checkpoint_dir)
        if resume:
            param_sh = jax.tree.map(lambda x: getattr(x, "sharding", None), params)
            opt_sh = jax.tree.map(lambda x: getattr(x, "sharding", None), opt_state)
            restored = ckpt.restore_latest(params, opt_state)
            if restored is not None:
                params, opt_state, start_step = restored
                if mesh is not None:
                    # restored arrays land unsharded; re-place both trees
                    params = jax.device_put(params, param_sh)
                    opt_state = jax.device_put(opt_state, opt_sh)

    lengths = dataset.modality_lengths() if hasattr(dataset, "modality_lengths") else None
    order = modality_grouped_indices(
        lengths, batch_size, seed=recipe.total_steps
    ) if lengths else list(range(len(dataset)))

    n_proc = jax.process_count()
    if n_proc > 1:
        if mesh is None:
            raise ValueError("multi-process training requires a mesh")
        local_bs = batch_size // n_proc
        order = process_order_shard(order, batch_size)
    else:
        local_bs = batch_size

    mlog = None
    if metrics_path:
        from trace_tpu.utils.profiling import MetricsLogger

        mlog = MetricsLogger(metrics_path)

    from trace_tpu.data.loader import PrefetchLoader

    loader = PrefetchLoader(
        dataset, local_bs, order=order[start_step * local_bs :],
        num_workers=4, prefetch_batches=2,
    )

    step = start_step
    metrics = {}
    for batch in loader:
        if n_proc > 1:
            batch = host_local_to_global(batch, mesh)
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        step += 1
        if log_every and step % log_every == 0 and is_primary():
            m = {k: float(v) for k, v in metrics.items()}
            print(f"step {step}: " + " ".join(f"{k}={v:.4f}" for k, v in m.items()))
            if mlog:
                mlog.log(step, m)
        if ckpt and step % save_every == 0:
            ckpt.save(step, params, opt_state)
        if step >= recipe.total_steps:
            break

    if ckpt:
        ckpt.save(step, params, opt_state)
    return params, opt_state, metrics
