"""Device mesh construction and sharding rules.

Replaces the reference's DeepSpeed ZeRO-3 data parallelism (scripts/
zero3.json, trace_trainer.py:20-31) with jax.sharding GSPMD over a 2-D
('data', 'model') mesh:

* batch axes shard over 'data' (pure DP);
* weight head/intermediate axes shard over 'model' (tensor parallel) — XLA
  inserts the ICI collectives;
* the frame axis of the ViT batch also shards over 'model' (the 128-frame
  encode is embarrassingly parallel over frames — the sequence-parallel lever
  noted in SURVEY.md §2.3), so a single video's encode spreads across chips.

Rules are name-matched over the params pytree, so they apply equally to the
tiny test model and the 7B flagship.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(n_devices: Optional[int] = None, model_axis: Optional[int] = None) -> Mesh:
    """2-D mesh over the first n devices: ('data', 'model').

    model_axis defaults to min(4, n) (v5e-8 => 2x4) — TP groups stay inside
    one ICI domain; everything else is DP.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if model_axis is None:
        model_axis = min(4, n)
    while n % model_axis:
        model_axis -= 1
    grid = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(grid, ("data", "model"))


# Name-matched PartitionSpec rules for decoder/vision/connector/tower params.
# Checked in order; first key that is a suffix of the param path wins.
_PARAM_RULES: tuple[tuple[str, P], ...] = (
    # decoder
    ("decoder/embed", P("model", None)),
    ("decoder/layers/wq", P(None, None, "model", None)),
    ("decoder/layers/wk", P(None, None, "model", None)),
    ("decoder/layers/wv", P(None, None, "model", None)),
    ("decoder/layers/wo", P(None, "model", None, None)),
    # flattened [L, K, N] forms (quantized leaves after an unfuse round-trip)
    ("decoder/layers/wq", P(None, None, "model")),
    ("decoder/layers/wk", P(None, None, "model")),
    ("decoder/layers/wv", P(None, None, "model")),
    ("decoder/layers/wo", P(None, "model", None)),
    ("decoder/layers/w_gate", P(None, None, "model")),
    ("decoder/layers/w_up", P(None, None, "model")),
    ("decoder/layers/w_down", P(None, "model", None)),
    # fused serving leaves (quantize.fuse_decoder_serving) — safety net only:
    # shard_params_for_inference UNFUSES first (the fused output dim crosses
    # the q|k|v / gate|up boundaries, so sharding it forces resharding
    # collectives around the splits), but if a fused tree reaches the mesh
    # anyway, TP-shard its output dim rather than silently replicating the
    # 7B weights on every chip.
    ("decoder/layers/wqkv", P(None, None, "model")),
    ("decoder/layers/w_gateup", P(None, None, "model")),
    ("decoder/lm_head", P(None, "model")),
    ("decoder/time_head", P(None, None)),
    ("decoder/score_head", P(None, None)),
    ("decoder/sync_head", P(None, None)),
    # vision (attention fused [L, D, D]: shard output dim)
    ("vision/patch_embed", P(None, "model")),
    ("vision/position_embedding", P(None, None)),
    ("vision/layers/wq", P(None, None, "model")),
    ("vision/layers/wk", P(None, None, "model")),
    ("vision/layers/wv", P(None, None, "model")),
    ("vision/layers/wo", P(None, "model", None)),
    ("vision/layers/fc1", P(None, None, "model")),
    ("vision/layers/fc2", P(None, "model", None)),
    ("vision/layers/bq", P(None, "model")),
    ("vision/layers/bk", P(None, "model")),
    ("vision/layers/bv", P(None, "model")),
    ("vision/layers/b1", P(None, "model")),
    # connector
    ("connector/readout", P(None, "model")),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_spec(path, leaf, mesh: Optional[Mesh] = None) -> P:
    return _spec_for(_path_str(path), leaf, mesh)


def _spec_for(s: str, leaf, mesh: Optional[Mesh] = None) -> P:
    for key, spec in _PARAM_RULES:
        if s.endswith(key) or key in s:
            if len(spec) != getattr(leaf, "ndim", 0):
                continue
            if mesh is None:
                return spec
            # drop axes whose dim is not divisible by the mesh axis size
            # (tiny test models replicate where the 7B shards)
            fixed = tuple(
                name
                if name is not None and leaf.shape[i] % mesh.shape[name] == 0
                else None
                for i, name in enumerate(spec)
            )
            return P(*fixed)
    return P()  # replicate


def param_shardings(params: dict, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf, mesh)), params
    )


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place a params pytree on the mesh per the TP/replication rules."""
    return jax.device_put(params, param_shardings(params, mesh))


def inference_param_shardings(params: dict, mesh: Mesh):
    """Serving placement: decoder TP over 'model', everything else
    (vision/connector/towers — encode-only, small) replicated.  The ViT
    parallelizes over the FRAME axis instead (embarrassingly parallel —
    SURVEY.md §2.3), so replicated weights avoid a TP/frame-SP conflict on
    the same mesh axis.

    Accepts the full params tree or the decoder subtree (the pipeline's
    serving layout keeps them separate)."""
    is_subtree = isinstance(params, dict) and "decoder" not in params

    def spec(path, leaf):
        s = _path_str(path)
        if is_subtree:
            s = "decoder/" + s
        if s.startswith("decoder"):
            return NamedSharding(mesh, _spec_for(s, leaf, mesh))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_for_inference(params: dict, mesh: Mesh) -> dict:
    """Place serving params on the mesh (decoder TP).  Fused serving trees
    (wqkv / w_gateup) are split back to canonical leaves first — the fused
    single-chip layout and the TP layout are mutually exclusive (see
    quantize.unfuse_decoder_serving)."""
    from trace_tpu.model.quantize import unfuse_decoder_serving

    if "decoder" in params:
        if "wqkv" in params["decoder"].get("layers", {}):
            params = dict(params)
            params["decoder"] = unfuse_decoder_serving(params["decoder"])
    elif "wqkv" in params.get("layers", {}):
        params = unfuse_decoder_serving(params)
    return jax.device_put(params, inference_param_shardings(params, mesh))


_BATCH_RULES: dict[str, P] = {
    # frames: batch over data, FRAME axis over model (frame-parallel ViT)
    "frames": P("data", "model"),
    "frame_time_ids": P("data", "model"),
}


def batch_shardings(mesh: Mesh, batch: dict) -> dict:
    """Per-key shardings for a batch dict (default: batch axis over 'data')."""
    return {
        k: NamedSharding(mesh, _BATCH_RULES.get(k, P("data"))) for k in batch
    }


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    return jax.device_put(batch, batch_shardings(mesh, batch))
