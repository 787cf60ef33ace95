"""Checkpoint layout routing: merged / base+projector / LoRA checkpoints.

Mirrors load_pretrained_model's three layouts (reference trace/model/
builder.py:29-156):

1. merged dir             -> convert directly
2. base + mm_projector    -> base LM tensors + mm_projector.bin overlay
3. LoRA ('lora' in name)  -> base tensors + non_lora_trainables.bin overlay
                             + adapter_model weights merged into the base
                             (W' = W + alpha/r * B @ A, PEFT semantics)
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional

import numpy as np

from trace_tpu.checkpoint import convert as C


def get_model_name_from_path(model_path: str) -> str:
    """Checkpoint-dir -> model name (reference: mm_utils.py:556-563)."""
    parts = model_path.strip("/").split("/")
    return "_".join(parts) if parts[-1].startswith("checkpoint-") else "_".join(parts)


def merge_lora_weights(
    base_sd: Dict[str, np.ndarray],
    adapter_sd: Dict[str, np.ndarray],
    lora_alpha: float,
    lora_r: int,
) -> Dict[str, np.ndarray]:
    """Fold LoRA A/B pairs into the base weights (PEFT merge semantics).

    Adapter keys look like
    ``base_model.model.<target>.lora_A.weight`` with A [r, in], B [out, r];
    the merged delta is (alpha / r) * B @ A added to ``<target>.weight``.
    """
    scale = lora_alpha / lora_r
    merged = dict(base_sd)
    for key, a in adapter_sd.items():
        if ".lora_A." not in key:
            continue
        b_key = key.replace(".lora_A.", ".lora_B.")
        if b_key not in adapter_sd:
            continue
        target = key.split(".lora_A.")[0]
        target = re.sub(r"^base_model\.model\.", "", target) + ".weight"
        if target not in merged:
            raise KeyError(f"LoRA target {target} not in base checkpoint")
        b = adapter_sd[b_key]
        merged[target] = (
            merged[target].astype(np.float32)
            + scale * (b.astype(np.float32) @ a.astype(np.float32))
        )
    return merged


def load_pretrained(
    model_path: str,
    model_base: Optional[str] = None,
    model_name: Optional[str] = None,
    *,
    dtype=None,
    vision_path: Optional[str] = None,
):
    """Route a checkpoint layout to (params, TraceConfig)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    name = model_name or os.path.basename(model_path.rstrip("/"))

    if "lora" in name.lower() and model_base is not None:
        base_sd = C.load_checkpoint_tensors(model_base)
        extra_path = os.path.join(model_path, "non_lora_trainables.bin")
        if os.path.exists(extra_path):
            base_sd.update(C.load_torch_bin(extra_path))
        adapter_file = None
        for cand in ("adapter_model.safetensors", "adapter_model.bin"):
            p = os.path.join(model_path, cand)
            if os.path.exists(p):
                adapter_file = p
                break
        if adapter_file:
            if adapter_file.endswith(".safetensors"):
                from safetensors import safe_open

                adapter_sd = {}
                with safe_open(adapter_file, framework="numpy") as r:
                    for k in r.keys():
                        adapter_sd[k] = r.get_tensor(k)
            else:
                adapter_sd = C.load_torch_bin(adapter_file)
            with open(os.path.join(model_path, "adapter_config.json")) as f:
                acfg = json.load(f)
            base_sd = merge_lora_weights(
                base_sd, adapter_sd, acfg["lora_alpha"], acfg["r"]
            )
        hf_cfg = C.read_hf_config(model_path if os.path.exists(
            os.path.join(model_path, "config.json")) else model_base)
        return _convert_from_sd(base_sd, hf_cfg, dtype, vision_path)

    if model_base is not None:
        base_sd = C.load_checkpoint_tensors(model_base)
        proj = os.path.join(model_path, "mm_projector.bin")
        if os.path.exists(proj):
            base_sd.update(C.load_torch_bin(proj))
        hf_cfg = C.read_hf_config(model_path if os.path.exists(
            os.path.join(model_path, "config.json")) else model_base)
        return _convert_from_sd(base_sd, hf_cfg, dtype, vision_path)

    return C.convert_trace_checkpoint(model_path, dtype=dtype, vision_path=vision_path)


def _convert_from_sd(sd, hf_cfg, dtype, vision_path):
    config = C.trace_config_from_hf(hf_cfg, dtype=dtype)
    params = {
        "decoder": C.convert_mistral_decoder(sd, config.decoder, dtype=dtype),
        "connector": C.convert_spatial_slot(sd, dtype=dtype)
        if config.mm_projector_type == "spatial_slot"
        else C._convert_generic_projector(sd, config, dtype=dtype),
        "towers": C.convert_towers(sd, dtype=dtype),
    }
    vision_prefix = "model.vision_tower.vision_tower.vision_model."
    if any(k.startswith(vision_prefix) for k in sd):
        params["vision"] = C.convert_clip_vision(
            sd, config.vision, prefix=vision_prefix, dtype=dtype
        )
    else:
        if vision_path is None:
            raise FileNotFoundError(
                "no bundled vision tower; pass vision_path=<clip dir>"
            )
        vsd = C.load_checkpoint_tensors(vision_path)
        params["vision"] = C.convert_clip_vision(vsd, config.vision, dtype=dtype)
    return params, config
