"""HF checkpoint -> JAX pytree conversion.

Converts the released TRACE checkpoints (TraceMistralForCausalLM merged dirs,
reference: trace/model/builder.py:29-156) and their components (CLIP vision
tower, mm_projector.bin, time/score/sync towers) into this framework's
parameter layout.  Weight-layout contracts are documented per function; all
are covered by parity tests against HF torch modules
(tests/test_checkpoint_parity.py).

Key layout recap (ours):
  decoder: embed [V,D]; layers.* stacked [L,...]; wq [L,D,NH,hd] etc.;
           lm/sync/time/score heads as [D, out] matrices.
  vision:  patch_embed [3*p*p, D] channel-major; layers stacked.
  connector(spatial_slot): slots [D_mm, S], ln_{scale,bias}, readout [D_mm, D_lm]
  towers:  time [13,D], score [13,D], sync [1,D]
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from trace_tpu.model.config import DecoderConfig, TraceConfig, VisionConfig

Array = np.ndarray
StateDict = Mapping[str, Array]


# ---------------------------------------------------------------------------
# Raw tensor loading (safetensors / torch .bin), local files only
# ---------------------------------------------------------------------------

def load_safetensors_dir(path: str) -> Dict[str, Array]:
    """Load every *.safetensors shard in a checkpoint dir to numpy."""
    from safetensors import safe_open

    tensors: Dict[str, Array] = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {path}")
    for f in files:
        with safe_open(os.path.join(path, f), framework="numpy") as reader:
            for key in reader.keys():
                tensors[key] = reader.get_tensor(key)
    return tensors


def load_torch_bin(path: str) -> Dict[str, Array]:
    """Load a torch-serialized state dict (e.g. mm_projector.bin) to numpy."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in state.items()}


def load_checkpoint_tensors(path: str) -> Dict[str, Array]:
    """Load tensors from a checkpoint dir (safetensors preferred, .bin
    fallback) or a single .bin / .safetensors file (e.g. mm_projector.bin)."""
    if os.path.isfile(path):
        if path.endswith(".safetensors"):
            from safetensors.numpy import load_file

            return dict(load_file(path))
        import torch

        state = torch.load(path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in state.items()}
    if any(f.endswith(".safetensors") for f in os.listdir(path)):
        return load_safetensors_dir(path)
    import torch

    tensors: Dict[str, Array] = {}
    for f in sorted(os.listdir(path)):
        if f.startswith("pytorch_model") and f.endswith(".bin"):
            state = torch.load(os.path.join(path, f), map_location="cpu", weights_only=True)
            tensors.update({k: v.float().numpy() for k, v in state.items()})
    if not tensors:
        raise FileNotFoundError(f"no model weights found in {path}")
    return tensors


# ---------------------------------------------------------------------------
# Mistral decoder
# ---------------------------------------------------------------------------

def convert_mistral_decoder(
    sd: StateDict,
    config: DecoderConfig,
    *,
    prefix: str = "model.",
    dtype=jnp.float32,
) -> dict:
    """HF MistralForCausalLM (+TRACE heads) state dict -> decoder params.

    HF nn.Linear stores [out, in]; our einsum contracts [in, out], so every
    projection transposes.  Attention projections additionally reshape to
    split heads: q_proj [NH*hd, D] -> wq [D, NH, hd].
    """
    c = config
    L, D = c.num_layers, c.hidden_size
    NH, NKV, HD = c.num_heads, c.num_kv_heads, c.head_dim

    def get(name: str) -> Array:
        return np.asarray(sd[name], np.float32)

    def stack(fmt: str, f: Callable[[Array], Array]):
        return jnp.asarray(
            np.stack([f(get(fmt.format(i=i))) for i in range(L)]), dtype
        )

    layers = {
        "attn_norm": stack(prefix + "layers.{i}.input_layernorm.weight", lambda w: w),
        "mlp_norm": stack(prefix + "layers.{i}.post_attention_layernorm.weight", lambda w: w),
        "wq": stack(
            prefix + "layers.{i}.self_attn.q_proj.weight",
            lambda w: w.T.reshape(D, NH, HD),
        ),
        "wk": stack(
            prefix + "layers.{i}.self_attn.k_proj.weight",
            lambda w: w.T.reshape(D, NKV, HD),
        ),
        "wv": stack(
            prefix + "layers.{i}.self_attn.v_proj.weight",
            lambda w: w.T.reshape(D, NKV, HD),
        ),
        "wo": stack(
            prefix + "layers.{i}.self_attn.o_proj.weight",
            lambda w: w.T.reshape(NH, HD, D),
        ),
        "w_gate": stack(prefix + "layers.{i}.mlp.gate_proj.weight", lambda w: w.T),
        "w_up": stack(prefix + "layers.{i}.mlp.up_proj.weight", lambda w: w.T),
        "w_down": stack(prefix + "layers.{i}.mlp.down_proj.weight", lambda w: w.T),
    }
    if c.attn_qkv_bias:  # qwen2-style backbones
        layers["bq"] = stack(
            prefix + "layers.{i}.self_attn.q_proj.bias", lambda b: b.reshape(NH, HD)
        )
        layers["bk"] = stack(
            prefix + "layers.{i}.self_attn.k_proj.bias", lambda b: b.reshape(NKV, HD)
        )
        layers["bv"] = stack(
            prefix + "layers.{i}.self_attn.v_proj.bias", lambda b: b.reshape(NKV, HD)
        )
    params = {
        "embed": jnp.asarray(get(f"{prefix}embed_tokens.weight")[: c.vocab_size], dtype),
        "layers": layers,
        "final_norm": jnp.asarray(get(f"{prefix}norm.weight"), dtype),
        "lm_head": jnp.asarray(get("lm_head.weight")[: c.vocab_size].T, dtype),
    }
    # TRACE auxiliary heads (trace_mistral.py:91-94); absent in vanilla Mistral.
    for name, width in (
        ("sync_head", 1),
        ("time_head", c.time_vocab_size),
        ("score_head", c.score_vocab_size),
    ):
        key = f"{name}.weight"
        if key in sd:
            params[name] = jnp.asarray(get(key).T, dtype)
        else:
            params[name] = jnp.zeros((D, width), dtype)
    return params


def convert_mixtral_decoder(
    sd: StateDict,
    config,
    *,
    prefix: str = "model.",
    dtype=jnp.float32,
) -> dict:
    """HF MixtralForCausalLM state dict -> MoE decoder params.

    The reference's model zoo routes 'mixtral' backbones at
    train_mt.py:948-1011 (inactive there — the import is commented out at
    trace/model/__init__.py:3); this makes the path loadable.  Attention +
    norms convert exactly like Mistral; the block_sparse_moe maps to the
    stacked-expert layout:

      gate.weight           [E, D]  -> router  [L, D, E]
      experts.{j}.w1.weight [I, D]  -> w_gate  [L, E, D, I]
      experts.{j}.w3.weight [I, D]  -> w_up    [L, E, D, I]
      experts.{j}.w2.weight [D, I]  -> w_down  [L, E, I, D]
    """
    c = config
    L, E = c.num_layers, c.num_experts

    def get(name: str) -> Array:
        return np.asarray(sd[name], np.float32)

    # reuse the Mistral mapping for everything but the MLP: synthesize the
    # dense-MLP keys it expects from layer 0's expert 0 (thrown away below)
    sd_aug = dict(sd)
    for i in range(L):
        moe = f"{prefix}layers.{i}.block_sparse_moe"
        sd_aug[f"{prefix}layers.{i}.mlp.gate_proj.weight"] = sd[f"{moe}.experts.0.w1.weight"]
        sd_aug[f"{prefix}layers.{i}.mlp.up_proj.weight"] = sd[f"{moe}.experts.0.w3.weight"]
        sd_aug[f"{prefix}layers.{i}.mlp.down_proj.weight"] = sd[f"{moe}.experts.0.w2.weight"]
    params = convert_mistral_decoder(sd_aug, c, prefix=prefix, dtype=dtype)

    layers = dict(params["layers"])
    for name in ("w_gate", "w_up", "w_down"):
        layers.pop(name)

    def stack_experts(hf_name: str, transpose: bool):
        per_layer = []
        for i in range(L):
            per_expert = [
                get(f"{prefix}layers.{i}.block_sparse_moe.experts.{j}.{hf_name}.weight")
                for j in range(E)
            ]
            per_layer.append(np.stack([w.T if transpose else w for w in per_expert]))
        return jnp.asarray(np.stack(per_layer), dtype)

    layers["router"] = jnp.asarray(
        np.stack([
            get(f"{prefix}layers.{i}.block_sparse_moe.gate.weight").T
            for i in range(L)
        ]),
        dtype,
    )
    layers["w_gate"] = stack_experts("w1", True)   # [L, E, D, I]
    layers["w_up"] = stack_experts("w3", True)     # [L, E, D, I]
    layers["w_down"] = stack_experts("w2", True)   # [L, E, I, D]
    params = dict(params)
    params["layers"] = layers
    return params


# ---------------------------------------------------------------------------
# CLIP vision tower
# ---------------------------------------------------------------------------

def convert_clip_vision(
    sd: StateDict,
    config: VisionConfig,
    *,
    prefix: str = "vision_model.",
    dtype=jnp.float32,
) -> dict:
    """HF CLIPVisionModel state dict -> vit params.

    patch_embedding.weight [D, 3, p, p] flattens channel-major to match
    :func:`trace_tpu.model.vit.extract_patches`. Note HF's historical typo
    'pre_layrnorm'.
    """
    c = config
    L, D = c.num_layers, c.hidden_size

    def get(name: str) -> Array:
        return np.asarray(sd[prefix + name], np.float32)

    def stack(fmt: str, f: Callable[[Array], Array] = lambda w: w):
        return jnp.asarray(
            np.stack([f(get(fmt.format(i=i))) for i in range(L)]), dtype
        )

    patch = get("embeddings.patch_embedding.weight")  # [D, 3, p, p]
    patch = patch.reshape(D, -1).T  # [3*p*p, D], channel-major rows

    pre_ln_key = (
        "pre_layrnorm" if prefix + "pre_layrnorm.weight" in sd else "pre_layernorm"
    )
    lyr = "encoder.layers.{i}."
    return {
        "class_embedding": jnp.asarray(get("embeddings.class_embedding"), dtype),
        "patch_embed": jnp.asarray(patch, dtype),
        "position_embedding": jnp.asarray(get("embeddings.position_embedding.weight"), dtype),
        "pre_ln": {
            "scale": jnp.asarray(get(pre_ln_key + ".weight"), dtype),
            "bias": jnp.asarray(get(pre_ln_key + ".bias"), dtype),
        },
        "layers": {
            "ln1_scale": stack(lyr + "layer_norm1.weight"),
            "ln1_bias": stack(lyr + "layer_norm1.bias"),
            "wq": stack(lyr + "self_attn.q_proj.weight", lambda w: w.T),
            "bq": stack(lyr + "self_attn.q_proj.bias"),
            "wk": stack(lyr + "self_attn.k_proj.weight", lambda w: w.T),
            "bk": stack(lyr + "self_attn.k_proj.bias"),
            "wv": stack(lyr + "self_attn.v_proj.weight", lambda w: w.T),
            "bv": stack(lyr + "self_attn.v_proj.bias"),
            "wo": stack(lyr + "self_attn.out_proj.weight", lambda w: w.T),
            "bo": stack(lyr + "self_attn.out_proj.bias"),
            "ln2_scale": stack(lyr + "layer_norm2.weight"),
            "ln2_bias": stack(lyr + "layer_norm2.bias"),
            "fc1": stack(lyr + "mlp.fc1.weight", lambda w: w.T),
            "b1": stack(lyr + "mlp.fc1.bias"),
            "fc2": stack(lyr + "mlp.fc2.weight", lambda w: w.T),
            "b2": stack(lyr + "mlp.fc2.bias"),
        },
    }


# ---------------------------------------------------------------------------
# Connector (mm_projector) + towers
# ---------------------------------------------------------------------------

def convert_spatial_slot(sd: StateDict, *, prefix: str = "model.mm_projector.", dtype=jnp.float32) -> dict:
    """SpatialSlotPool weights (builder.py:411-424): slots [D_mm, S],
    ln_vision LayerNorm, readout Linear(no bias)."""
    def get(name: str) -> Array:
        return np.asarray(sd[prefix + name], np.float32)

    return {
        "slots": jnp.asarray(get("slots"), dtype),
        "ln_scale": jnp.asarray(get("ln_vision.weight"), dtype),
        "ln_bias": jnp.asarray(get("ln_vision.bias"), dtype),
        "readout": jnp.asarray(get("readout.weight").T, dtype),
    }


def convert_spatial_time_slot(
    sd: StateDict, *, prefix: str = "model.mm_projector.", dtype=jnp.float32
) -> dict:
    """SpatialTimeSlotPool weights (builder.py:469-487): split spatial/time
    slot banks sharing one ln_vision LayerNorm + bias-free readout Linear."""
    def get(name: str) -> Array:
        return np.asarray(sd[prefix + name], np.float32)

    return {
        "spatial_slots": jnp.asarray(get("spatial_slots"), dtype),
        "time_slots": jnp.asarray(get("time_slots"), dtype),
        "ln_scale": jnp.asarray(get("ln_vision.weight"), dtype),
        "ln_bias": jnp.asarray(get("ln_vision.bias"), dtype),
        "readout": jnp.asarray(get("readout.weight").T, dtype),
    }


def convert_towers(sd: StateDict, *, prefix: str = "model.", dtype=jnp.float32) -> dict:
    def get(name: str) -> Array:
        return np.asarray(sd[prefix + name], np.float32)

    return {
        "time": jnp.asarray(get("time_tower.embed_tokens.weight"), dtype),
        "score": jnp.asarray(get("score_tower.embed_tokens.weight"), dtype),
        "sync": jnp.asarray(get("sync_tower.embed_tokens.weight"), dtype),
    }


# ---------------------------------------------------------------------------
# Full TRACE checkpoint
# ---------------------------------------------------------------------------

def read_hf_config(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


def trace_config_from_hf(hf_cfg: dict, **overrides) -> TraceConfig:
    dec_cls = DecoderConfig
    moe_kw = {}
    if "mixtral" in hf_cfg.get("model_type", "") or hf_cfg.get("num_local_experts"):
        from trace_tpu.model.moe import MoEConfig

        dec_cls = MoEConfig
        # Converted checkpoints default to the exact dense mixture: the
        # capacity-bucketed sparse path drops token-expert contributions
        # whenever routing load exceeds capacity_factor x the mean (likely at
        # small N), silently deviating from the HF reference the weights were
        # trained under.  Sparse dispatch stays an explicit training-time
        # opt-in via overrides.
        moe_kw = dict(
            num_experts=hf_cfg.get("num_local_experts", 8),
            top_k=hf_cfg.get("num_experts_per_tok", 2),
            moe_impl="dense",
        )
    dec = dec_cls(
        **moe_kw,
        vocab_size=hf_cfg.get("vocab_size", 32000),
        hidden_size=hf_cfg.get("hidden_size", 4096),
        intermediate_size=hf_cfg.get("intermediate_size", 14336),
        num_layers=hf_cfg.get("num_hidden_layers", 32),
        num_heads=hf_cfg.get("num_attention_heads", 32),
        num_kv_heads=hf_cfg.get("num_key_value_heads", 8),
        head_dim=hf_cfg.get("head_dim")
        or hf_cfg.get("hidden_size", 4096) // hf_cfg.get("num_attention_heads", 32),
        rope_theta=hf_cfg.get("rope_theta", 10000.0),
        rms_eps=hf_cfg.get("rms_norm_eps", 1e-5),
        time_vocab_size=hf_cfg.get("time_vocab_size", 13),
        score_vocab_size=hf_cfg.get("score_vocab_size", 13),
        attn_qkv_bias="qwen2" in hf_cfg.get("model_type", ""),
    )
    kwargs = dict(
        decoder=dec,
        mm_projector_type=hf_cfg.get("mm_projector_type", "spatial_slot"),
        num_slots=hf_cfg.get("num_slots", 8),
        num_frames=hf_cfg.get("num_frames", 128),
        image_aspect_ratio=hf_cfg.get("image_aspect_ratio", "pad"),
    )
    kwargs.update(overrides)  # explicit overrides win over checkpoint fields
    return TraceConfig(**kwargs)


def convert_trace_checkpoint(
    path: str,
    *,
    dtype=jnp.bfloat16,
    vision_path: str | None = None,
) -> tuple:
    """Merged TRACE checkpoint dir -> (params, TraceConfig).

    Layout routed like load_pretrained_model (reference model/builder.py:
    29-156): a merged dir carries decoder + heads + mm_projector + towers;
    the CLIP tower weights come bundled or from ``vision_path``.
    """
    hf_cfg = read_hf_config(path)
    config = trace_config_from_hf(hf_cfg, dtype=dtype)
    sd = load_checkpoint_tensors(path)

    is_moe = hasattr(config.decoder, "num_experts")
    dec_convert = convert_mixtral_decoder if is_moe else convert_mistral_decoder
    params = {
        "decoder": dec_convert(sd, config.decoder, dtype=dtype),
        "connector": convert_spatial_slot(sd, dtype=dtype)
        if config.mm_projector_type == "spatial_slot"
        else _convert_generic_projector(sd, config, dtype=dtype),
        "towers": convert_towers(sd, dtype=dtype),
    }

    vision_sd = sd
    vision_prefix = "model.vision_tower.vision_tower.vision_model."
    if not any(k.startswith(vision_prefix) for k in sd):
        if vision_path is None:
            raise FileNotFoundError(
                "checkpoint has no bundled vision tower; pass vision_path="
                "<local clip-vit-large-patch14-336 dir>"
            )
        vision_sd = load_checkpoint_tensors(vision_path)
        vision_prefix = "vision_model."
    params["vision"] = convert_clip_vision(
        vision_sd, config.vision, prefix=vision_prefix, dtype=dtype
    )
    return params, config


def _convert_generic_projector(sd: StateDict, config: TraceConfig, *, dtype=jnp.float32) -> dict:
    t = config.mm_projector_type
    if t == "linear":
        return {
            "weight": jnp.asarray(np.asarray(sd["model.mm_projector.weight"], np.float32).T, dtype),
            "bias": jnp.asarray(np.asarray(sd["model.mm_projector.bias"], np.float32), dtype),
        }
    m = re.match(r"^mlp(\d+)x_gelu$", t)
    if m:
        depth = int(m.group(1))
        layers = []
        for i in range(depth):
            idx = i * 2  # GELUs sit at odd indices in the Sequential
            layers.append({
                "weight": jnp.asarray(
                    np.asarray(sd[f"model.mm_projector.{idx}.weight"], np.float32).T, dtype
                ),
                "bias": jnp.asarray(
                    np.asarray(sd[f"model.mm_projector.{idx}.bias"], np.float32), dtype
                ),
            })
        return {"layers": layers}
    if t in (
        "stc_connector", "stp_connector", "stc_connector_v35",
        "spatial_conv", "spatial_pool",
    ):
        return convert_stc_connector(sd, t, dtype=dtype)
    if t == "slot":
        # SlotPool (builder.py:361-373) has the exact state-dict layout of
        # SpatialSlotPool: slots / ln_vision / bias-free readout.
        return convert_spatial_slot(sd, dtype=dtype)
    if t == "spatial_time_slot":
        return convert_spatial_time_slot(sd, dtype=dtype)
    if t == "identity":
        return {}
    raise NotImplementedError(f"projector conversion for {t} not implemented")


def convert_stc_connector(
    sd: StateDict,
    projector_type: str,
    *,
    prefix: str = "model.mm_projector.",
    dtype=jnp.float32,
) -> dict:
    """STC/STP-family torch state dict -> stc_connector params.

    Key layout follows the reference module tree (builder.py:138-284):
    timm RegStage names (s1.b{i}.conv1.conv / .bn = LayerNorm2d affine /
    se.fc1 / downsample.conv), nn.Sequential sampler (sampler.0.*), and the
    build_mlp readout (readout.0 / readout.2 / ... — GELUs at odd indices).
    """
    from trace_tpu.model.stc_connector import SPECS

    spec = SPECS[projector_type]

    def get(name: str) -> Array:
        return np.asarray(sd[prefix + name], np.float32)

    def has(name: str) -> bool:
        return (prefix + name) in sd

    def block(stage: str, i: int) -> dict:
        b = f"{stage}.b{i + 1}"
        p = {
            "conv1": jnp.asarray(get(f"{b}.conv1.conv.weight"), dtype),
            "ln1_scale": jnp.asarray(get(f"{b}.conv1.bn.weight"), dtype),
            "ln1_bias": jnp.asarray(get(f"{b}.conv1.bn.bias"), dtype),
            "conv2": jnp.asarray(get(f"{b}.conv2.conv.weight"), dtype),
            "ln2_scale": jnp.asarray(get(f"{b}.conv2.bn.weight"), dtype),
            "ln2_bias": jnp.asarray(get(f"{b}.conv2.bn.bias"), dtype),
            "se_fc1_w": jnp.asarray(get(f"{b}.se.fc1.weight"), dtype),
            "se_fc1_b": jnp.asarray(get(f"{b}.se.fc1.bias"), dtype),
            "se_fc2_w": jnp.asarray(get(f"{b}.se.fc2.weight"), dtype),
            "se_fc2_b": jnp.asarray(get(f"{b}.se.fc2.bias"), dtype),
            "conv3": jnp.asarray(get(f"{b}.conv3.conv.weight"), dtype),
            "ln3_scale": jnp.asarray(get(f"{b}.conv3.bn.weight"), dtype),
            "ln3_bias": jnp.asarray(get(f"{b}.conv3.bn.bias"), dtype),
        }
        if has(f"{b}.downsample.conv.weight"):
            p["down_conv"] = jnp.asarray(get(f"{b}.downsample.conv.weight"), dtype)
            p["down_ln_scale"] = jnp.asarray(get(f"{b}.downsample.bn.weight"), dtype)
            p["down_ln_bias"] = jnp.asarray(get(f"{b}.downsample.bn.bias"), dtype)
        return p

    params: dict = {
        "s1": [block("s1", i) for i in range(spec.depth)],
        "s2": [block("s2", i) for i in range(spec.depth)],
    }
    if spec.sampler == "conv":
        params["sampler_w"] = jnp.asarray(get("sampler.0.weight"), dtype)
        params["sampler_b"] = jnp.asarray(get("sampler.0.bias"), dtype)
    mlp = []
    for i in range(spec.mlp_depth):
        idx = i * 2
        mlp.append({
            "weight": jnp.asarray(get(f"readout.{idx}.weight").T, dtype),
            "bias": jnp.asarray(get(f"readout.{idx}.bias"), dtype),
        })
    params["mlp"] = mlp
    return params


# ---------------------------------------------------------------------------
# Stage-0 assembly: base LLM + base CLIP + fresh multimodal modules
# ---------------------------------------------------------------------------

def load_mm_projector(path: str, config: TraceConfig, *, dtype=jnp.bfloat16) -> dict:
    """Standalone mm_projector.bin / dir -> connector params (reference
    builder.py:48-62 load_mm_projector).  Keys may or may not carry the
    'model.mm_projector.' prefix depending on how the stage-1 run saved."""
    sd = load_checkpoint_tensors(path)
    if not any(k.startswith("model.mm_projector.") for k in sd):
        sd = {f"model.mm_projector.{k}": v for k, v in sd.items()}
    if config.mm_projector_type == "spatial_slot":
        return convert_spatial_slot(sd, dtype=dtype)
    return _convert_generic_projector(sd, config, dtype=dtype)


def build_from_base_models(
    llm_path: str,
    vision_path: str,
    *,
    mm_projector_path: str | None = None,
    dtype=jnp.bfloat16,
    seed: int = 0,
    **config_overrides,
) -> tuple:
    """Assemble a fresh TRACE model for stage-1 pretraining: base HF LLM
    decoder + base CLIP tower + newly initialized connector, time/score/sync
    towers and auxiliary heads (reference trace_arch.py:60-186
    initialize_vision/time/score_modules + trace_mistral.py:85-96).

    Returns (params, TraceConfig).  Pass mm_projector_path to resume from a
    stage-1 projector (the reference's --pretrain_mm_mlp_adapter flow).
    """
    import jax

    from trace_tpu.model import connector as connector_lib
    from trace_tpu.model.towers import init_tower_params

    hf_cfg = read_hf_config(llm_path)
    config = trace_config_from_hf(hf_cfg, dtype=dtype, **config_overrides)

    sd = load_checkpoint_tensors(llm_path)
    decoder = convert_mistral_decoder(sd, config.decoder, dtype=dtype)

    # fresh auxiliary heads: the converter zero-fills missing heads, but a
    # trainable stage-0 wants the reference's fresh-linear behavior
    key = jax.random.PRNGKey(seed)
    kh, kc, kt = jax.random.split(key, 3)
    D = config.decoder.hidden_size
    for name, width, k in (
        ("sync_head", 1, 0),
        ("time_head", config.decoder.time_vocab_size, 1),
        ("score_head", config.decoder.score_vocab_size, 2),
    ):
        if float(jnp.abs(decoder[name]).max()) == 0.0:
            decoder[name] = (
                jax.random.normal(jax.random.fold_in(kh, k), (D, width)) * 0.02
            ).astype(dtype)

    vision_sd = load_checkpoint_tensors(vision_path)
    vision = convert_clip_vision(
        vision_sd, config.vision, prefix="vision_model.", dtype=dtype
    )

    if mm_projector_path is not None:
        connector = load_mm_projector(mm_projector_path, config, dtype=dtype)
    else:
        init_conn, _ = connector_lib.build_connector(config.mm_projector_type)
        if config.mm_projector_type in ("spatial_slot", "slot"):
            connector = init_conn(
                kc, config.vision.hidden_size, config.decoder.hidden_size,
                num_slots=config.num_slots, dtype=dtype,
            )
        else:
            connector = init_conn(
                kc, config.vision.hidden_size, config.decoder.hidden_size,
                dtype=dtype,
            )

    params = {
        "decoder": decoder,
        "vision": vision,
        "connector": connector,
        "towers": init_tower_params(kt, D, dtype=dtype),
    }
    return params, config
