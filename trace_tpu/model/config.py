"""Model configuration for the TRACE-TPU stack."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from trace_tpu.constants import (
    NUM_SLOTS_PER_FRAME,
    SCORE_VOCAB_SIZE,
    TEXT_VOCAB_SIZE,
    TIME_VOCAB_SIZE,
)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Mistral-7B decoder hyperparameters (HF mistralai/Mistral-7B defaults).

    TRACE adds the three auxiliary output heads (sync/time/score) on top
    (reference: trace_mistral.py:85-96).
    """

    vocab_size: int = TEXT_VOCAB_SIZE
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    time_vocab_size: int = TIME_VOCAB_SIZE
    score_vocab_size: int = SCORE_VOCAB_SIZE
    # Mistral v0.1 sliding_window=4096 never binds at TRACE's <=4096 context;
    # attention is plain causal here (documented divergence).
    max_seq_len: int = 4096
    # qwen2-style attention q/k/v biases (train_mt.py:948-1011 selects among
    # vicuna/qwen2/mistral backbones; vicuna/llama = MHA, qwen2 adds biases)
    attn_qkv_bias: bool = False
    # LoRA adapters on the attention/MLP projections (reference --lora_enable,
    # train_mt.py:1017-1050). 0 = off.
    lora_r: int = 0
    lora_alpha: float = 16.0
    # KV cache storage: 'bf16' (exact) or 'int8' (per-slot-per-head scales;
    # halves cache HBM — relevant for batch>=16 decoding)
    kv_cache_dtype: str = "bf16"
    # W8A8: dynamic per-token int8 activation quantization for multi-token
    # (prefill) forwards when weights are int8 — true s8 x s8 MXU dots
    # (~2x bf16 peak on v5e) instead of convert(int8)->bf16 dequant dots.
    # Decode (T=1, weight-bandwidth-bound) always stays weight-only.
    act_quant: bool = False
    # Route single-token cache attention through the Pallas decode kernel.
    # GSPMD-sharded (multi-chip) generation disables it: XLA cannot
    # partition the custom call, while its own attention partitions over
    # the sharded head axis naturally.
    use_decode_kernel: bool = True

    @property
    def combined_vocab_size(self) -> int:
        return self.vocab_size + 1 + self.time_vocab_size + self.score_vocab_size

    @classmethod
    def mistral_7b(cls) -> "DecoderConfig":
        return cls()

    @classmethod
    def vicuna_7b(cls) -> "DecoderConfig":
        """Llama-2-7b-class backbone: MHA (32 kv heads), 11008 FFN, 32k vocab."""
        return cls(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
            rope_theta=10000.0, rms_eps=1e-5,
        )

    @classmethod
    def qwen2_7b(cls) -> "DecoderConfig":
        """Qwen2-7B-class backbone: GQA 28/4, QKV biases, larger vocab."""
        return cls(
            vocab_size=152064, hidden_size=3584, intermediate_size=18944,
            num_layers=28, num_heads=28, num_kv_heads=4, head_dim=128,
            rope_theta=1000000.0, rms_eps=1e-6, attn_qkv_bias=True,
        )

    @classmethod
    def tiny(cls, vocab_size: int = 384) -> "DecoderConfig":
        """Small config for CPU tests. vocab_size>=259 fits ByteTokenizer."""
        return cls(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=16,
            max_seq_len=512,
        )


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """CLIP ViT-L/14-336 (reference: clip_encoder.py, HF openai/clip-vit-large-patch14-336)."""

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    patch_size: int = 14
    image_size: int = 336
    layer_eps: float = 1e-5
    # hidden-states tap: -2 == output of layer num_layers-2 (pre-final layer),
    # CLS dropped (reference: clip_encoder.py:31-39, mm_vision_select_layer=-2)
    select_layer: int = -2
    select_feature: str = "patch"
    # W8A8 activation quantization for int8 ViT weights (see DecoderConfig)
    act_quant: bool = False

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patches_per_side ** 2

    @classmethod
    def tiny(cls) -> "VisionConfig":
        return cls(
            hidden_size=32,
            intermediate_size=64,
            num_layers=3,
            num_heads=2,
            patch_size=14,
            image_size=56,
        )


@dataclasses.dataclass(frozen=True)
class TraceConfig:
    """Full multimodal model: vision tower + connector + decoder + towers."""

    decoder: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)
    vision: VisionConfig = dataclasses.field(default_factory=VisionConfig)
    mm_projector_type: str = "spatial_slot"
    num_slots: int = NUM_SLOTS_PER_FRAME
    num_frames: int = 128
    image_aspect_ratio: str = "pad"
    dtype: jnp.dtype = jnp.bfloat16
    # ViT frames per sequential chunk: bounds attention buffers and (measured
    # on v5e) 16 is also the fastest config — 320 f/s vs 268 at chunk 128.
    # 0 = single batch.
    vit_chunk_size: int = 16
    # Frame upload wire format: 'rgb' (uint8, exact) or 'yuv420' (half the
    # host->device bytes; fidelity-neutral for H.264 sources, which are 4:2:0
    # already — ~0.5% mean pixel error for true-RGB inputs).
    upload_format: str = "rgb"

    @classmethod
    def tiny(cls) -> "TraceConfig":
        return cls(
            decoder=DecoderConfig.tiny(),
            vision=VisionConfig.tiny(),
            num_slots=4,
            num_frames=4,
            dtype=jnp.float32,
        )


def param_dtype(config) -> jnp.dtype:
    return getattr(config, "dtype", jnp.bfloat16)
