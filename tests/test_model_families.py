"""Backbone family parity: llama/vicuna (MHA) and qwen2 (QKV-bias) vs HF."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from trace_tpu.checkpoint.convert import convert_mistral_decoder
from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import compute_logits, decoder_forward


def _to_numpy_sd(module):
    return {k: v.detach().float().numpy() for k, v in module.state_dict().items()}


def _run_parity(hf_model, cfg):
    params = convert_mistral_decoder(_to_numpy_sd(hf_model), cfg)
    B, T = 2, 9
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.numpy()
    embeds = params["embed"][jnp.asarray(ids)]
    hidden, _ = decoder_forward(
        params, cfg, embeds, jnp.ones((B, T), bool),
        jnp.broadcast_to(jnp.arange(T), (B, T)),
    )
    logits = np.asarray(compute_logits(params, hidden))[..., : cfg.vocab_size]
    np.testing.assert_allclose(logits, hf_logits, rtol=3e-4, atol=3e-4)


def test_llama_mha_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = DecoderConfig(
        vocab_size=384, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
        rms_eps=1e-5, max_seq_len=256,
    )
    hf_cfg = LlamaConfig(
        vocab_size=384, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        head_dim=16, rms_norm_eps=1e-5, max_position_embeddings=256,
        attention_dropout=0.0, tie_word_embeddings=False, attention_bias=False,
    )
    torch.manual_seed(0)
    _run_parity(LlamaForCausalLM(hf_cfg).eval(), cfg)


def test_qwen2_bias_parity():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = DecoderConfig(
        vocab_size=384, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        rms_eps=1e-6, max_seq_len=256, attn_qkv_bias=True,
    )
    hf_cfg = Qwen2Config(
        vocab_size=384, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rms_norm_eps=1e-6, max_position_embeddings=256,
        attention_dropout=0.0, tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    # random (nonzero) biases so the bias path is actually exercised
    with torch.no_grad():
        for layer in model.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.normal_(0, 0.1)
    _run_parity(model, cfg)
