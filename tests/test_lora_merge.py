"""LoRA merge math: W' = W + alpha/r * B @ A with PEFT key conventions."""

import numpy as np

from trace_tpu.checkpoint.loader import merge_lora_weights


def test_merge_matches_manual():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 6)).astype(np.float32)
    a = rng.normal(size=(2, 6)).astype(np.float32)   # [r, in]
    b = rng.normal(size=(8, 2)).astype(np.float32)   # [out, r]
    base = {"model.layers.0.self_attn.q_proj.weight": w.copy()}
    adapter = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": a,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": b,
    }
    merged = merge_lora_weights(base, adapter, lora_alpha=16, lora_r=2)
    np.testing.assert_allclose(
        merged["model.layers.0.self_attn.q_proj.weight"],
        w + 8.0 * (b @ a),
        rtol=1e-6,
    )


def test_untouched_weights_preserved():
    base = {"model.norm.weight": np.ones(4, np.float32)}
    merged = merge_lora_weights(base, {}, 16, 2)
    np.testing.assert_array_equal(merged["model.norm.weight"], base["model.norm.weight"])
