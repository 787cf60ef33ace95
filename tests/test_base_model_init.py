"""Stage-0 assembly: base HF LLM + base CLIP + fresh multimodal modules
(reference trace_arch.py:60-186 initialize_*_modules)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from trace_tpu.checkpoint.convert import build_from_base_models, load_mm_projector
from trace_tpu.model.config import VisionConfig


@pytest.fixture(scope="module")
def base_dirs(tmp_path_factory):
    from transformers import (
        CLIPVisionConfig,
        CLIPVisionModel,
        MistralConfig,
        MistralForCausalLM,
    )

    root = tmp_path_factory.mktemp("bases")
    llm_cfg = MistralConfig(
        vocab_size=384, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, rms_norm_eps=1e-5,
        sliding_window=None, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    MistralForCausalLM(llm_cfg).save_pretrained(root / "llm")

    clip_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=56, patch_size=14,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(1)
    CLIPVisionModel(clip_cfg).save_pretrained(root / "clip")
    return str(root / "llm"), str(root / "clip")


def test_assembles_and_runs(base_dirs):
    llm, clip = base_dirs
    params, config = build_from_base_models(
        llm, clip, vision=VisionConfig.tiny(), dtype=jnp.float32, num_frames=2,
    )
    assert set(params) == {"decoder", "vision", "connector", "towers"}
    # fresh (non-zero) auxiliary heads for trainability
    for h in ("sync_head", "time_head", "score_head"):
        assert float(jnp.abs(params["decoder"][h]).max()) > 0.0

    from trace_tpu.model.trace_model import encode_video, forward_train

    B, T, S = 1, config.num_frames, config.vision.image_size
    frames = jnp.zeros((B, T, S, S, 3), jnp.float32)
    fids = jnp.zeros((B, T, 6), jnp.int32)
    feats = encode_video(params, config, frames, fids)
    assert feats.shape[0] == B and np.isfinite(np.asarray(feats)).all()


def test_mm_projector_resume(base_dirs, tmp_path):
    """--pretrain_mm_mlp_adapter flow: save a projector, resume from it."""
    llm, clip = base_dirs
    params, config = build_from_base_models(
        llm, clip, vision=VisionConfig.tiny(), dtype=jnp.float32,
    )

    # serialize the connector the way a stage-1 run would: a torch bin of
    # the reference's SpatialSlotPool key names (builder.py:411-424)
    conn = params["connector"]
    sd = {
        "model.mm_projector.slots": torch.tensor(np.asarray(conn["slots"], np.float32)),
        "model.mm_projector.ln_vision.weight": torch.tensor(np.asarray(conn["ln_scale"], np.float32)),
        "model.mm_projector.ln_vision.bias": torch.tensor(np.asarray(conn["ln_bias"], np.float32)),
        "model.mm_projector.readout.weight": torch.tensor(np.asarray(conn["readout"], np.float32).T),
    }
    torch.save(sd, tmp_path / "mm_projector.bin")

    restored = load_mm_projector(
        str(tmp_path / "mm_projector.bin"), config, dtype=jnp.float32
    )

    def leaves(t):
        return jnp.concatenate([x.ravel() for x in jax.tree.leaves(t)])

    import jax

    np.testing.assert_allclose(
        np.asarray(leaves(restored)), np.asarray(leaves(conn)), rtol=1e-6, atol=1e-6
    )
