"""Numerical parity of the JAX model vs HF torch modules via the converter.

Randomly-initialized tiny HF models are converted with the checkpoint
converter and compared logit-level — validating both the weight-layout
contracts and the model numerics without any downloaded assets.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from trace_tpu.checkpoint.convert import (
    _convert_generic_projector,
    convert_clip_vision,
    convert_mistral_decoder,
    convert_spatial_slot,
    convert_spatial_time_slot,
)
from trace_tpu.model.config import DecoderConfig, VisionConfig
from trace_tpu.model.mistral import compute_logits, decoder_forward
from trace_tpu.model.vit import vit_forward
from trace_tpu.model.connector import (
    slot_forward,
    spatial_slot_forward,
    spatial_time_slot_forward,
)


def _torch_rope(x, positions, dim):
    """Reference SlotRotaryEmbedding + apply_rotary_pos_emb (builder.py:
    289-359): interleaved-half rotation at arbitrary position ids."""
    inv = 1.0 / (10000.0 ** (torch.arange(0, dim, 2).float() / dim))
    freqs = torch.outer(positions.float(), inv)
    emb = torch.cat([freqs, freqs], dim=-1)
    cos, sin = emb.cos(), emb.sin()
    x1, x2 = x[..., : dim // 2], x[..., dim // 2 :]
    rot = torch.cat([-x2, x1], dim=-1)
    return x * cos + rot * sin


def _to_numpy_sd(module):
    return {k: v.detach().float().numpy() for k, v in module.state_dict().items()}


class TestMistralParity:
    @pytest.fixture(scope="class")
    def setup(self):
        from transformers import MistralConfig, MistralForCausalLM

        hf_cfg = MistralConfig(
            vocab_size=384,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            max_position_embeddings=512,
            rope_theta=10000.0,
            rms_norm_eps=1e-5,  # matches DecoderConfig.tiny / real TRACE ckpt
            sliding_window=None,
            attention_dropout=0.0,
            tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        hf_model = MistralForCausalLM(hf_cfg).eval()
        cfg = DecoderConfig.tiny()
        params = convert_mistral_decoder(_to_numpy_sd(hf_model), cfg)
        return hf_model, cfg, params

    def test_logits_match(self, setup):
        hf_model, cfg, params = setup
        B, T = 2, 10
        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, size=(B, T))

        with torch.no_grad():
            hf_logits = hf_model(torch.tensor(ids)).logits.numpy()

        embeds = params["embed"][jnp.asarray(ids)]
        mask = jnp.ones((B, T), bool)
        pos = jnp.broadcast_to(jnp.arange(T), (B, T))
        hidden, _ = decoder_forward(params, cfg, embeds, mask, pos)
        logits = np.asarray(compute_logits(params, hidden))[..., : cfg.vocab_size]

        np.testing.assert_allclose(logits, hf_logits, rtol=2e-4, atol=2e-4)


class TestClipParity:
    @pytest.fixture(scope="class")
    def setup(self):
        from transformers import CLIPVisionConfig, CLIPVisionModel

        hf_cfg = CLIPVisionConfig(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=3,
            num_attention_heads=2,
            image_size=56,
            patch_size=14,
            hidden_act="quick_gelu",
        )
        torch.manual_seed(1)
        hf_model = CLIPVisionModel(hf_cfg).eval()
        cfg = VisionConfig.tiny()
        params = convert_clip_vision(_to_numpy_sd(hf_model), cfg)
        return hf_model, cfg, params

    def test_patch_features_match_tap_minus2(self, setup):
        hf_model, cfg, params = setup
        B = 2
        rng = np.random.default_rng(2)
        images = rng.normal(size=(B, 3, cfg.image_size, cfg.image_size)).astype(np.float32)

        with torch.no_grad():
            out = hf_model(torch.tensor(images), output_hidden_states=True)
        # reference feature_select: hidden_states[-2][:, 1:]
        hf_feats = out.hidden_states[-2][:, 1:].numpy()

        images_jax = jnp.asarray(images.transpose(0, 2, 3, 1))  # NHWC
        feats = np.asarray(vit_forward(params, cfg, images_jax))

        np.testing.assert_allclose(feats, hf_feats, rtol=2e-4, atol=2e-4)


class TestSpatialSlotParity:
    def test_matches_torch_reference_math(self):
        """Compare against a torch re-statement of SpatialSlotPool.forward
        (builder.py:427-467): LN -> RoPE over patch positions -> softmax slot
        pool -> linear readout."""
        mm, lm, S, B, T, N = 32, 48, 4, 2, 3, 16
        torch.manual_seed(3)
        slots = torch.randn(mm, S)
        ln = torch.nn.LayerNorm(mm)
        readout = torch.nn.Linear(mm, lm, bias=False)

        x = torch.randn(B, T, N, mm)

        def torch_rope(x, n, dim):
            inv = 1.0 / (10000.0 ** (torch.arange(0, dim, 2).float() / dim))
            t = torch.arange(n).float()
            freqs = torch.outer(t, inv)
            emb = torch.cat([freqs, freqs], dim=-1)
            cos, sin = emb.cos(), emb.sin()
            x1, x2 = x[..., : dim // 2], x[..., dim // 2 :]
            rot = torch.cat([-x2, x1], dim=-1)
            return x * cos + rot * sin

        with torch.no_grad():
            h = x.reshape(B * T, N, mm)
            h = ln(h)
            h = torch_rope(h, N, mm)
            logits = torch.softmax(h @ slots, dim=1)
            pooled = (h.permute(0, 2, 1) @ logits).permute(0, 2, 1)
            expected = readout(pooled).reshape(B, T, S, lm).numpy()

        params = {
            "slots": jnp.asarray(slots.numpy()),
            "ln_scale": jnp.asarray(ln.weight.detach().numpy()),
            "ln_bias": jnp.asarray(ln.bias.detach().numpy()),
            "readout": jnp.asarray(readout.weight.detach().numpy().T),
        }
        got = np.asarray(spatial_slot_forward(params, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)

    def test_converter_key_map(self):
        mm, S, lm = 16, 4, 24
        sd = {
            "model.mm_projector.slots": np.random.randn(mm, S).astype(np.float32),
            "model.mm_projector.ln_vision.weight": np.ones(mm, np.float32),
            "model.mm_projector.ln_vision.bias": np.zeros(mm, np.float32),
            "model.mm_projector.readout.weight": np.random.randn(lm, mm).astype(np.float32),
        }
        p = convert_spatial_slot(sd)
        assert p["slots"].shape == (mm, S)
        assert p["readout"].shape == (mm, lm)


class TestSlotPoolParity:
    """Global SlotPool (builder.py:361-407): LN over the flattened T*N
    stream, RoPE at frame-index positions, softmax slot pool, readout."""

    def _torch_forward(self, x, slots, ln, readout):
        B, T, N, mm = x.shape
        with torch.no_grad():
            h = x.reshape(B, T * N, mm)
            h = ln(h)
            positions = torch.repeat_interleave(torch.arange(T), N)
            h = _torch_rope(h, positions, mm)
            logits = torch.softmax(h @ slots, dim=1)
            pooled = (h.permute(0, 2, 1) @ logits).permute(0, 2, 1)
            return readout(pooled).numpy()

    def test_matches_torch_reference_math(self):
        mm, lm, S, B, T, N = 32, 48, 6, 2, 3, 16
        torch.manual_seed(5)
        slots = torch.randn(mm, S)
        ln = torch.nn.LayerNorm(mm)
        readout = torch.nn.Linear(mm, lm, bias=False)
        x = torch.randn(B, T, N, mm)
        expected = self._torch_forward(x, slots, ln, readout)

        sd = {
            "model.mm_projector.slots": slots.numpy(),
            "model.mm_projector.ln_vision.weight": ln.weight.detach().numpy(),
            "model.mm_projector.ln_vision.bias": ln.bias.detach().numpy(),
            "model.mm_projector.readout.weight": readout.weight.detach().numpy(),
        }

        class _Cfg:
            mm_projector_type = "slot"

        params = _convert_generic_projector(sd, _Cfg())
        got = np.asarray(slot_forward(params, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


class TestSpatialTimeSlotParity:
    """SpatialTimeSlotPool (builder.py:469-549): LN+RoPE+spatial-slot-pool
    on the image split through the readout; raw RoPE+time-slot-pool on the
    time split; concat on the slot axis.  mm == lm so the torch concat is
    well-formed (the module was never run with mm != lm — its concat would
    raise; our forward projects the time part in that case)."""

    def test_matches_torch_reference_math(self):
        mm = lm = 32
        Ss, St, B, T, N, image_dim = 4, 2, 2, 3, 20, 12
        torch.manual_seed(7)
        spatial_slots = torch.randn(mm, Ss)
        time_slots = torch.randn(mm, St)
        ln = torch.nn.LayerNorm(mm)
        readout = torch.nn.Linear(mm, lm, bias=False)
        x = torch.randn(B, T, N, mm)

        with torch.no_grad():
            h = x.reshape(B * T, N, mm)
            img, tim = h[:, :image_dim], h[:, image_dim:]
            img = ln(img)
            img = _torch_rope(img, torch.arange(image_dim), mm)
            il = torch.softmax(img @ spatial_slots, dim=1)
            img_out = (img.permute(0, 2, 1) @ il).permute(0, 2, 1)
            img_out = readout(img_out).reshape(B, T, Ss, lm)

            tim = _torch_rope(tim, torch.arange(N - image_dim), mm)
            tl = torch.softmax(tim @ time_slots, dim=1)
            tim_out = (tim.permute(0, 2, 1) @ tl).permute(0, 2, 1)
            tim_out = tim_out.reshape(B, T, St, mm)
            expected = torch.cat([img_out, tim_out], dim=2).numpy()

        sd = {
            "model.mm_projector.spatial_slots": spatial_slots.numpy(),
            "model.mm_projector.time_slots": time_slots.numpy(),
            "model.mm_projector.ln_vision.weight": ln.weight.detach().numpy(),
            "model.mm_projector.ln_vision.bias": ln.bias.detach().numpy(),
            "model.mm_projector.readout.weight": readout.weight.detach().numpy(),
        }
        params = convert_spatial_time_slot(sd)
        got = np.asarray(
            spatial_time_slot_forward(params, jnp.asarray(x.numpy()), image_dim=image_dim)
        )
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)

    def test_routes_via_generic_projector(self):
        mm, lm = 8, 8
        sd = {
            "model.mm_projector.spatial_slots": np.random.randn(mm, 2).astype(np.float32),
            "model.mm_projector.time_slots": np.random.randn(mm, 1).astype(np.float32),
            "model.mm_projector.ln_vision.weight": np.ones(mm, np.float32),
            "model.mm_projector.ln_vision.bias": np.zeros(mm, np.float32),
            "model.mm_projector.readout.weight": np.random.randn(lm, mm).astype(np.float32),
        }

        class _Cfg:
            mm_projector_type = "spatial_time_slot"

        p = _convert_generic_projector(sd, _Cfg())
        assert set(p) == {"spatial_slots", "time_slots", "ln_scale", "ln_bias", "readout"}
        assert p["readout"].shape == (mm, lm)
