"""Mixtral family: sparse-vs-dense MoE parity + HF checkpoint conversion
logit parity (reference model-zoo routing, train_mt.py:948-1011)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trace_tpu.model.moe import MoEConfig, init_moe_mlp_params, moe_mlp

torch = pytest.importorskip("torch")


class TestSparseMoE:
    def test_sparse_matches_dense_without_drops(self):
        """At capacity_factor >= E/k no token can overflow, so the sparse
        dispatch must equal the dense mixture."""
        cfg = MoEConfig.tiny_moe()
        dense = dataclasses.replace(cfg, moe_impl="dense")
        # C = N*k*cf/E with cf=E/k gives C=N: nothing can drop
        sparse = dataclasses.replace(
            cfg, moe_impl="sparse",
            capacity_factor=cfg.num_experts / cfg.top_k,
        )
        lp = jax.tree.map(
            lambda a: a[0], init_moe_mlp_params(cfg, jax.random.PRNGKey(0))
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.hidden_size)) * 0.5
        a = moe_mlp(x, lp, dense)
        b = moe_mlp(x, lp, sparse)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_sparse_drops_overflow(self):
        """A tiny capacity drops contributions instead of crashing."""
        cfg = dataclasses.replace(
            MoEConfig.tiny_moe(), moe_impl="sparse", capacity_factor=0.25
        )
        lp = jax.tree.map(
            lambda a: a[0], init_moe_mlp_params(cfg, jax.random.PRNGKey(0))
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.hidden_size)) * 0.5
        out = moe_mlp(x, lp, cfg)
        assert np.isfinite(np.asarray(out)).all()

    def test_sparse_is_differentiable(self):
        cfg = dataclasses.replace(MoEConfig.tiny_moe(), moe_impl="sparse")
        params = init_moe_mlp_params(cfg, jax.random.PRNGKey(0))
        lp = jax.tree.map(lambda a: a[0], params)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, cfg.hidden_size))

        def loss(p):
            return jnp.sum(moe_mlp(x, p, cfg) ** 2)

        g = jax.grad(loss)(lp)
        assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))
        assert float(jnp.abs(g["w_gate"]).sum()) > 0


class TestMixtralConversion:
    def _tiny_hf(self):
        from transformers import MixtralConfig, MixtralForCausalLM

        hf_cfg = MixtralConfig(
            vocab_size=384, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, rms_norm_eps=1e-5, max_position_embeddings=256,
            num_local_experts=4, num_experts_per_tok=2,
            attention_dropout=0.0, tie_word_embeddings=False,
            output_router_logits=False, sliding_window=None,
            rope_theta=10000.0,
        )
        torch.manual_seed(0)
        return MixtralForCausalLM(hf_cfg).eval()

    def test_logit_parity(self):
        from trace_tpu.checkpoint.convert import convert_mixtral_decoder
        from trace_tpu.model.mistral import compute_logits, decoder_forward

        hf = self._tiny_hf()
        # dense mixture = HF's exact per-token expert loop; sparse tested
        # against dense above
        cfg = MoEConfig(
            vocab_size=384, hidden_size=64, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            max_seq_len=256, num_experts=4, top_k=2, moe_impl="dense",
        )
        sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
        params = convert_mixtral_decoder(sd, cfg)

        rng = np.random.default_rng(0)
        B, T = 2, 9
        ids = rng.integers(0, cfg.vocab_size, size=(B, T))
        with torch.no_grad():
            hf_logits = hf(torch.tensor(ids)).logits.numpy()
        embeds = params["embed"][jnp.asarray(ids)]
        hidden, _ = decoder_forward(
            params, cfg, embeds, jnp.ones((B, T), bool),
            jnp.broadcast_to(jnp.arange(T), (B, T)),
        )
        logits = np.asarray(compute_logits(params, hidden))[..., : cfg.vocab_size]
        np.testing.assert_allclose(logits, hf_logits, rtol=3e-4, atol=3e-4)

    def test_config_detection(self):
        from trace_tpu.checkpoint.convert import trace_config_from_hf

        cfg = trace_config_from_hf({
            "model_type": "mixtral", "vocab_size": 384, "hidden_size": 64,
            "intermediate_size": 96, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 16, "num_local_experts": 4, "num_experts_per_tok": 2,
        })
        assert isinstance(cfg.decoder, MoEConfig)
        assert cfg.decoder.num_experts == 4 and cfg.decoder.top_k == 2
