"""GPipe pipeline-parallel decoder vs the sequential forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import decoder_forward, init_decoder_params
from trace_tpu.parallel.pipeline import build_pp_mesh, pp_decoder_forward

CFG = dataclasses.replace(DecoderConfig.tiny(), num_layers=4)


@pytest.mark.parametrize("stages,micro", [(4, 2), (2, 4), (1, 2)])
def test_matches_sequential(stages, micro):
    if len(jax.devices()) < stages:
        pytest.skip("not enough devices")
    params = init_decoder_params(CFG, jax.random.PRNGKey(0))
    B, T = 4, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, CFG.hidden_size)) * 0.1
    mask = jnp.ones((B, T), bool).at[0, -3:].set(False)
    pos = jnp.maximum(jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1, 0)

    want, _ = decoder_forward(params, CFG, x, mask, pos)

    mesh = build_pp_mesh(stages)
    got = pp_decoder_forward(
        params, CFG, x, mask, pos, mesh=mesh, num_microbatches=micro
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_jit_compiles_with_dp_composition():
    """PP under jit; stage mesh built over a subset of the 8 CPU devices."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    params = init_decoder_params(CFG, jax.random.PRNGKey(2))
    B, T = 8, 8
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, CFG.hidden_size)) * 0.1
    mask = jnp.ones((B, T), bool)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))
    mesh = build_pp_mesh(4)

    @jax.jit
    def run(p, x):
        return pp_decoder_forward(p, CFG, x, mask, pos, mesh=mesh, num_microbatches=4)

    got = run(params, x)
    want, _ = decoder_forward(params, CFG, x, mask, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


class TestPPTraining:
    def test_pp_train_step_matches_sequential(self):
        """A GPipe train step (loss + grads through ppermute/psum, remat on)
        must match the plain decoder_forward step."""
        import dataclasses

        import optax

        from trace_tpu.model.config import TraceConfig, DecoderConfig, VisionConfig
        from trace_tpu.model.trace_model import forward_train, init_trace_params
        from trace_tpu.parallel.pipeline import build_pp_mesh
        from trace_tpu.train.train import make_train_step

        cfg = TraceConfig(
            decoder=dataclasses.replace(DecoderConfig.tiny(), num_layers=4),
            vision=VisionConfig.tiny(),
            num_slots=4, num_frames=4, dtype=jnp.float32,
        )
        params = init_trace_params(cfg, jax.random.PRNGKey(0))

        rng = np.random.default_rng(0)
        T = cfg.num_frames
        from trace_tpu.model.trace_model import tokens_per_frame

        n_video = T * tokens_per_frame(cfg)
        L = n_video + 16
        B = 4
        ids = rng.integers(0, cfg.decoder.vocab_size, size=(B, L)).astype(np.int32)
        labels = ids.copy()
        labels[:, : n_video + 4] = -100
        batch = {
            "frames": jnp.asarray(rng.normal(size=(B, T, 56, 56, 3)), jnp.float32),
            "frame_time_ids": jnp.asarray(rng.integers(2, 12, (B, T, 6)), jnp.int32),
            "token_ids": jnp.asarray(ids),
            "video_pos": jnp.full((B,), 2, jnp.int32),
            "attn_mask": jnp.ones((B, L), bool),
            "labels": jnp.asarray(labels),
            "time_labels": jnp.full((B, L), -100, jnp.int32),
            "score_labels": jnp.full((B, L), -100, jnp.int32),
        }

        mesh = build_pp_mesh(4)
        tx = optax.sgd(1e-2)
        opt = jax.jit(tx.init)(params)

        seq_step = jax.jit(make_train_step(cfg, tx, remat=False, use_flash=False))
        pp_step = jax.jit(make_train_step(
            cfg, tx, remat=True, pp_mesh=mesh, pp_microbatches=2,
        ))

        p1, _, m1 = seq_step(params, opt, batch)
        p2, _, m2 = pp_step(params, opt, batch)
        assert np.isclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
        # updated params (i.e. grads) match across the two schedules
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=5e-4, atol=5e-5,
            )
