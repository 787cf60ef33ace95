"""Orbax checkpoint save / restore-latest / auto-resume."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from trace_tpu.checkpoint.io import CheckpointManager
from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import init_decoder_params


def test_save_restore_roundtrip(tmp_path):
    cfg = DecoderConfig.tiny()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    mgr = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    assert mgr.latest_step() is None

    mgr.save(10, params, opt_state)
    mgr.save(20, params, opt_state)
    assert mgr.latest_step() == 20

    # restore into zeroed templates
    zeros = jax.tree.map(jnp.zeros_like, params)
    zeros_opt = jax.tree.map(jnp.zeros_like, opt_state)
    r_params, r_opt, step = mgr.restore_latest(zeros, zeros_opt)
    assert step == 20
    np.testing.assert_array_equal(
        np.asarray(r_params["embed"]), np.asarray(params["embed"])
    )

    # a fresh manager on the same dir resumes (train_mt.py:1177-1180 parity)
    mgr2 = CheckpointManager(str(tmp_path / "ckpts"))
    assert mgr2.latest_step() == 20


def test_max_to_keep(tmp_path):
    cfg = DecoderConfig.tiny()
    params = {"w": jnp.ones((4,))}
    opt = {"m": jnp.zeros((4,))}
    mgr = CheckpointManager(str(tmp_path / "c"), max_to_keep=2)
    for s in (1, 2, 3):
        mgr.save(s, params, opt)
    assert mgr.latest_step() == 3
    restored = mgr.restore_latest(params, opt)
    assert restored[2] == 3
