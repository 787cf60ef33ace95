"""Multi-device sharding: parity of sharded vs single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trace_tpu.model.config import TraceConfig
from trace_tpu.model.mistral import compute_logits, decoder_forward
from trace_tpu.model.trace_model import forward_train, init_trace_params
from trace_tpu.runtime.mesh import build_mesh, param_shardings, shard_batch, shard_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _batch(cfg, B=2, seed=0):
    import sys

    sys.path.insert(0, "tests")
    from test_training import _sample_batch

    from trace_tpu.tokenizers.text import ByteTokenizer
    from trace_tpu.train.train import preprocess_batch_frames

    batch = {k: jnp.asarray(v) for k, v in _sample_batch(ByteTokenizer(), B, seed).items()}
    batch["frames"] = preprocess_batch_frames(batch.pop("frames_u8"), cfg)
    return batch


class TestMesh:
    def test_mesh_shape(self):
        mesh = build_mesh(8)
        assert mesh.shape == {"data": 2, "model": 4}

    def test_param_specs_partition_heads(self):
        cfg = TraceConfig.tiny()
        params = init_trace_params(cfg, jax.random.PRNGKey(0))
        mesh = build_mesh(8)
        shardings = param_shardings(params, mesh)
        wq_spec = shardings["decoder"]["layers"]["wq"].spec
        assert wq_spec == jax.sharding.PartitionSpec(None, None, "model", None)
        # norms replicate
        assert shardings["decoder"]["final_norm"].spec == jax.sharding.PartitionSpec()


class TestShardedParity:
    def test_loss_matches_unsharded(self):
        cfg = TraceConfig.tiny()
        params = init_trace_params(cfg, jax.random.PRNGKey(0))
        batch = _batch(cfg)

        loss_ref, _ = forward_train(params, cfg, batch, remat=False)

        mesh = build_mesh(8)
        sparams = shard_params(params, mesh)
        sbatch = shard_batch(batch, mesh)
        with mesh:
            loss_sharded, _ = jax.jit(
                lambda p, b: forward_train(p, cfg, b, remat=False)
            )(sparams, sbatch)

        np.testing.assert_allclose(
            float(loss_ref), float(loss_sharded), rtol=2e-5, atol=2e-5
        )

    def test_sharded_grads_match(self):
        cfg = TraceConfig.tiny()
        params = init_trace_params(cfg, jax.random.PRNGKey(1))
        batch = _batch(cfg, seed=1)

        def loss_fn(p, b):
            return forward_train(p, cfg, b, remat=False)[0]

        g_ref = jax.grad(loss_fn)(params, batch)

        mesh = build_mesh(8)
        sparams = shard_params(params, mesh)
        sbatch = shard_batch(batch, mesh)
        with mesh:
            g_sh = jax.jit(jax.grad(loss_fn))(sparams, sbatch)

        np.testing.assert_allclose(
            np.asarray(g_ref["connector"]["slots"]),
            np.asarray(g_sh["connector"]["slots"]),
            rtol=5e-4, atol=5e-5,
        )
        np.testing.assert_allclose(
            np.asarray(g_ref["decoder"]["layers"]["wq"]),
            np.asarray(g_sh["decoder"]["layers"]["wq"]),
            rtol=5e-4, atol=5e-5,
        )
