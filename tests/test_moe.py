"""MoE block: routing semantics, aux loss, expert-parallel parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trace_tpu.model.moe import MoEConfig, init_moe_mlp_params, moe_aux_loss, moe_mlp

CFG = MoEConfig.tiny_moe()


def _layer0(params):
    return jax.tree.map(lambda a: a[0], params)


def test_output_shape_and_topk():
    params = init_moe_mlp_params(CFG, jax.random.PRNGKey(0))
    lp = _layer0(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, CFG.hidden_size)) * 0.1
    out = moe_mlp(x, lp, CFG)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_single_expert_equals_dense_mlp():
    """With E=1 and top_k=1, the MoE block must equal a plain SwiGLU MLP."""
    cfg = MoEConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32, num_layers=1,
        num_heads=2, num_kv_heads=1, head_dim=8, num_experts=1, top_k=1,
    )
    params = init_moe_mlp_params(cfg, jax.random.PRNGKey(2))
    lp = _layer0(params)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16)) * 0.2
    out = moe_mlp(x, lp, cfg)
    # manual dense SwiGLU with the single expert's weights
    wg, wu, wd = lp["w_gate"][0], lp["w_up"][0], lp["w_down"][0]
    ref = (jax.nn.silu(x @ wg) * (x @ wu)) @ wd
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_aux_loss_balanced_is_one():
    # perfectly uniform router -> aux loss ~= 1.0 (E * E * (1/E) * (1/E))
    params = init_moe_mlp_params(CFG, jax.random.PRNGKey(4))
    lp = _layer0(params)
    lp = dict(lp)
    lp["router"] = jnp.zeros_like(lp["router"])
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, CFG.hidden_size))
    loss = float(moe_aux_loss(x, lp, CFG))
    assert abs(loss - 1.0) < 1e-5


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_expert_parallel_parity():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from trace_tpu.runtime.mesh import build_mesh

    params = init_moe_mlp_params(CFG, jax.random.PRNGKey(6))
    lp = _layer0(params)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, CFG.hidden_size)) * 0.1
    ref = moe_mlp(x, lp, CFG)

    mesh = build_mesh(8)  # model axis 4, experts 4 -> 1 expert/shard
    spec = {
        "router": P(),
        "w_gate": P("model", None, None),
        "w_up": P("model", None, None),
        "w_down": P("model", None, None),
    }
    slp = {
        k: jax.device_put(v, NamedSharding(mesh, spec[k])) for k, v in lp.items()
    }
    with mesh:
        out = jax.jit(lambda xx, pp: moe_mlp(xx, pp, CFG))(x, slp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)
