"""Connector registry: shapes and downsampling factors for every type."""

import jax
import jax.numpy as jnp
import pytest

from trace_tpu.model.connector import build_connector


@pytest.mark.parametrize("ptype,out_shape", [
    ("spatial_slot", (2, 3, 4, 48)),   # per-frame slots [B, T, S, D]
    ("slot", (2, 16, 48)),             # global slots [B, S, D]
    ("linear", (2, 36, 48)),           # frame-mean pooled [B, N, D]
    ("mlp2x_gelu", (2, 36, 48)),
])
def test_output_shapes(ptype, out_shape):
    B, T, N, mm, lm = 2, 3, 36, 32, 48
    init, fwd = build_connector(ptype)
    if ptype == "spatial_slot":
        params = init(jax.random.PRNGKey(0), mm, lm, num_slots=4)
    elif ptype == "slot":
        params = init(jax.random.PRNGKey(0), mm, lm, num_slots=16)
    else:
        params = init(jax.random.PRNGKey(0), mm, lm)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, N, mm))
    assert fwd(params, x).shape == out_shape


# Expected token counts = torch Conv3d/AvgPool3d output shapes on a
# t=4, 6x6 grid (verified against torch.nn directly):
#   stc     k=s=(2,2,2) pad 1 -> (3,4,4); v35 pad 0 -> (2,3,3)
#   stp     AvgPool3d (2,2,2) -> (2,3,3)
#   sp_conv k=s=(1,2,2) pad 1 -> (6,4,4); sp_pool (1,2,2) -> (4,3,3)
@pytest.mark.parametrize("ptype,T,expected_tokens", [
    ("stc_connector", 4, 3 * 4 * 4),
    ("stc_connector_v35", 4, 2 * 3 * 3),
    ("stp_connector", 4, 2 * 3 * 3),
    ("spatial_conv", 4, 6 * 4 * 4),
    ("spatial_pool", 4, 4 * 3 * 3),
])
def test_stc_family_shapes(ptype, T, expected_tokens):
    B, N, mm, lm = 1, 36, 16, 24  # 6x6 grid
    init, fwd = build_connector(ptype)
    params = init(jax.random.PRNGKey(0), mm, lm)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, N, mm))
    out = fwd(params, x)
    assert out.shape == (B, expected_tokens, lm), (ptype, out.shape)


def test_identity():
    init, fwd = build_connector("identity")
    x = jnp.ones((1, 2, 3, 4))
    assert (fwd(init(jax.random.PRNGKey(0), 4, 4), x) == x).all()


def test_fused_qkv_matches_unfused():
    """Serving-time fused [D,3D] QKV must be numerically identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from trace_tpu.model.config import VisionConfig
    from trace_tpu.model.vit import fuse_vision_qkv, init_vit_params, vit_forward

    cfg = VisionConfig.tiny()
    params = init_vit_params(cfg, jax.random.PRNGKey(0))
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.image_size, cfg.image_size, 3))
    want = vit_forward(params, cfg, imgs)
    fused = fuse_vision_qkv(params)
    assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
    got = vit_forward(fused, cfg, imgs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
    # idempotent + leaves quantized trees alone
    assert fuse_vision_qkv(fused) is fused or "wqkv" in fuse_vision_qkv(fused)["layers"]
