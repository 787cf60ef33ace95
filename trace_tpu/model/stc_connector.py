"""STC/STP connector family: conv-based spatio-temporal downsampling projectors.

Re-implements the reference's alternate connectors (multimodal_projector/
builder.py:138-284): timm RegNet stages around a 3D conv (or avg-pool)
downsampler, followed by an MLP readout.

  stc_connector      s1(depth=4) -> Conv3d k=s=(2,2,2) pad 1 -> s2 -> mlp
  stp_connector      s1          -> AvgPool3d (2,2,2)        -> s2 -> mlp
  stc_connector_v35  s1          -> Conv3d k=s=(2,2,2) pad 0 -> s2 -> mlp
  spatial_conv       depth=0     -> Conv3d k=s=(1,2,2) pad 1       -> mlp
  spatial_pool       depth=0     -> AvgPool3d (1,2,2)              -> mlp

The RegNet stage is a port of ``timm.models.regnet.RegStage`` at the
reference's call signature (builder.py:161-169: stride=1, dilation=1,
act_layer=SiLU, norm_layer=LayerNorm2d), block by block:

  Bottleneck(bottle_ratio=1, group_size=1, se_ratio=0.25):
    conv1: 1x1 ConvNormAct (bias-free conv + LayerNorm2d + SiLU)
    conv2: 3x3 ConvNormAct, groups = bottleneck_chs (group_size=1 makes the
           grouped conv depthwise) + LayerNorm2d + SiLU
    se:    SEModule(rd_channels=round(in_chs*0.25), SiLU, sigmoid gate)
    conv3: 1x1 ConvNormAct, apply_act=False
    residual: + downsample(shortcut) (1x1 conv + LayerNorm2d when
           in_chs != out_chs — block 1 only — else identity), then SiLU

State-dict layout follows timm's naming (b{i}.conv1.conv.weight,
b{i}.conv1.bn.weight, b{i}.se.fc1.weight, b{i}.downsample.conv.weight, ...)
so checkpoint conversion maps keys 1:1 (checkpoint/convert.py
convert_stc_connector).  timm itself is not installable in this
environment; the math is pinned by a handwritten torch replica in
tests/test_stc_parity.py.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from trace_tpu.model.vit import layer_norm

LN_EPS = 1e-6  # timm LayerNorm2d default eps
SE_RATIO = 0.25


@dataclasses.dataclass(frozen=True)
class STCSpec:
    downsample: tuple = (2, 2, 2)  # (t, h, w)
    depth: int = 4
    mlp_depth: int = 2
    sampler: str = "conv"  # 'conv' | 'pool'
    sampler_padding: int = 1


SPECS = {
    "stc_connector": STCSpec(),
    "stp_connector": STCSpec(sampler="pool"),
    "stc_connector_v35": STCSpec(sampler_padding=0),
    "spatial_conv": STCSpec(downsample=(1, 2, 2), depth=0),
    "spatial_pool": STCSpec(downsample=(1, 2, 2), depth=0, sampler="pool"),
}


def _conv_init(key, shape, dtype):
    fan_in = 1
    for s in shape[1:]:
        fan_in *= s
    return (jax.random.normal(key, shape, jnp.float32) * (fan_in ** -0.5)).astype(dtype)


def _init_bottleneck(key, in_ch, out_ch, dtype):
    """timm RegNet Bottleneck params (bottle_ratio=1, group_size=1)."""
    ks = jax.random.split(key, 6)
    rd = int(round(in_ch * SE_RATIO))
    p = {
        "conv1": _conv_init(ks[0], (out_ch, in_ch, 1, 1), dtype),
        "ln1_scale": jnp.ones((out_ch,), dtype),
        "ln1_bias": jnp.zeros((out_ch,), dtype),
        # group_size=1 => groups=out_ch => depthwise 3x3: weight [out, 1, 3, 3]
        "conv2": _conv_init(ks[1], (out_ch, 1, 3, 3), dtype),
        "ln2_scale": jnp.ones((out_ch,), dtype),
        "ln2_bias": jnp.zeros((out_ch,), dtype),
        "se_fc1_w": _conv_init(ks[2], (rd, out_ch, 1, 1), dtype),
        "se_fc1_b": jnp.zeros((rd,), dtype),
        "se_fc2_w": _conv_init(ks[3], (out_ch, rd, 1, 1), dtype),
        "se_fc2_b": jnp.zeros((out_ch,), dtype),
        "conv3": _conv_init(ks[4], (out_ch, out_ch, 1, 1), dtype),
        "ln3_scale": jnp.ones((out_ch,), dtype),
        "ln3_bias": jnp.zeros((out_ch,), dtype),
    }
    if in_ch != out_ch:
        p["down_conv"] = _conv_init(ks[5], (out_ch, in_ch, 1, 1), dtype)
        p["down_ln_scale"] = jnp.ones((out_ch,), dtype)
        p["down_ln_bias"] = jnp.zeros((out_ch,), dtype)
    return p


def init_stc_params(
    key: jax.Array, mm_hidden: int, lm_hidden: int,
    spec: STCSpec, dtype=jnp.float32,
):
    keys = jax.random.split(key, 2 * max(spec.depth, 1) + spec.mlp_depth + 1)
    ki = iter(keys)
    params: dict = {"s1": [], "s2": []}
    in_ch = mm_hidden
    for _ in range(spec.depth):
        params["s1"].append(_init_bottleneck(next(ki), in_ch, lm_hidden, dtype))
        in_ch = lm_hidden
    mid_ch = lm_hidden if spec.depth else mm_hidden
    if spec.sampler == "conv":
        kd, kh, kw = spec.downsample
        params["sampler_w"] = _conv_init(next(ki), (mid_ch, mid_ch, kd, kh, kw), dtype)
        params["sampler_b"] = jnp.zeros((mid_ch,), dtype)
    for _ in range(spec.depth):
        params["s2"].append(_init_bottleneck(next(ki), mid_ch, lm_hidden, dtype))
        mid_ch = lm_hidden
    mlp = []
    d_in = mid_ch
    for _ in range(spec.mlp_depth):
        mlp.append({
            "weight": (jax.random.normal(next(ki), (d_in, lm_hidden), jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((lm_hidden,), dtype),
        })
        d_in = lm_hidden
    params["mlp"] = mlp
    return params


def _ln2d(x, scale, bias):
    """timm LayerNorm2d: normalize the channel axis of NCHW."""
    xt = x.transpose(0, 2, 3, 1)
    xt = layer_norm(xt, scale, bias, LN_EPS)
    return xt.transpose(0, 3, 1, 2)


def _conv2d(x, w, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _bottleneck(x, p):
    """timm RegNet Bottleneck forward (see module docstring). [N,C,H,W]."""
    shortcut = x
    h = jax.nn.silu(_ln2d(_conv2d(x, p["conv1"]), p["ln1_scale"], p["ln1_bias"]))
    groups = h.shape[1]  # depthwise (group_size=1)
    h = jax.nn.silu(
        _ln2d(_conv2d(h, p["conv2"], groups=groups), p["ln2_scale"], p["ln2_bias"])
    )
    # SE: mean-pool -> fc1 -> SiLU -> fc2 -> sigmoid gate
    se = jnp.mean(h, axis=(2, 3), keepdims=True)
    se = jax.nn.silu(_conv2d(se, p["se_fc1_w"]) + p["se_fc1_b"][None, :, None, None])
    se = _conv2d(se, p["se_fc2_w"]) + p["se_fc2_b"][None, :, None, None]
    h = h * jax.nn.sigmoid(se)
    h = _ln2d(_conv2d(h, p["conv3"]), p["ln3_scale"], p["ln3_bias"])
    if "down_conv" in p:
        shortcut = _ln2d(
            _conv2d(shortcut, p["down_conv"]), p["down_ln_scale"], p["down_ln_bias"]
        )
    return jax.nn.silu(h + shortcut)


def stc_forward(params: dict, x: jax.Array, spec: STCSpec) -> jax.Array:
    """x [B, T, N, D_mm] (N = h*w square grid) -> tokens [B, T'*H'*W', D_lm].

    Mirrors STCConnector.forward (builder.py:208-249): per-frame stage 1,
    3-D downsampler over (t, h, w), per-frame stage 2, MLP readout.
    """
    B, T, N, D = x.shape
    hw = int(round(N ** 0.5))
    x = x.reshape(B, T, hw, hw, D).transpose(0, 1, 4, 2, 3)  # [B,T,D,h,w]

    h = x.reshape(B * T, D, hw, hw)
    for blk in params["s1"]:
        h = _bottleneck(h, blk)
    C = h.shape[1]
    h = h.reshape(B, T, C, h.shape[2], h.shape[3]).transpose(0, 2, 1, 3, 4)  # [B,C,T,h,w]

    kd, kh, kw = spec.downsample
    if spec.sampler == "conv":
        pad = spec.sampler_padding
        h = jax.lax.conv_general_dilated(
            h, params["sampler_w"], (kd, kh, kw),
            [(pad, pad)] * 3,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        h = h + params["sampler_b"][None, :, None, None, None]
        h = jax.nn.silu(h)
    else:
        h = jax.lax.reduce_window(
            h, 0.0, jax.lax.add,
            (1, 1, kd, kh, kw), (1, 1, kd, kh, kw), "VALID",
        ) / float(kd * kh * kw)
        h = jax.nn.silu(h)

    B_, C_, T2, H2, W2 = h.shape
    h = h.transpose(0, 2, 1, 3, 4).reshape(B_ * T2, C_, H2, W2)
    for blk in params["s2"]:
        h = _bottleneck(h, blk)
    C3 = h.shape[1]
    h = h.reshape(B_, T2, C3, H2 * W2).transpose(0, 1, 3, 2)  # [B,T2,HW,C]
    h = h.reshape(B_, T2 * H2 * W2, C3)

    for i, layer in enumerate(params["mlp"]):
        if i:
            h = jax.nn.gelu(h, approximate=False)
        h = (
            jnp.einsum("bnd,de->bne", h, layer["weight"], preferred_element_type=jnp.float32)
            + layer["bias"]
        ).astype(x.dtype)
    return h


def build(projector_type: str) -> tuple[Callable, Callable]:
    spec = SPECS[projector_type]
    return (
        lambda key, mm, lm, dtype=jnp.float32: init_stc_params(key, mm, lm, spec, dtype),
        lambda params, x: stc_forward(params, x, spec),
    )
