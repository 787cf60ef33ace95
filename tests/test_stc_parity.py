"""STC connector parity vs a handwritten torch replica of the reference
module tree (STCConnector, builder.py:138-249: timm RegStage(bottle_ratio=1,
group_size=1, se_ratio=0.25, act=SiLU, norm=LayerNorm2d) around a Conv3d /
AvgPool3d sampler + MLP readout).

timm itself is not installed in this environment, so the torch side is a
line-by-line replica of timm.models.regnet.Bottleneck producing a
timm-named state dict — it pins both the math and the conversion key
layout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from trace_tpu.checkpoint.convert import convert_stc_connector  # noqa: E402
from trace_tpu.model.stc_connector import SPECS, stc_forward  # noqa: E402


class LayerNorm2d(nn.LayerNorm):
    """timm.layers.LayerNorm2d: channel-norm of NCHW via permute."""

    def __init__(self, ch):
        super().__init__(ch, eps=1e-6)

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = F.layer_norm(x, self.normalized_shape, self.weight, self.bias, self.eps)
        return x.permute(0, 3, 1, 2)


class ConvNormAct(nn.Module):
    def __init__(self, in_ch, out_ch, k, groups=1, apply_act=True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, padding=k // 2, groups=groups, bias=False)
        self.bn = LayerNorm2d(out_ch)  # timm names the norm 'bn' regardless
        self.act = nn.SiLU() if apply_act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class SEModule(nn.Module):
    def __init__(self, ch, rd):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, rd, 1, bias=True)
        self.fc2 = nn.Conv2d(rd, ch, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.fc2(F.silu(self.fc1(s)))
        return x * torch.sigmoid(s)


class Bottleneck(nn.Module):
    """timm.models.regnet.Bottleneck at RegStage's STCConnector call site."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv1 = ConvNormAct(in_ch, out_ch, 1)
        self.conv2 = ConvNormAct(out_ch, out_ch, 3, groups=out_ch)  # group_size=1
        self.se = SEModule(out_ch, int(round(in_ch * 0.25)))
        self.conv3 = ConvNormAct(out_ch, out_ch, 1, apply_act=False)
        self.act3 = nn.SiLU()
        self.downsample = (
            ConvNormAct(in_ch, out_ch, 1, apply_act=False)
            if in_ch != out_ch else nn.Identity()
        )

    def forward(self, x):
        shortcut = x
        x = self.conv1(x)
        x = self.conv2(x)
        x = self.se(x)
        x = self.conv3(x)
        return self.act3(x + self.downsample(shortcut))


class RegStage(nn.Module):
    def __init__(self, depth, in_ch, out_ch):
        super().__init__()
        for i in range(depth):
            self.add_module(f"b{i + 1}", Bottleneck(in_ch if i == 0 else out_ch, out_ch))

    def forward(self, x):
        for m in self.children():
            x = m(x)
        return x


class TorchSTC(nn.Module):
    """Reference STCConnector module tree (builder.py:138-249)."""

    def __init__(self, mm_hidden, lm_hidden, spec):
        super().__init__()
        self.spec = spec
        if spec.depth:
            self.s1 = RegStage(spec.depth, mm_hidden, lm_hidden)
            self.s2 = RegStage(spec.depth, lm_hidden, lm_hidden)
        else:
            self.s1 = nn.Identity()
            self.s2 = nn.Identity()
        mid = lm_hidden if spec.depth else mm_hidden
        if spec.sampler == "conv":
            self.sampler = nn.Sequential(
                nn.Conv3d(mid, mid, spec.downsample, stride=spec.downsample,
                          padding=spec.sampler_padding, bias=True),
                nn.SiLU(),
            )
        else:
            self.sampler = nn.Sequential(nn.AvgPool3d(spec.downsample), nn.SiLU())
        readout = [nn.Linear(mid, lm_hidden)]
        for _ in range(1, spec.mlp_depth):
            readout += [nn.GELU(), nn.Linear(lm_hidden, lm_hidden)]
        self.readout = nn.Sequential(*readout)

    def forward(self, x):  # x [b, t, l, d]
        b, t, l, d = x.shape
        hw = int(round(l ** 0.5))
        x = x.reshape(b, t, hw, hw, d).permute(0, 1, 4, 2, 3)  # b t d h w
        x = x.reshape(b * t, d, hw, hw)
        x = self.s1(x)
        x = x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)  # b d t h w
        x = self.sampler(x)
        new_t = x.size(2)
        x = x.permute(0, 2, 1, 3, 4).reshape(b * new_t, x.size(1), x.size(3), x.size(4))
        x = self.s2(x)
        x = x.reshape(b, new_t, x.size(1), -1).permute(0, 1, 3, 2)
        x = x.reshape(b, -1, x.size(3))
        return self.readout(x)


@pytest.mark.parametrize("ptype", list(SPECS))
def test_stc_matches_torch_replica(ptype):
    spec = SPECS[ptype]
    mm, lm = 24, 32
    torch.manual_seed(0)
    ref = TorchSTC(mm, lm, spec).eval()

    sd = {
        f"model.mm_projector.{k}": v.detach().numpy()
        for k, v in ref.state_dict().items()
    }
    params = convert_stc_connector(sd, ptype)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 16, mm)).astype(np.float32)  # 4x4 grid
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = np.asarray(stc_forward(params, jnp.asarray(x), spec))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_stc_loads_via_generic_projector():
    import dataclasses

    from trace_tpu.checkpoint.convert import _convert_generic_projector
    from trace_tpu.model.config import TraceConfig

    spec = SPECS["stc_connector"]
    torch.manual_seed(1)
    ref = TorchSTC(24, 32, spec).eval()
    sd = {
        f"model.mm_projector.{k}": v.detach().numpy()
        for k, v in ref.state_dict().items()
    }
    cfg = dataclasses.replace(TraceConfig.tiny(), mm_projector_type="stc_connector")
    params = _convert_generic_projector(sd, cfg)
    assert len(params["s1"]) == spec.depth and len(params["mlp"]) == spec.mlp_depth
