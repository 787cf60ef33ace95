"""CLIP ViT-L/14-336 vision tower in functional JAX.

TPU-first re-design of the reference's frozen HF CLIPVisionModel wrapper
(/root/reference/trace/model/multimodal_encoder/clip_encoder.py).  Differences
by design:

* the hidden-states tap at ``mm_vision_select_layer=-2`` (output after all but
  the final encoder layer, HF hidden_states[-2]) is implemented by simply not
  running the last layer — the reference computes it and throws it away;
* patch embedding is a reshape + one big matmul (maps straight onto the MXU)
  instead of a conv; CLIP normalization can be folded into the patch-embed
  weight (see :func:`fold_normalization_into_patch_embed`);
* encoder layers are stacked and scanned.

CLIP specifics preserved for checkpoint parity: class token participates in
attention and is dropped from the output ('patch' feature select,
clip_encoder.py:31-39); QuickGELU activation; pre-layernorm; attention with
q/k/v/out biases.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trace_tpu.model.config import VisionConfig

# OpenAI CLIP normalization constants (CLIPImageProcessor defaults).
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def init_vit_params(config: VisionConfig, key: jax.Array, dtype=jnp.float32):
    c = config
    L, D, I, P = c.num_layers, c.hidden_size, c.intermediate_size, c.patch_size
    n_pos = c.num_patches + 1
    k = jax.random.split(key, 8)
    s = 0.02

    def rnd(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * s).astype(dtype)

    return {
        "class_embedding": rnd(k[0], (D,)),
        "patch_embed": rnd(k[1], (P * P * 3, D)),  # folded conv kernel
        "position_embedding": rnd(k[2], (n_pos, D)),
        "pre_ln": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
        "layers": {
            "ln1_scale": jnp.ones((L, D), dtype),
            "ln1_bias": jnp.zeros((L, D), dtype),
            "wq": rnd(k[3], (L, D, D)),
            "bq": jnp.zeros((L, D), dtype),
            "wk": rnd(k[4], (L, D, D)),
            "bk": jnp.zeros((L, D), dtype),
            "wv": rnd(k[5], (L, D, D)),
            "bv": jnp.zeros((L, D), dtype),
            "wo": rnd(k[6], (L, D, D)),
            "bo": jnp.zeros((L, D), dtype),
            "ln2_scale": jnp.ones((L, D), dtype),
            "ln2_bias": jnp.zeros((L, D), dtype),
            "fc1": rnd(k[7], (L, D, I)),
            "b1": jnp.zeros((L, I), dtype),
            "fc2": rnd(k[7], (L, I, D)),
            "b2": jnp.zeros((L, D), dtype),
        },
    }


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def extract_patches(images: jax.Array, patch_size: int) -> jax.Array:
    """[B, H, W, 3] -> [B, n_patches, patch*patch*3] (row-major patch grid).

    Channel ordering within a patch matches a conv kernel reshaped as
    [C, kh, kw] -> flat, so HF conv weights convert with a transpose.
    """
    B, H, W, C = images.shape
    p = patch_size
    gh, gw = H // p, W // p
    x = images.reshape(B, gh, p, gw, p, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, gh, gw, C, p, p]
    return x.reshape(B, gh * gw, C * p * p)


def normalize_images(images: jax.Array) -> jax.Array:
    """Apply CLIP channel normalization to [0,1]-ranged [B, H, W, 3] images."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN, images.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, images.dtype)
    return (images - mean) / std


def fold_normalization_into_patch_embed(
    patch_embed: np.ndarray, patch_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold CLIP (x-mean)/std into the patch-embed matmul.

    Returns (W', b') with  raw @ W' + b' == normalize(raw) @ W  for raw images
    in [0,1], removing a full-image elementwise pass over HBM.
    Weight layout: [C*p*p, D] with channel-major rows (see extract_patches).
    """
    cpp, D = patch_embed.shape
    pp = patch_size * patch_size
    w = patch_embed.reshape(3, pp, D)
    inv_std = (1.0 / CLIP_IMAGE_STD).reshape(3, 1, 1)
    w_scaled = (w * inv_std).reshape(cpp, D)
    bias = -(CLIP_IMAGE_MEAN / CLIP_IMAGE_STD).reshape(3, 1) * np.ones((3, pp), np.float32)
    b = (bias.reshape(1, cpp) @ patch_embed.reshape(cpp, D)).reshape(D)
    return w_scaled.astype(patch_embed.dtype), b.astype(patch_embed.dtype)


def fuse_vision_qkv(params: dict) -> dict:
    """Serving-time layout transform: concat the stacked q/k/v projections
    into one [L, D, 3D] weight so each layer runs ONE MXU matmul for QKV
    instead of three M x 1024 x 1024 dots.  Inference-only (training and
    checkpoint I/O keep the canonical per-head layout); the w8a8/int8 path
    keeps separate weights (its per-tensor scales don't concat)."""
    layers = dict(params["layers"])
    if "wqkv" in layers or not hasattr(layers.get("wq"), "dtype"):
        return params
    layers["wqkv"] = jnp.concatenate(
        [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")], axis=-1
    )
    layers["bqkv"] = jnp.concatenate(
        [layers.pop("bq"), layers.pop("bk"), layers.pop("bv")], axis=-1
    )
    out = dict(params)
    out["layers"] = layers
    return out


def _btd_attention(q, k, v, config: VisionConfig, tq: int):
    """[B, P, D] attention via the lane-sliced Pallas kernel (TPU) with an
    XLA fallback (CPU tests / unsupported shapes)."""
    from trace_tpu.kernels.flash_attention import (
        vit_attention_btd,
        vit_attention_btd_reference,
    )

    nh = config.num_heads
    hd = q.shape[-1] // nh
    # the kernel wants 128-lane head-pair blocks, a sublane-aligned P, and a
    # TPU backend (Mosaic failures surface at the OUTER jit's compile, which
    # a try/except here cannot catch — route deterministically instead);
    # tiny test configs and CPU take the XLA reference
    if (
        nh % 2 == 0 and (2 * hd) % 128 == 0 and q.shape[1] % 16 == 0
        and jax.default_backend() != "cpu"
    ):
        try:
            return vit_attention_btd(q, k, v, tq=tq, num_heads=nh)
        except Exception:
            pass
    return vit_attention_btd_reference(q, k, v, tq=tq, num_heads=nh)


def _vit_layer(
    x: jax.Array, lp: dict, config: VisionConfig, use_flash: bool = False,
    tq: int | None = None,
) -> jax.Array:
    from trace_tpu.model.quantize import dequantize as dq
    from trace_tpu.model.quantize import is_quantized

    c = config
    NH = c.num_heads
    B, T, D = x.shape
    HD = D // NH
    tq = T if tq is None else tq

    w8a8 = c.act_quant and is_quantized(lp.get("wq"))
    if w8a8:
        from trace_tpu.kernels.quant_matmul import quant_apply_w8a8, quantize_acts

        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], c.layer_eps)
        hq, hs = quantize_acts(h)
        q = (quant_apply_w8a8(hq, hs, lp["wq"], (D,), out_dtype=jnp.float32) + lp["bq"]).astype(x.dtype)
        k = (quant_apply_w8a8(hq, hs, lp["wk"], (D,), out_dtype=jnp.float32) + lp["bk"]).astype(x.dtype)
        v = (quant_apply_w8a8(hq, hs, lp["wv"], (D,), out_dtype=jnp.float32) + lp["bv"]).astype(x.dtype)
    elif "wqkv" in lp:
        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], c.layer_eps)
        qkv = (jnp.einsum("btd,de->bte", h, lp["wqkv"].astype(x.dtype), preferred_element_type=jnp.float32) + lp["bqkv"]).astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], c.layer_eps)
        q = (jnp.einsum("btd,de->bte", h, dq(lp["wq"], x.dtype), preferred_element_type=jnp.float32) + lp["bq"]).astype(x.dtype)
        k = (jnp.einsum("btd,de->bte", h, dq(lp["wk"], x.dtype), preferred_element_type=jnp.float32) + lp["bk"]).astype(x.dtype)
        v = (jnp.einsum("btd,de->bte", h, dq(lp["wv"], x.dtype), preferred_element_type=jnp.float32) + lp["bv"]).astype(x.dtype)
    if use_flash:
        # [B, T, D]-layout Pallas kernel: no head transpose, no hd padding
        # (the relayouts around the generic [B, H, T, hd] kernel used to
        # cost more than the attention dots — benchmarks/attn_tune.py)
        attn = _btd_attention(q, k, v, c, tq).astype(x.dtype)
    else:
        q = q.reshape(B, T, NH, HD).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, NH, HD).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, NH, HD).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bnth,bnsh->bnts", q, k, preferred_element_type=jnp.float32)
        if tq != T:  # pad keys are invisible
            scores = jnp.where(jnp.arange(T)[None, None, None] < tq, scores, -1e30)
        probs = jax.nn.softmax(scores * (HD ** -0.5), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bnts,bnsh->bnth", probs, v, preferred_element_type=jnp.float32)
        attn = attn.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, T, D)
    attn = attn.astype(x.dtype)
    if w8a8:
        aq, asc = quantize_acts(attn)
        attn = (quant_apply_w8a8(aq, asc, lp["wo"], (D,), out_dtype=jnp.float32) + lp["bo"]).astype(x.dtype)
        x = x + attn
        h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], c.layer_eps)
        hq, hs = quantize_acts(h)
        I = lp["fc1"]["q"].shape[-1]
        h1 = (quant_apply_w8a8(hq, hs, lp["fc1"], (I,), out_dtype=jnp.float32) + lp["b1"]).astype(x.dtype)
        g = quick_gelu(h1)
        gq, gs = quantize_acts(g)
        h2 = (quant_apply_w8a8(gq, gs, lp["fc2"], (D,), out_dtype=jnp.float32) + lp["b2"]).astype(x.dtype)
        return x + h2

    attn = (jnp.einsum("btd,de->bte", attn, dq(lp["wo"], x.dtype), preferred_element_type=jnp.float32) + lp["bo"]).astype(x.dtype)
    x = x + attn

    h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], c.layer_eps)
    h1 = (jnp.einsum("btd,di->bti", h, dq(lp["fc1"], x.dtype), preferred_element_type=jnp.float32) + lp["b1"]).astype(x.dtype)
    h2 = (jnp.einsum("bti,id->btd", quick_gelu(h1), dq(lp["fc2"], x.dtype), preferred_element_type=jnp.float32) + lp["b2"]).astype(x.dtype)
    return x + h2


def vit_forward(
    params: dict,
    config: VisionConfig,
    images: jax.Array,  # [B, H, W, 3], already CLIP-normalized (or raw if the
                        # normalization was folded into patch_embed)
    *,
    patch_bias: jax.Array | None = None,
    use_flash: bool = False,
) -> jax.Array:
    """Images -> patch features [B, num_patches, hidden] at the -2 tap.

    Runs ``num_layers + 1 + select_layer`` encoder layers (23 of 24 for the
    production -2 tap) and drops the CLS position from the output.
    """
    c = config
    B = images.shape[0]

    from trace_tpu.model.quantize import dequantize as dq

    patch_w = dq(params["patch_embed"], images.dtype if images.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32)
    if images.ndim == 3:
        # pre-extracted patches [B, n_patches, C*p*p] (channel-major rows,
        # the extract_patches layout) — the serving band path patchifies
        # during YUV conversion so no [H, W, 3]-layout tensor is ever
        # materialized (video/preprocess.i420_band_to_patches)
        patches = images.astype(patch_w.dtype)
    else:
        patches = extract_patches(images, c.patch_size).astype(patch_w.dtype)
    embeds = jnp.einsum(
        "bnp,pd->bnd", patches, patch_w, preferred_element_type=jnp.float32
    )
    if patch_bias is not None:
        embeds = embeds + patch_bias
    embeds = embeds.astype(patch_w.dtype)

    cls = jnp.broadcast_to(params["class_embedding"], (B, 1, c.hidden_size))
    x = jnp.concatenate([cls, embeds], axis=1)
    x = x + params["position_embedding"][None, : x.shape[1]]
    x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"], c.layer_eps)

    # sublane-align the token dim ONCE for the whole stack (577 -> 592):
    # every per-layer matmul then runs on aligned shapes and the btd
    # attention kernel needs no per-layer pad/slice relayouts.  Pad rows
    # carry bounded garbage (masked out of attention keys; LN of zeros is
    # the bias row) and are sliced off below.
    tq = x.shape[1]
    P = -(-tq // 16) * 16
    if use_flash and P != tq:
        x = jnp.pad(x, ((0, 0), (0, P - tq), (0, 0)))

    num_run = c.num_layers + 1 + c.select_layer  # -2 => num_layers - 1
    layers = jax.tree.map(lambda a: a[:num_run], params["layers"])

    def body(x, lp):
        return _vit_layer(x, lp, c, use_flash=use_flash, tq=tq), None

    x, _ = jax.lax.scan(body, x, layers)
    x = x[:, :tq]

    if c.select_feature == "patch":
        return x[:, 1:]
    return x
