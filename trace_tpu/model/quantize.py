"""Weight-only int8 quantization for the serving path.

The 16 GB v5e cannot hold the 7B bf16 decoder (14.5 GB) next to a batched KV
cache — measured: the chip is full at ~15.1 GB live and even host transfers
start failing.  Per-output-channel symmetric int8 on the decoder matmul
weights cuts them to ~3.6 GB, freeing ~7 GB for KV cache (batch 8-16 decode)
and halving the weight bytes each memory-bound decode step must read.

This replaces the reference's bitsandbytes 4/8-bit load option
(model/builder.py:39-48) with a TPU layout: weights stay in their einsum
shapes, quantized along every axis except the output axis, so dequantization
is one broadcast multiply that XLA fuses into the consuming matmul.

Quality note: per-channel weight-only int8 on 7B LMs is near-lossless in
published practice, but logit-level validation against the released TRACE
checkpoints has not been run in this environment (no weights available);
treat `--quant int8` as the high-throughput serving mode pending that check.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

def _quantize_axis(w: jax.Array, reduce_axes: tuple[int, ...], bits: int = 8, qdtype=None):
    """Symmetric intN over the given axes; scale keeps the other axes.

    bits=4 stores jnp.int4 (range +-7; XLA packs 2 values/byte in TPU HBM —
    the bitsandbytes-4bit analog, reference model/builder.py:39-48): half
    the weight bytes of int8 for the HBM-bandwidth-bound decode phase, at
    per-channel 4-bit quality."""
    qmax = 127 if bits == 8 else 7
    if qdtype is None:
        qdtype = jnp.int8 if bits == 8 else jnp.int4
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax / qmax, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -qmax, qmax).astype(qdtype)
    return {"q": q, "s": scale.astype(jnp.bfloat16)}


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf.keys()) in (
        {"q", "s"}, {"qp", "s"}
    )


def is_packed4(leaf) -> bool:
    """Nibble-packed int4: two 4-bit weights per int8 byte along the
    contraction dim (low nibble = rows [0, K/2), high = [K/2, K)).

    Exists because (a) the dev tunnel's jax client cannot touch jnp.int4
    arrays at all (BENCH_NOTES) and (b) a packed-int8 representation keeps
    4-bit weights usable on any backend without relying on XLA's native
    int4 HBM packing.  Stored pre-flattened as [.., K/2, N] (the
    quant_apply [K, N] view), so the kernel needs no layout knowledge."""
    return isinstance(leaf, dict) and "qp" in leaf


def packed4_groups(leaf) -> int:
    """Number of contraction-dim scale groups of a packed-int4 leaf.

    1 = legacy per-output-channel scales ([.., 1, N]).  >1 = group-wise
    scales ([.., K/group, N], group=128 default): per-channel absmax over
    K=4096+ collapsed at 7B scale (teacher-forced agreement 0.3%, logit
    rms 7.4x the decision margin — benchmarks/_divergence r4), the
    standard bitsandbytes/NF4-class fix."""
    return leaf["s"].shape[-2]


def unpack4(qp: jax.Array) -> jax.Array:
    """[.., K/2, N] packed int8 -> [.., K, N] int8 in [-8, 7]."""
    lo = jnp.left_shift(qp, 4) >> 4   # sign-extend the low nibble
    hi = qp >> 4                      # arithmetic shift: high nibble
    return jnp.concatenate([lo, hi], axis=-2)


def pack4(q4: jax.Array) -> jax.Array:
    """[.., K, N] int4-valued ints -> [.., K/2, N] packed int8."""
    K = q4.shape[-2]
    assert K % 2 == 0, q4.shape
    lo = q4[..., : K // 2, :].astype(jnp.int32)
    hi = q4[..., K // 2 :, :].astype(jnp.int32)
    return ((lo & 0xF) | ((hi & 0xF) << 4)).astype(jnp.uint8).view(jnp.int8)


def dequantize(leaf, dtype=jnp.bfloat16) -> jax.Array:
    if is_packed4(leaf):
        # returns the FLATTENED [.., K, N] view (packing flattens the
        # original einsum axes); consumers are quant_apply-shaped
        w = unpack4(leaf["qp"]).astype(jnp.bfloat16)
        G = packed4_groups(leaf)
        if G > 1:  # group-wise scales along K
            K = w.shape[-2]
            shp = w.shape
            wg = w.reshape(shp[:-2] + (G, K // G, shp[-1]))
            wg = wg * leaf["s"][..., :, None, :].astype(jnp.bfloat16)
            return wg.reshape(shp).astype(dtype)
        return (w * leaf["s"]).astype(dtype)
    if is_quantized(leaf):
        return (leaf["q"].astype(jnp.bfloat16) * leaf["s"]).astype(dtype)
    return leaf


_DECODER_REDUCE = {
    "wq": (1,), "wk": (1,), "wv": (1,),   # [L, D, NH, hd]
    "wo": (1, 2),                          # [L, NH, hd, D]
    "w_gate": (1,), "w_up": (1,),          # [L, D, I]
    "w_down": (1,),                        # [L, I, D]
}


def _pack_leaf4(leaf: dict, reduce_axes: tuple) -> dict:
    """int4-valued {'q','s'} -> nibble-packed {'qp','s'} in the flattened
    [L, K, N] view quant_apply uses (K = the reduce dims, N = the rest).
    Assumes the reduce axes are contiguous and leading (after L) — true for
    every decoder weight in _DECODER_REDUCE."""
    q, s = leaf["q"], leaf["s"]
    L = q.shape[0]
    K = 1
    for a in reduce_axes:
        K *= q.shape[a]
    q3 = q.astype(jnp.int8).reshape(L, K, -1)
    return {"qp": pack4(q3), "s": s.astype(jnp.bfloat16).reshape(L, 1, -1)}


def _group_count(K: int, group: int) -> int:
    """Scale groups along a contraction dim of K: K//group when it divides
    evenly and leaves >= 2 groups per PACKED HALF (the nibble packing pairs
    rows k and k+K/2, so lo/hi need whole groups each), else 1 (legacy
    per-output-channel — tiny test configs land here)."""
    if group <= 0 or K % group or (K // group) % 2:
        return 1
    return K // group


def _quantize_grouped4(w, reduce_axes: tuple, group: int) -> dict:
    """Group-wise symmetric int4 in the flattened [L, K, N] view, nibble-
    packed: {'qp': [L, K/2, N] int8, 's': [L, K/group, N] bf16}.

    Per-channel absmax over K=4096+ collapses at 7B (0.3% teacher-forced
    agreement, r4 divergence records); group-128 bounds each scale's
    dynamic range to 128 weights — the bitsandbytes/NF4-class design."""
    L = w.shape[0]
    K = 1
    for a in reduce_axes:
        K *= w.shape[a]
    G = _group_count(K, group)
    wf = w.astype(jnp.float32).reshape(L, G, K // G, -1)
    amax = jnp.max(jnp.abs(wf), axis=2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    return {
        "qp": pack4(q.reshape(L, K, -1)),
        "s": scale[:, :, 0, :].astype(jnp.bfloat16),
    }


def quantize_decoder_params(params: dict, bits: int = 8, pack: bool = False,
                            group: int = 128) -> dict:
    """int8/int4-quantize the decoder's large matmul weights.

    Layer stacks quantize per (layer, output-channel); attention projections
    reduce over the input dim; heads and the embedding stay bf16 (gathers and
    fp32 logits want full precision rows).  ``pack`` (bits=4 only) stores
    nibble-packed int8 instead of jnp.int4 (see is_packed4), with group-wise
    scales along the contraction dim (``group``, default 128; 0 = legacy
    per-output-channel)."""
    out = dict(params)
    layers = dict(params["layers"])

    # reduce over the *input* dims; keep (L, out...) in the scale
    for name, axes in _DECODER_REDUCE.items():
        if bits == 4 and pack:
            leaf = _quantize_grouped4(layers[name], axes, group)
        else:
            leaf = _quantize_axis(layers[name], axes, bits)
        layers[name] = leaf

    out["layers"] = layers
    # the lm_head feeds fp32 logits; keep it int8 even in 4-bit mode
    out["lm_head"] = _quantize_axis(params["lm_head"], (0,))  # [D, V]
    return out


def _concat_out_channels(leaves: list):
    """Concat quantized leaves along output channels in the flattened
    [L, K, N] view quant_apply uses.  Valid because scales are per output
    channel: column n of the fused result is exactly column n of whichever
    source weight owns it.  Works for both {'q','s'} (int8/int4) and
    nibble-packed {'qp','s'} leaves (packing is per-column along K, so
    column concat preserves it).  Host (numpy) trees stay on host."""
    import numpy as np

    first = leaves[0]
    key = "qp" if "qp" in first else "q"
    host = isinstance(first[key], np.ndarray)
    cat = np.concatenate if host else jnp.concatenate
    L, K = first[key].shape[0], first[key].shape[1]
    if key == "q":
        # attention projections store [L, D, NH, HD]; flatten to [L, D, N]
        q = cat([lf["q"].reshape(L, K, -1) for lf in leaves], axis=2)
        s = cat([lf["s"].reshape(L, 1, -1) for lf in leaves], axis=2)
    else:
        q = cat([lf["qp"].reshape(L, K, -1) for lf in leaves], axis=2)
        # group-wise scales are already [L, G, N]; concat preserves the
        # per-(group, column) layout exactly (same K ⇒ same G)
        G = first["s"].shape[1]
        assert all(lf["s"].shape[1] == G for lf in leaves)
        s = cat([lf["s"].reshape(L, G, -1) for lf in leaves], axis=2)
    return {key: q, "s": s}


def fuse_decoder_serving(params: dict) -> dict:
    """Serving-time layout transform: one QKV matmul and one gate|up matmul
    per layer instead of five separate dots.

    The decode step at serving batch (M≈24-48) is MXU-tile-latency-bound,
    not bandwidth-bound (benchmarks/qmm_p4_sweep.py: a [32,4096]x[4096,4096]
    dot and a [32,4096]x[4096,14336] dot cost nearly the same wall time), so
    per-dot fixed cost dominates — 7 dots/layer -> 4 cuts it directly.  The
    split of the fused result is output-channel slicing at 128-lane-aligned
    offsets, which XLA fuses into the consumers.

    Applies only to dense quantized layers (the single-chip serving layout);
    LoRA / MoE / biased-QKV / bf16 trees are returned unchanged.  Training,
    checkpoint I/O, and the GSPMD sharded path keep canonical per-weight
    leaves (same policy as vit.fuse_vision_qkv).
    """
    layers = params.get("layers", {})
    if "wqkv" in layers or "router" in layers or "bq" in layers:
        return params
    if any("_lora_" in k for k in layers):
        return params
    names = ("wq", "wk", "wv", "w_gate", "w_up")
    if not all(is_quantized(layers.get(n)) for n in names):
        return params
    kinds = {("qp" if "qp" in layers[n] else "q") for n in names}
    if len(kinds) != 1:
        return params
    if "q" in layers["wq"] and layers["wq"]["q"].dtype not in (
        jnp.int8,
    ):  # native jnp.int4 stays unfused (XLA repacks on concat)
        return params
    new = dict(layers)
    new["wqkv"] = _concat_out_channels(
        [new.pop("wq"), new.pop("wk"), new.pop("wv")]
    )
    new["w_gateup"] = _concat_out_channels([new.pop("w_gate"), new.pop("w_up")])
    out = dict(params)
    out["layers"] = new
    return out


def unfuse_decoder_serving(params: dict) -> dict:
    """Inverse of :func:`fuse_decoder_serving`: split wqkv / w_gateup back
    into canonical per-weight leaves (flattened [L, K, N] view).

    The GSPMD serving path wants canonical leaves — the mesh TP rules shard
    wq/wk/wv on their own head axes, while a fused wqkv's single output dim
    would shard across the q|k|v boundaries and force resharding collectives
    around the split.  The q/k/v widths are recovered from the tree itself:
    wo stores [L, NH, HD, D] (or its [L,1,1,D]-scaled quantized form), so
    NQ = NH*HD, and the k/v halves split the remainder evenly.
    """
    layers = params.get("layers", {})
    if "wqkv" not in layers:
        return params
    new = dict(layers)

    def _split(leaf, bounds):
        key = "qp" if "qp" in leaf else "q"
        outs = []
        lo = 0
        for hi in bounds:
            outs.append({
                key: leaf[key][..., lo:hi],
                "s": leaf["s"][..., lo:hi],
            })
            lo = hi
        return outs

    wo = layers["wo"]
    if isinstance(wo, dict) and "qp" in wo:
        nq = 2 * wo["qp"].shape[1]  # packed [L, (NH*HD)/2, D]
    else:
        wo_q = wo["q"] if isinstance(wo, dict) and "q" in wo else wo
        if wo_q.ndim == 4:  # [L, NH, HD, D]
            nq = wo_q.shape[1] * wo_q.shape[2]
        else:  # already flattened [L, K, D]
            nq = wo_q.shape[1]
    qkv = new.pop("wqkv")
    n_total = (qkv["qp"] if "qp" in qkv else qkv["q"]).shape[-1]
    nkvw = (n_total - nq) // 2
    new["wq"], new["wk"], new["wv"] = _split(qkv, (nq, nq + nkvw, n_total))
    gu = new.pop("w_gateup")
    i2 = (gu["qp"] if "qp" in gu else gu["q"]).shape[-1]
    new["w_gate"], new["w_up"] = _split(gu, (i2 // 2, i2))
    out = dict(params)
    out["layers"] = new
    return out


def quantize_vision_params(params: dict) -> dict:
    """int8-quantize the CLIP encoder's stacked linear weights."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "fc1", "fc2"):
        layers[name] = _quantize_axis(layers[name], (1,))  # [L, in, out]
    out["layers"] = layers
    out["patch_embed"] = _quantize_axis(params["patch_embed"], (0,))
    return out


def quantize_trace_params(params: dict, *, vision: bool = True) -> dict:
    out = dict(params)
    out["decoder"] = quantize_decoder_params(params["decoder"])
    if vision and "vision" in params:
        out["vision"] = quantize_vision_params(params["vision"])
    return out


# ---------------------------------------------------------------------------
# Host-side (numpy) quantization
# ---------------------------------------------------------------------------
# Running the quantizer as one on-device program needs bf16+int8 weights
# co-resident (~22 GB working set) and leaves the relay allocator in a state
# where subsequent programs fail; checkpoint conversion quantizes on host
# instead, and only int8 tensors ever reach the device.

def _quantize_axis_np(w, reduce_axes: tuple[int, ...], bits: int = 8,
                      plain_int8: bool = False):
    import ml_dtypes
    import numpy as np

    qmax = 127 if bits == 8 else 7
    qdtype = np.int8 if (bits == 8 or plain_int8) else ml_dtypes.int4
    wf = np.asarray(w, np.float32)
    amax = np.max(np.abs(wf), axis=reduce_axes, keepdims=True)
    scale = np.maximum(amax / qmax, 1e-8)
    q = np.clip(np.round(wf / scale), -qmax, qmax).astype(qdtype)
    return {"q": q, "s": scale.astype(ml_dtypes.bfloat16)}


def _pack_leaf4_np(leaf: dict, reduce_axes: tuple) -> dict:
    import ml_dtypes
    import numpy as np

    q, s = leaf["q"], leaf["s"]
    L = q.shape[0]
    K = 1
    for a in reduce_axes:
        K *= q.shape[a]
    q3 = np.asarray(q, np.int8).reshape(L, K, -1)
    lo = q3[:, : K // 2].astype(np.uint8) & 0xF
    hi = (q3[:, K // 2 :].astype(np.uint8) & 0xF) << 4
    qp = (lo | hi).view(np.int8)
    return {
        "qp": qp,
        "s": np.asarray(s, ml_dtypes.bfloat16).reshape(L, 1, -1),
    }


def _quantize_grouped4_np(w, reduce_axes: tuple, group: int) -> dict:
    """numpy variant of :func:`_quantize_grouped4` (identical values)."""
    import ml_dtypes
    import numpy as np

    L = w.shape[0]
    K = 1
    for a in reduce_axes:
        K *= w.shape[a]
    G = _group_count(K, group)
    wf = np.asarray(w, np.float32).reshape(L, G, K // G, -1)
    amax = np.max(np.abs(wf), axis=2, keepdims=True)
    scale = np.maximum(amax / 7.0, 1e-8)
    q = np.clip(np.round(wf / scale), -7, 7).astype(np.int8).reshape(L, K, -1)
    lo = q[:, : K // 2].astype(np.uint8) & 0xF
    hi = (q[:, K // 2 :].astype(np.uint8) & 0xF) << 4
    return {
        "qp": (lo | hi).view(np.int8),
        "s": scale[:, :, 0, :].astype(ml_dtypes.bfloat16),
    }


def quantize_decoder_params_host(params: dict, bits: int = 8,
                                 pack: bool = False, group: int = 128) -> dict:
    """numpy-in / numpy-out variant of :func:`quantize_decoder_params`."""
    out = dict(params)
    layers = dict(params["layers"])
    for name, axes in _DECODER_REDUCE.items():
        if bits == 4 and pack:
            leaf = _quantize_grouped4_np(layers[name], axes, group)
        else:
            leaf = _quantize_axis_np(layers[name], axes, bits)
        layers[name] = leaf
    out["layers"] = layers
    out["lm_head"] = _quantize_axis_np(params["lm_head"], (0,))
    return out
