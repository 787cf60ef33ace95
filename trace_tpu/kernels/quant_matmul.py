"""Pallas int8 weight-only matmul: y = (x @ q) * s.

Why a kernel: expressing dequantization as XLA ops (`convert(q)*s` feeding a
dot) lets while-loop invariant code motion hoist the converted bf16 weights
out of the decode loop — materializing the full-precision weights (14.5 GB
for the 7B decoder) that int8 was supposed to eliminate; measured as
RESOURCE_EXHAUSTED on the chip.  Inside a Pallas kernel the int8->bf16
convert happens per VMEM tile and is invisible to LICM.

Because quantization scales are per OUTPUT channel, dequantization factors
out of the contraction:  x @ (q * s) == (x @ q) * s — the kernel multiplies
by the scale row once on the accumulated [bm, bn] block, not per weight.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]                         # [bm, bk] bf16/f32
    w = q_ref[:].astype(x.dtype)         # [bk, bn] int8 -> compute dtype (tile-local)
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0].astype(jnp.float32)[None, :]).astype(
            o_ref.dtype
        )


def _qmm_p4_kernel(x1_ref, x2_ref, q_ref, s_ref, o_ref, acc_ref, *, nk: int):
    """Nibble-packed int4 matmul tile: one packed int8 byte carries weight
    rows k (low nibble) and k + K/2 (high nibble) — halves the HBM weight
    bytes the bandwidth-bound decode step streams (vs int8).  The unpack
    happens per VMEM tile on the VPU; the dots run bf16 on the MXU.

    The unpack is float arithmetic, not shifts: Mosaic on v5e rejects
    sub-32-bit integer shift vectors (remote-compile HTTP 500 at
    `shift_left`, 2026-08-18).  f32 represents every int8 exactly, and
    floor(b/16) IS the arithmetic >>4, so hi/lo reconstruct exactly."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x1 = x1_ref[:]                       # [bm, bk] rows [0, K/2)
    x2 = x2_ref[:]                       # [bm, bk] rows [K/2, K)
    wf = q_ref[:].astype(jnp.float32)    # [bk, bn] packed byte, exact in f32
    hi_f = jnp.floor(wf * 0.0625)        # == byte >> 4 (floor division by 16)
    lo_u = wf - hi_f * 16.0              # low nibble, unsigned [0, 16)
    lo = (lo_u - jnp.where(lo_u >= 8.0, 16.0, 0.0)).astype(x1.dtype)
    hi = hi_f.astype(x1.dtype)
    acc_ref[:] += jax.lax.dot_general(
        x1, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_ref[:] += jax.lax.dot_general(
        x2, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0].astype(jnp.float32)[None, :]).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk", "interpret")
)
def quant_matmul_p4(
    x: jax.Array,    # [M, K] bf16/f32
    qp: jax.Array,   # [K/2, N] nibble-packed int8 (see quantize.pack4)
    s: jax.Array,    # [N] per-output-channel scale
    *,
    out_dtype=None,
    bm: int = 1024,
    bn: int = 1024,
    bk: int = 1024,  # K/2-block
    interpret: bool = False,
) -> jax.Array:
    """y[M, N] = (x @ unpack4(qp)) * s with tile-local unpack+dequant.

    Block defaults from the on-chip sweep (benchmarks/qmm_p4_sweep.py,
    2026-08-19): 1024x1024 wins or ties at every decode shape (5-8% over
    the original 512x512); 2048-wide blocks fail the remote Mosaic compile
    (VMEM)."""
    M, K = x.shape
    Kh, N = qp.shape
    assert K == 2 * Kh, (x.shape, qp.shape)
    out_dtype = out_dtype or x.dtype
    s = jnp.reshape(s, (-1,))
    assert s.shape[0] == N, (s.shape, N)

    bm = min(bm, -(-M // 8) * 8)
    bn = min(bn, N)
    bk = min(bk, Kh)
    # scoped-VMEM budget: x1+x2 (2*bm*bk bf16) + q (bk*bn s8) + out (bm*bn
    # bf16) + acc (bm*bn f32) + ~2 f32 unpack temps (bk*bn each) must stay
    # under the 16 MB stack limit (measured blow-up: bm=1024 with 1024x1024
    # blocks at prefill M -> 18 MB).  Serving prefill takes the W4A8 two-dot
    # path instead; this guard keeps the weight-only fallback compiling.
    while bm > 8 and (
        4 * bm * bk + bk * bn + 6 * bm * bn + 8 * bk * bn > 12 * 1024 * 1024
    ):
        # keep every halving 8-aligned: bm starts at ceil8(M), and an odd M
        # (e.g. 1128 -> 564 -> 282) would hand Mosaic a non-sublane-aligned
        # block shape
        bm = max(8, -(-(bm // 2) // 8) * 8)

    x1 = _pad_dim(_pad_dim(x[:, :Kh], 0, bm), 1, bk)
    x2 = _pad_dim(_pad_dim(x[:, Kh:], 0, bm), 1, bk)
    qpp = _pad_dim(_pad_dim(qp, 0, bk), 1, bn)
    sp = _pad_dim(s[None, :], 1, bn)
    Mp, Kp = x1.shape
    Np = qpp.shape[1]
    nm, nn, nk = Mp // bm, Np // bn, Kp // bk

    out = pl.pallas_call(
        functools.partial(_qmm_p4_kernel, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x1, x2, qpp, sp)
    return out[:M, :N]


def _qmm_p4g_kernel(x1_ref, x2_ref, q_ref, slo_ref, shi_ref, o_ref, acc_ref,
                    *, nk: int, gpb: int):
    """Group-wise-scaled nibble-packed int4 matmul tile.

    Scales are per (128-row contraction group, output channel) — the 7B
    quality fix over per-channel absmax (quantize._quantize_grouped4).
    Each 128-row weight slice is unpacked, scaled by its group's [bn] scale
    row (a natural sublane broadcast), and fed to its own [bm,128]x[128,bn]
    MXU dot — the MXU is 128x128, so G dots of K=128 cost the same MXU
    passes as one K=bk dot; the extra VPU work is one multiply per WEIGHT
    element (K*N), not per accumulator element (G*M*N)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x1 = x1_ref[:]                       # [bm, bk] rows [0, K/2)
    x2 = x2_ref[:]                       # [bm, bk] rows [K/2, K)
    wf = q_ref[:].astype(jnp.float32)    # [bk, bn] packed byte, exact in f32
    hi_f = jnp.floor(wf * 0.0625)        # == byte >> 4 (see _qmm_p4_kernel)
    lo_u = wf - hi_f * 16.0
    lo = lo_u - jnp.where(lo_u >= 8.0, 16.0, 0.0)
    hi = hi_f
    dn = (((1,), (0,)), ((), ()))
    for g in range(gpb):
        r0, r1 = g * 128, (g + 1) * 128
        sl = slo_ref[g, :].astype(jnp.float32)[None, :]   # [1, bn]
        sh = shi_ref[g, :].astype(jnp.float32)[None, :]
        acc_ref[:] += jax.lax.dot_general(
            x1[:, r0:r1], (lo[r0:r1, :] * sl).astype(x1.dtype), dn,
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += jax.lax.dot_general(
            x2[:, r0:r1], (hi[r0:r1, :] * sh).astype(x1.dtype), dn,
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk", "interpret")
)
def quant_matmul_p4_grouped(
    x: jax.Array,    # [M, K] bf16/f32
    qp: jax.Array,   # [K/2, N] nibble-packed int8
    s: jax.Array,    # [G, N] per-(group, output-channel) scale, G = K/128
    *,
    out_dtype=None,
    bm: int = 1024,
    bn: int = 1024,
    bk: int = 1024,  # K/2-block; must be a multiple of 128 (group size)
    interpret: bool = False,
) -> jax.Array:
    """y[M, N] = (x @ (unpack4(qp) * expand(s))) with tile-local
    unpack + per-group weight scaling (see _qmm_p4g_kernel)."""
    M, K = x.shape
    Kh, N = qp.shape
    assert K == 2 * Kh, (x.shape, qp.shape)
    G = s.shape[0]
    assert G * 128 == K and G % 2 == 0, (s.shape, K)
    out_dtype = out_dtype or x.dtype

    bm = min(bm, -(-M // 8) * 8)
    bn = min(bn, N)
    bk = min(bk, Kh)
    assert bk % 128 == 0, bk
    while bm > 8 and (
        4 * bm * bk + bk * bn + 6 * bm * bn + 8 * bk * bn > 12 * 1024 * 1024
    ):
        bm = max(8, -(-(bm // 2) // 8) * 8)

    x1 = _pad_dim(_pad_dim(x[:, :Kh], 0, bm), 1, bk)
    x2 = _pad_dim(_pad_dim(x[:, Kh:], 0, bm), 1, bk)
    qpp = _pad_dim(_pad_dim(qp, 0, bk), 1, bn)
    # scale rows for the lo half (groups [0, G/2)) and hi half ([G/2, G));
    # K-padding adds whole zero-weight groups — pad scales with ones
    s_lo = _pad_dim(_pad_dim(s[: G // 2], 0, bk // 128, fill=1.0), 1, bn)
    s_hi = _pad_dim(_pad_dim(s[G // 2 :], 0, bk // 128, fill=1.0), 1, bn)
    Mp, Kp = x1.shape
    Np = qpp.shape[1]
    nm, nn, nk = Mp // bm, Np // bn, Kp // bk
    gpb = bk // 128

    out = pl.pallas_call(
        functools.partial(_qmm_p4g_kernel, nk=nk, gpb=gpb),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x1, x2, qpp, s_lo, s_hi)
    return out[:M, :N]


def _pad_dim(x, axis, mult, fill=0.0):
    size = x.shape[axis]
    target = -(-size // mult) * mult
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad, constant_values=fill)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk", "interpret")
)
def quant_matmul(
    x: jax.Array,   # [M, K] bf16/f32
    q: jax.Array,   # [K, N] int8
    s: jax.Array,   # [N] or broadcastable scale (per output channel)
    *,
    out_dtype=None,
    bm: int = 1024,  # large m blocks: the weight is streamed once per m-block,
                     # so prefill (M~2K) wants few m-blocks; decode pads M to 8
    bn: int = 512,
    bk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """y[M, N] = (x @ q) * s with tile-local dequantization."""
    M, K = x.shape
    K2, N = q.shape
    assert K == K2, (x.shape, q.shape)
    out_dtype = out_dtype or x.dtype
    s = jnp.reshape(s, (-1,))
    assert s.shape[0] == N, (s.shape, N)

    bm = min(bm, -(-M // 8) * 8)
    bn = min(bn, N)
    bk = min(bk, K)

    xp = _pad_dim(_pad_dim(x, 0, bm), 1, bk)
    qp = _pad_dim(_pad_dim(q, 0, bk), 1, bn)
    sp = _pad_dim(s[None, :], 1, bn)  # [1, Np]
    Mp, Kp = xp.shape
    Np = qp.shape[1]
    nm, nn, nk = Mp // bm, Np // bn, Kp // bk

    import os

    # Compile hints default OFF: with cost_estimate/dimension_semantics set,
    # the remote Mosaic compile of this kernel inside scan-in-while graphs
    # hung for 25+ minutes; without them the same graphs compile in seconds.
    extra = {}
    if os.environ.get("TRACE_TPU_QMM_HINTS", "0") == "1":
        extra = dict(
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Mp * Np * Kp,
                bytes_accessed=xp.nbytes + qp.nbytes + Mp * Np * 2,
                transcendentals=0,
            ),
        )
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        **extra,
    )(xp, qp, sp)
    return out[:M, :N]


def _qmm_stacked_kernel(li_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]                              # [M, bk]
    w = q_ref[0].astype(x.dtype)              # [bk, bn] int8 -> tile-local
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0, 0].astype(jnp.float32)[None, :]).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bn", "bk", "interpret")
)
def quant_matmul_stacked(
    x: jax.Array,    # [M, K] bf16/f32 (M small: the decode step's batch)
    q: jax.Array,    # [L, K, N] int8 — the FULL layer-stacked weight
    s: jax.Array,    # [L, N] per (layer, output-channel) scale
    li: jax.Array,   # scalar int32 layer index
    *,
    out_dtype=None,
    bn: int = 2048,
    bk: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """y[M, N] = (x @ q[li]) * s[li], reading layer li's weight stripe IN
    PLACE via a scalar-prefetch index map.

    Why: the decode step runs the layer stack as a lax.scan whose xs are the
    stacked weights — XLA materializes each layer's weight slice into a temp
    before its dot (a dynamic-slice cannot fuse into a dot operand), so the
    7B int8 weights cost write+read on top of the original read every decode
    step.  Measured: 38.7 ms/step at B=32, S=576 vs a ~10 ms roofline — the
    step is S-independent, i.e. weight-path-bound (benchmarks/
    decode_ablate.py).  This kernel is the weight analog of
    kernels/decode_attention.py's in-place stacked-cache read.

    x stays whole in VMEM (M <= ~64 rows in decode); the grid tiles (N, K)
    with bn x bk int8 blocks (bn >= 2048 keeps per-row DMA segments >= 2 KB).
    """
    M, K = x.shape
    L, K2, N = q.shape
    assert K == K2, (x.shape, q.shape)
    out_dtype = out_dtype or x.dtype
    s = jnp.reshape(s, (L, 1, N))

    bn = min(bn, N)
    bk = min(bk, K)
    xp = _pad_dim(_pad_dim(x, 0, 8), 1, bk)
    Mp, Kp = xp.shape
    # N and K are weight dims (multiples of the block sizes for every real
    # config); pad defensively for tiny test shapes
    qp = _pad_dim(_pad_dim(q, 1, bk), 2, bn)
    sp = _pad_dim(s, 2, bn)
    Np = qp.shape[2]
    nn, nk = Np // bn, Kp // bk

    li_arr = jnp.reshape(li, (1,)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((Mp, bk), lambda n, k, li_ref: (0, k)),
            pl.BlockSpec((1, bk, bn), lambda n, k, li_ref: (li_ref[0], k, n)),
            pl.BlockSpec((1, 1, bn), lambda n, k, li_ref: (li_ref[0], 0, n)),
        ],
        out_specs=pl.BlockSpec((Mp, bn), lambda n, k, li_ref: (0, n)),
        scratch_shapes=[pltpu.VMEM((Mp, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_qmm_stacked_kernel, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        interpret=interpret,
    )(li_arr, xp, qp, sp)
    return out[:M, :N]


def quant_apply_stacked(
    x: jax.Array,      # [..., K]
    leaf: dict,        # {'q': int8 [L, K, *out], 's': [L, ...]}
    li: jax.Array,     # scalar int32 layer index
    out_shape: tuple,  # trailing output dims
    *,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Apply layer li's slice of a stacked quantized weight without
    materializing it (decode-step path; see quant_matmul_stacked)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    L = leaf["q"].shape[0]
    q = leaf["q"].reshape(L, K, -1)
    s = leaf["s"].reshape(L, -1)
    y = quant_matmul_stacked(
        x.reshape(-1, K), q, s, li,
        out_dtype=out_dtype or x.dtype, interpret=interpret,
    )
    return y.reshape(lead + out_shape)


def _impl() -> str:
    """'pallas' (tile-local dequant kernel) or 'xla' (dequant einsum).

    Selected via TRACE_TPU_QMM; 'xla' keeps dequantization visible to XLA
    (scale folds into the dot's operand) and compiles much faster over the
    remote-compile tunnel.
    """
    import os

    return os.environ.get("TRACE_TPU_QMM", "xla")


def quantize_acts(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic per-token symmetric int8 activation quantization.

    [..., K] -> (int8 values [..., K], fp32 row scales [..., 1]).  Quantize
    ONCE per layer block and share across the weights that consume the same
    activations (q/k/v; gate/up) — the rounding pass over [M, K] is the
    only overhead W8A8 adds, so amortizing it is what keeps the int8 MXU
    win (probe: benchmarks/w8a8_probe.py)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def quant_apply_w8a8(
    xq: jax.Array,     # [..., K] int8 (from quantize_acts)
    xs: jax.Array,     # [..., 1] fp32 row scales
    leaf: dict,        # {'q': int8 [K, *out], 's': ..} or {'qp': packed4, 's': ..}
    out_shape: tuple,
    *,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """True s8 x s8 -> s32 MXU dot; result scaled by row x column scales.

    This is the structural prefill/ViT throughput lever: the v5e int8 MXU
    peak is ~2x bf16, which convert(int8)->bf16 dequant dots can never
    reach (measured 145 TF/s prefill ceiling, BENCH_NOTES.md).

    Nibble-packed int4 leaves ('qp') take the same dot after an in-program
    unpack to int8 (values in [-8, 7] are s8-exact): int4p serving keeps
    the halved weight bytes on the bandwidth-bound decode step while
    prefill recovers the s8xs8 MXU rate — W4A8. The unpacked operand is a
    per-layer temp XLA materializes once per prefill call (~2x the packed
    read), which costs ~10% of the dot it feeds at prefill M."""
    lead = xq.shape[:-1]
    K = xq.shape[-1]
    if "qp" in leaf and leaf["s"].size != leaf["qp"].shape[-1]:
        # group-wise-scaled int4p has no s8xs8 form (the per-group scale
        # must apply inside the contraction); the model layer routes grouped
        # leaves through the weight-only path instead (mistral._layer)
        raise ValueError(
            "quant_apply_w8a8 does not support group-scaled packed-int4 "
            "leaves; use quant_apply (weight-only)"
        )
    s = leaf["s"].reshape(-1)
    if "qp" in leaf:
        # two s8xs8 dots over the nibble halves — no concatenated [K, N]
        # unpacked temp (the concat copy doubled the unpack traffic):
        # x @ unpack4(qp) == x[:, :K/2] @ lo + x[:, K/2:] @ hi
        qp = leaf["qp"].reshape(K // 2, -1)
        lo = jnp.left_shift(qp, 4) >> 4   # sign-extended low nibble, int8
        hi = qp >> 4                      # arithmetic shift: high nibble
        x2 = xq.reshape(-1, K)
        dn = (((1,), (0,)), ((), ()))
        acc = jax.lax.dot_general(
            x2[:, : K // 2], lo, dn, preferred_element_type=jnp.int32
        ) + jax.lax.dot_general(
            x2[:, K // 2 :], hi, dn, preferred_element_type=jnp.int32
        )
    else:
        q = leaf["q"].reshape(K, -1)
        acc = jax.lax.dot_general(
            xq.reshape(-1, K), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    y = acc.astype(jnp.float32) * xs.reshape(-1, 1) * s.astype(jnp.float32)[None, :]
    return y.astype(out_dtype).reshape(lead + out_shape)


def quant_apply(
    x: jax.Array,      # [..., K]
    leaf,              # {'q': int8 [K, *out], 's': [..., *out]} or plain array
    out_shape: tuple,  # trailing output dims, e.g. (NH, hd) or (N,)
    *,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Apply a (possibly quantized) weight as a 2-D contraction over the
    last input axis; reshapes x/w to [M, K] @ [K, N]."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    if isinstance(leaf, dict) and "qp" in leaf:
        # nibble-packed int4 (quantize.is_packed4): tile-local unpack in the
        # Pallas kernel halves the weight HBM bytes of the decode step; the
        # XLA fallback (CPU/tests, or TRACE_TPU_QMM_P4=xla) unpacks
        # explicitly — it materializes full-width weights, so the kernel
        # path is routed deterministically (Mosaic errors surface at the
        # outer jit compile, same policy as _btd_attention) rather than
        # swallowed into a silent slow path.
        import os

        qp = leaf["qp"].reshape(K // 2, -1)
        N = qp.shape[-1]
        grouped = leaf["s"].size != N  # [G, N] group-wise scales
        use_pallas = (
            os.environ.get("TRACE_TPU_QMM_P4", "pallas") == "pallas"
            and jax.default_backend() != "cpu"
        )
        if grouped:
            s = leaf["s"].reshape(-1, N)
            if use_pallas:
                y = quant_matmul_p4_grouped(
                    x2, qp, s, out_dtype=out_dtype or x.dtype,
                    interpret=interpret,
                )
                return y.reshape(lead + out_shape)
            # XLA fallback (CPU/tests): scale the unpacked weights per
            # group, then one dot — materializes a [K, N] compute-dtype
            # temp per call, so the Pallas tile-local path is the default
            from trace_tpu.model.quantize import unpack4

            G = s.shape[0]
            w = unpack4(qp).astype(jnp.float32).reshape(G, K // G, N)
            w = (w * s.astype(jnp.float32)[:, None, :]).reshape(K, N)
            acc = jax.lax.dot_general(
                x2, w.astype(x2.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc.astype(out_dtype or x.dtype).reshape(lead + out_shape)
        s = leaf["s"].reshape(-1)
        if use_pallas:
            y = quant_matmul_p4(
                x2, qp, s, out_dtype=out_dtype or x.dtype,
                interpret=interpret,
            )
            return y.reshape(lead + out_shape)
        from trace_tpu.model.quantize import unpack4

        acc = jax.lax.dot_general(
            x2, unpack4(qp).astype(x2.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = (acc * s.astype(jnp.float32)[None, :]).astype(out_dtype or x.dtype)
        return y.reshape(lead + out_shape)
    if isinstance(leaf, dict):
        q = leaf["q"].reshape(K, -1)
        s = leaf["s"].reshape(-1)
        # int4 weights always take the XLA path: Mosaic VMEM refs are
        # int8-minimum, and XLA reads packed-int4 HBM natively (the whole
        # point of 4-bit on the bandwidth-bound decode step)
        if _impl() == "pallas" and q.dtype != jnp.int4:
            y = quant_matmul(
                x2, q, s, out_dtype=out_dtype or x.dtype, interpret=interpret
            )
        else:
            # int8 operand converted at the dot input (XLA fuses the convert
            # into the operand read); per-output-channel scale applied on the
            # [M, N] result, so no full-precision weight copy exists.
            acc = jax.lax.dot_general(
                x2, q.astype(x2.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = (acc * s.astype(jnp.float32)[None, :]).astype(out_dtype or x.dtype)
    else:
        w = leaf.reshape(K, -1)
        y = jnp.einsum(
            "mk,kn->mn", x2, w, preferred_element_type=jnp.float32
        ).astype(out_dtype or x.dtype)
    return y.reshape(lead + out_shape)
