"""GPipe-style pipeline parallelism for the decoder stack.

The reference has NO pipeline parallelism (SURVEY.md §2.3: "absent
entirely"); its 7B model fits one GPU rank under ZeRO-3.  On TPU pods,
pipeline over the 'stage' mesh axis composes with tensor parallel inside a
stage to scale past what TP's all-reduce latency tolerates across ICI
domains — the standard multi-pod recipe.

Design (idiomatic JAX, not a torch-pipe translation):

* the layer-stacked params [L, ...] reshape to [S, L/S, ...] and shard
  over 'stage' — each device holds a contiguous block of layers;
* the batch splits into M microbatches; a lax.scan over M + S - 1 ticks
  runs the classic GPipe schedule: at tick t, stage s processes microbatch
  t - s (bubble ticks compute throwaway values that static shapes make
  free to mask);
* activations hop stage s -> s+1 via lax.ppermute (ICI neighbor traffic);
* the last stage accumulates outputs; a final psum over 'stage'
  broadcasts them (every other stage contributes zeros).

Everything is static-shaped and runs under shard_map inside jit, so XLA
overlaps the ppermute with the next tick's compute.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import NEG_INF, _layer, rms_norm, rope_cos_sin


def build_pp_mesh(num_stages: int, n_devices: Optional[int] = None) -> Mesh:
    """1-D 'stage' mesh over the first num_stages devices (optionally a
    ('stage', 'model') grid when n_devices > num_stages)."""
    devices = jax.devices()
    n = n_devices or num_stages
    assert n % num_stages == 0, "devices must tile stages"
    grid = np.asarray(devices[:n]).reshape(num_stages, n // num_stages)
    if n == num_stages:
        return Mesh(grid.reshape(num_stages), ("stage",))
    return Mesh(grid, ("stage", "model"))


def split_layers_into_stages(layers: dict, num_stages: int) -> dict:
    """[L, ...]-stacked layer params -> [S, L/S, ...]."""
    L = jax.tree.leaves(layers)[0].shape[0]
    assert L % num_stages == 0, f"{L} layers must tile {num_stages} stages"
    return jax.tree.map(
        lambda x: x.reshape((num_stages, L // num_stages) + x.shape[1:]), layers
    )


def _stage_forward(local_layers, x, config, cos, sin, bias, remat=False):
    """Run this stage's layer block (cache-less causal forward)."""

    def body(h, lp):
        h, _ = _layer(h, lp, config=config, cos=cos, sin=sin, bias=bias)
        return h, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, local_layers)
    return x


def pp_decoder_forward(
    params: dict,
    config: DecoderConfig,
    embeds: jax.Array,     # [B, T, D]
    attn_mask: jax.Array,  # [B, T] bool
    positions: jax.Array,  # [B, T] int32
    *,
    mesh: Mesh,
    num_microbatches: int,
    remat: bool = False,
) -> jax.Array:
    """Cache-less causal decoder forward, pipelined over mesh axis 'stage'.

    Matches decoder_forward(causal=True) output; use for long-sequence
    training/prefill across stages (``remat=True`` checkpoints each layer
    inside a stage — GPipe's per-microbatch activation budget).  Returns
    final-norm'ed hidden [B, T, D].  Differentiable end-to-end: ppermute
    and psum transpose to their reverse collectives, so one jax.grad over
    the pipelined loss is the 1F1B-equivalent backward.

    Single-token DECODE deliberately does not run under PP: a one-token
    step serializes across stages (S hops of latency per token, no
    microbatch overlap), so serving shards via TP + frame-SP instead
    (runtime/generate.py generate_sharded); PP here targets long-sequence
    training and prefill.
    """
    B, T, D = embeds.shape
    M = num_microbatches
    S = mesh.shape["stage"]
    assert B % M == 0, "batch must tile microbatches"
    mb = B // M

    cos, sin = rope_cos_sin(positions, config.head_dim, config.rope_theta)
    bias = jnp.where(attn_mask[:, None, None, :], 0.0, NEG_INF).astype(jnp.float32)
    causal_m = jnp.tril(jnp.ones((T, T), jnp.bool_))
    bias = bias + jnp.where(causal_m[None, None, :, :], 0.0, NEG_INF)

    x_mb = embeds.reshape(M, mb, T, D)
    bias_mb = bias.reshape(M, mb, 1, T, T)
    cos_mb = cos.reshape(M, mb, T, -1)
    sin_mb = sin.reshape(M, mb, T, -1)

    staged = split_layers_into_stages(params["layers"], S)

    def pp_fn(staged_local, x_mb, bias_mb, cos_mb, sin_mb):
        # staged_local: [1, L/S, ...] — this stage's block
        local = jax.tree.map(lambda a: a[0], staged_local)
        s = jax.lax.axis_index("stage")

        def tick(carry, t):
            buf, out = carry
            m = jnp.clip(t - s, 0, M - 1)
            inp = jnp.where(s == 0, x_mb[jnp.clip(t, 0, M - 1)], buf)
            h = _stage_forward(
                local, inp, config, cos_mb[m], sin_mb[m], bias_mb[m],
                remat=remat,
            )
            om = t - (S - 1)
            write = (s == S - 1) & (om >= 0) & (om < M)
            out = jnp.where(
                write,
                jax.lax.dynamic_update_index_in_dim(
                    out, h, jnp.clip(om, 0, M - 1), 0
                ),
                out,
            )
            if S > 1:
                buf = jax.lax.ppermute(
                    h, "stage", [(i, i + 1) for i in range(S - 1)]
                )
            return (buf, out), None

        # carry values become device-varying inside the loop; mark the
        # (replicated-zero) init accordingly for shard_map's vma tracking
        zeros = (jnp.zeros_like(x_mb[0]), jnp.zeros_like(x_mb))
        if hasattr(jax.lax, "pcast"):
            init = jax.lax.pcast(zeros, "stage", to="varying")
        else:  # older jax
            init = jax.lax.pvary(zeros, "stage")
        (_, out), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        # only the last stage wrote; broadcast to all
        return jax.lax.psum(out, "stage")

    spec_staged = jax.tree.map(lambda _: P("stage"), staged)
    out = shard_map(
        pp_fn,
        mesh=mesh,
        in_specs=(spec_staged, P(), P(), P(), P()),
        out_specs=P(),
    )(staged, x_mb, bias_mb, cos_mb, sin_mb)

    x = out.reshape(B, T, D)
    return rms_norm(x, params["final_norm"], config.rms_eps)
