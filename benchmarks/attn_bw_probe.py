"""Decode-attention bandwidth at SERVING shapes (int8 KV, real cache len).

attn_probe.py measured ~330 GB/s effective (bf16, r2 shapes); at the r5
serving point (B=24, S=3072) the cache stripe is 150 MB/layer — if the
kernel still runs at 330 GB/s it costs 455 us/layer (14.5 ms/step on
attention alone) vs 183 us at the 819 GB/s roofline, making attention the
single biggest decode inefficiency.  This probe times the int8 kernel per
(B, S, hpb) and prints the implied bandwidth, to decide whether a layout/
blocking fix is worth the kernel work.

    python benchmarks/attn_bw_probe.py [--b 24] [--s 3072] [--hpb 2 4 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

L, NKV, G, HD = 32, 8, 4, 128
H = NKV * G


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=24)
    ap.add_argument("--s", type=int, default=3072)
    ap.add_argument("--hpb", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--bf16", action="store_true", help="bf16 cache instead")
    ap.add_argument("--xla", action="store_true", help="also time the XLA path")
    ap.add_argument("--dma-only", action="store_true",
                    help="stream the same K/V blocks through the same grid "
                         "but touch only one row per block — the pure-DMA "
                         "roofline for this access pattern (isolates HBM "
                         "streaming from the attention compute)")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    B, S = args.b, args.s

    from trace_tpu.kernels.decode_attention import decode_attention
    from trace_tpu.model.mistral import _attention

    if args.bf16:
        cache = (
            jnp.zeros((L, B, NKV, S, HD), jnp.bfloat16),
            jnp.zeros((L, B, NKV, S, HD), jnp.bfloat16),
        )
        kv_bytes = 2 * L * B * NKV * S * HD * 2
    else:
        cache = {
            "kq": jnp.zeros((L, B, NKV, S, HD), jnp.int8),
            "ks": jnp.ones((L, B, NKV, 1, S), jnp.bfloat16),
            "vq": jnp.zeros((L, B, NKV, S, HD), jnp.int8),
            "vs": jnp.ones((L, B, NKV, 1, S), jnp.bfloat16),
        }
        kv_bytes = 2 * L * B * NKV * S * (HD + 2 * 2)
    q = jnp.zeros((B, H, 1, HD), jnp.bfloat16)
    bias = jnp.zeros((B, S), jnp.float32)

    def _dma_only_attention(q, cache, li, bias, hpb):
        """Same grid + BlockSpecs as decode_attention's int8 path; the
        kernel body reads one sublane row of each K/V block (the whole
        block still DMAs into VMEM) and does one add — pure streaming."""
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        Bq, Hq, _, hd = q.shape
        Gq = Hq // NKV
        qg = q.reshape(Bq, NKV, Gq, hd)
        li_arr = jnp.reshape(li, (1,)).astype(jnp.int32)

        def q_map(b, n, li_ref):
            return (b, n, 0, 0)

        def kv_map(b, n, li_ref):
            return (li_ref[0], b, n, 0, 0)

        def kernel(li_ref, q_ref, kq_ref, vq_ref, o_ref, *, hpb):
            for h in range(hpb):
                row = (kq_ref[0, 0, h, :1, :].astype(jnp.float32)
                       + vq_ref[0, 0, h, :1, :].astype(jnp.float32))
                o_ref[0, h] = jnp.broadcast_to(
                    row, o_ref.shape[2:]
                ).astype(o_ref.dtype)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bq, NKV // hpb),
            in_specs=[
                pl.BlockSpec((1, hpb, Gq, hd), q_map),
                pl.BlockSpec((1, 1, hpb, S, hd), kv_map),
                pl.BlockSpec((1, 1, hpb, S, hd), kv_map),
            ],
            out_specs=pl.BlockSpec((1, hpb, Gq, hd), q_map),
        )
        out = pl.pallas_call(
            functools.partial(kernel, hpb=hpb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Bq, NKV, Gq, hd), q.dtype),
        )(li_arr, qg, cache["kq"], cache["vq"])
        return out.reshape(Bq, Hq, 1, hd)

    def make_sweep(dma_hpb=None):
        @jax.jit
        def sweep(q, cache, bias):
            def body(acc, li):
                if dma_hpb is not None:
                    o = _dma_only_attention(q, cache, li, bias, dma_hpb)
                else:
                    o = decode_attention(q, cache, li, bias)
                return acc + o.astype(jnp.float32), None
            acc, _ = jax.lax.scan(
                body, jnp.zeros(q.shape, jnp.float32), jnp.arange(L)
            )
            return jnp.sum(acc)
        return sweep

    if args.dma_only:
        kv_bytes_dma = 2 * L * B * NKV * S * HD  # int8 K+V only, no scales
        for hpb in args.hpb:
            sweep = make_sweep(dma_hpb=hpb)
            t0 = time.time()
            np.asarray(sweep(q, cache, bias))
            tc = time.time() - t0
            t0 = time.time()
            for _ in range(args.reps):
                r = sweep(q, cache, bias)
            np.asarray(r)
            dt = (time.time() - t0) / args.reps
            print(
                f"dma-only hpb={hpb}: compile {tc:.0f}s sweep {dt*1e3:.2f} ms "
                f"({kv_bytes_dma/1e9/dt:.0f} GB/s, {dt/L*1e6:.0f} us/layer) "
                f"B={B} S={S} int8",
                flush=True,
            )
        return

    for hpb in args.hpb:
        os.environ["TRACE_TPU_DECODE_ATTN_HPB"] = str(hpb)
        sweep = make_sweep()
        t0 = time.time()
        np.asarray(sweep(q, cache, bias))
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(args.reps):
            r = sweep(q, cache, bias)
        np.asarray(r)
        dt = (time.time() - t0) / args.reps
        print(
            f"pallas hpb={hpb}: compile {tc:.0f}s sweep {dt*1e3:.2f} ms "
            f"({kv_bytes/1e9/dt:.0f} GB/s, {dt/L*1e6:.0f} us/layer) "
            f"B={B} S={S} {'bf16' if args.bf16 else 'int8'}",
            flush=True,
        )

    if args.xla:
        @jax.jit
        def sweep_xla(q, cache, bias):
            def body(acc, li):
                if isinstance(cache, dict):
                    kq = jax.lax.dynamic_index_in_dim(cache["kq"], li, 0, False)
                    ks = jax.lax.dynamic_index_in_dim(cache["ks"], li, 0, False)
                    vq = jax.lax.dynamic_index_in_dim(cache["vq"], li, 0, False)
                    vs = jax.lax.dynamic_index_in_dim(cache["vs"], li, 0, False)
                    ks_ = jnp.swapaxes(ks, -1, -2)
                    vs_ = jnp.swapaxes(vs, -1, -2)
                    kk = kq.astype(jnp.bfloat16) * ks_
                    vv = vq.astype(jnp.bfloat16) * vs_
                else:
                    kk = jax.lax.dynamic_index_in_dim(cache[0], li, 0, False)
                    vv = jax.lax.dynamic_index_in_dim(cache[1], li, 0, False)
                o = _attention(q, kk, vv, bias[:, None, None, :])
                return acc + o.astype(jnp.float32), None
            acc, _ = jax.lax.scan(
                body, jnp.zeros(q.shape, jnp.float32), jnp.arange(L)
            )
            return jnp.sum(acc)

        t0 = time.time()
        np.asarray(sweep_xla(q, cache, bias))
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(args.reps):
            r = sweep_xla(q, cache, bias)
        np.asarray(r)
        dt = (time.time() - t0) / args.reps
        print(
            f"xla: compile {tc:.0f}s sweep {dt*1e3:.2f} ms "
            f"({kv_bytes/1e9/dt:.0f} GB/s, {dt/L*1e6:.0f} us/layer)",
            flush=True,
        )


if __name__ == "__main__":
    main()
