"""Probe: int8 decode with XLA-level dequantization from a clean device state.

Determines whether the earlier int8 OOM came from dequant hoisting or from
allocator poisoning by the giant on-device quantize program (this script
never runs one — quantized zero-params are built directly).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import init_decoder_params
from trace_tpu.model.quantize import quantize_decoder_params
from trace_tpu.runtime.generate import build_combined_embedding, generate_jit


def main(use_pallas: bool):
    if not use_pallas:
        # monkeypatch the quant path back to XLA dequant einsums
        import trace_tpu.model.quantize as Q

        orig = Q.is_quantized
        import trace_tpu.model.mistral as M

        real_layer = M._layer

        # easiest: dequantize params up-front per-layer inside the scan via
        # plain arrays is NOT what we test; instead patch quant_apply to the
        # einsum fallback:
        from trace_tpu.kernels import quant_matmul as QM

        def xla_apply(x, leaf, out_shape, *, out_dtype=None, interpret=False):
            if isinstance(leaf, dict):
                w = (leaf["q"].astype(x.dtype) * leaf["s"].astype(x.dtype)).reshape(
                    x.shape[-1], -1
                )
            else:
                w = leaf.reshape(x.shape[-1], -1)
            y = jnp.einsum(
                "mk,kn->mn", x.reshape(-1, x.shape[-1]), w,
                preferred_element_type=jnp.float32,
            ).astype(out_dtype or x.dtype)
            return y.reshape(x.shape[:-1] + out_shape)

        QM.quant_apply = xla_apply
        import trace_tpu.model.mistral as M2  # noqa

    cfg = DecoderConfig()
    qshapes = jax.eval_shape(
        lambda k: quantize_decoder_params(
            init_decoder_params(cfg, k, dtype=jnp.bfloat16)
        ),
        jax.random.PRNGKey(0),
    )
    qp = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), qshapes)
    emb = build_combined_embedding(
        qp["embed"], jnp.zeros((1, 4096), jnp.bfloat16),
        jnp.zeros((13, 4096), jnp.bfloat16), jnp.zeros((13, 4096), jnp.bfloat16),
    )
    qp2 = dict(qp)
    qp2.pop("embed")

    for B, P, new in [(1, 2048, 64), (8, 2048, 64)]:
        try:
            prefix = jnp.zeros((B, P, 4096), jnp.bfloat16)
            t0 = time.time()
            tokens, _ = generate_jit(
                qp2, cfg, prefix, jnp.ones((B, P), bool), emb,
                jnp.ones((B,), jnp.int32),
                max_new_tokens=new, cache_len=P + new, use_flash=True,
                rng=jax.random.PRNGKey(0),
            )
            np.asarray(tokens)
            t1 = time.time()
            tokens, _ = generate_jit(
                qp2, cfg, prefix, jnp.ones((B, P), bool), emb,
                jnp.ones((B,), jnp.int32),
                max_new_tokens=new, cache_len=P + new, use_flash=True,
                rng=jax.random.PRNGKey(1),
            )
            np.asarray(tokens)
            dt = time.time() - t1
            print(f"B={B}: OK compile {t1-t0:.0f}s steady {dt:.2f}s "
                  f"-> {B*new/dt:.1f} tok/s", flush=True)
        except Exception as e:
            print(f"B={B}: FAIL {str(e)[:110]}", flush=True)


if __name__ == "__main__":
    main(use_pallas="--pallas" in sys.argv)
