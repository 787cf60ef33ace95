"""int8 weight-only quantization: closeness, memory, and pipeline integration."""

import jax
import jax.numpy as jnp
import numpy as np

from trace_tpu.model.config import DecoderConfig, TraceConfig
from trace_tpu.model.mistral import compute_logits, decoder_forward, init_decoder_params
from trace_tpu.model.quantize import (
    dequantize,
    is_quantized,
    quantize_decoder_params,
    quantize_trace_params,
)

CFG = DecoderConfig.tiny()


def test_roundtrip_error_small():
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 128)) * 0.05
    from trace_tpu.model.quantize import _quantize_axis

    q = _quantize_axis(w, (1,))
    back = np.asarray(dequantize(q, jnp.float32))
    err = np.abs(back - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert err < 0.01  # <1% of the max weight


def test_quantized_logits_close_to_bf16():
    params = init_decoder_params(CFG, jax.random.PRNGKey(1))
    qparams = quantize_decoder_params(params)
    assert is_quantized(qparams["layers"]["wq"])
    assert qparams["layers"]["wq"]["q"].dtype == jnp.int8

    B, T = 2, 12
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, CFG.hidden_size)) * 0.1
    mask = jnp.ones((B, T), bool)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))

    h_ref, _ = decoder_forward(params, CFG, x, mask, pos)
    l_ref = np.asarray(compute_logits(params, h_ref))
    h_q, _ = decoder_forward(qparams, CFG, x, mask, pos)
    l_q = np.asarray(compute_logits(qparams, h_q))

    # top-1 agreement on most positions + bounded absolute deviation
    agree = (l_ref.argmax(-1) == l_q.argmax(-1)).mean()
    assert agree > 0.9, agree
    assert np.abs(l_ref - l_q).max() < 0.3 * np.abs(l_ref).max()


def test_memory_shrinks():
    params = init_decoder_params(CFG, jax.random.PRNGKey(3))
    q = quantize_decoder_params(params)

    def nbytes(t):
        return sum(x.nbytes for x in jax.tree.leaves(t))

    assert nbytes(q["layers"]) < 0.45 * nbytes(params["layers"])


def test_full_pipeline_with_quant():
    from trace_tpu.model.trace_model import init_trace_params
    from trace_tpu.runtime.pipeline import TracePipeline
    from trace_tpu.tokenizers.text import ByteTokenizer

    cfg = TraceConfig.tiny()
    params = init_trace_params(cfg, jax.random.PRNGKey(4))
    qparams = quantize_trace_params(params)
    pipe = TracePipeline(params=qparams, config=cfg, tokenizer=ByteTokenizer())
    frames = np.random.default_rng(0).integers(
        0, 255, (cfg.num_frames, 56, 56, 3), dtype=np.uint8
    )
    ts = [[float(i)] for i in range(cfg.num_frames)]
    preds = pipe.infer_events_from_frames(frames, ts, "q", max_new_tokens=8)
    assert preds is not None
