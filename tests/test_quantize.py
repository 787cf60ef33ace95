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


class TestW8A8:
    """Dynamic-activation int8 x int8 path vs the weight-only dequant path."""

    def test_quantize_acts_roundtrip(self):
        from trace_tpu.kernels.quant_matmul import quantize_acts

        x = jax.random.normal(jax.random.PRNGKey(0), (8, 64), jnp.float32)
        xq, xs = quantize_acts(x)
        assert xq.dtype == jnp.int8 and xs.shape == (8, 1)
        recon = xq.astype(jnp.float32) * xs
        err = jnp.abs(recon - x).max() / jnp.abs(x).max()
        assert float(err) < 0.01  # 127-level quantization of one row

    def test_w8a8_matches_weight_only(self):
        from trace_tpu.kernels.quant_matmul import (
            quant_apply, quant_apply_w8a8, quantize_acts,
        )
        from trace_tpu.model.quantize import _quantize_axis

        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (4, 16, 64), jnp.float32) * 0.5
        w = jax.random.normal(jax.random.PRNGKey(2), (64, 96), jnp.float32) * 0.1
        leaf = _quantize_axis(w, (0,))

        ref = quant_apply(x, leaf, (96,), out_dtype=jnp.float32)
        xq, xs = quantize_acts(x)
        got = quant_apply_w8a8(xq, xs, leaf, (96,), out_dtype=jnp.float32)
        denom = float(jnp.abs(ref).mean())
        rel = float(jnp.abs(got - ref).mean()) / denom
        assert rel < 0.02, rel  # activation quantization noise only

    def test_prefill_w8a8_close_to_weight_only(self):
        """Whole-decoder prefill with act_quant on vs off (same int8 weights)."""
        import dataclasses

        from trace_tpu.model.config import DecoderConfig
        from trace_tpu.model.mistral import decoder_forward, init_decoder_params
        from trace_tpu.model.quantize import quantize_decoder_params

        cfg = DecoderConfig.tiny()
        cfg_aq = dataclasses.replace(cfg, act_quant=True)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        qparams = quantize_decoder_params(params)

        B, T = 2, 12
        embeds = jax.random.normal(jax.random.PRNGKey(3), (B, T, cfg.hidden_size)) * 0.1
        mask = jnp.ones((B, T), bool)
        pos = jnp.broadcast_to(jnp.arange(T), (B, T))

        h_ref, _ = decoder_forward(qparams, cfg, embeds, mask, pos)
        h_aq, _ = decoder_forward(qparams, cfg_aq, embeds, mask, pos)
        denom = float(jnp.abs(h_ref).mean())
        rel = float(jnp.abs(h_aq - h_ref).mean()) / denom
        assert rel < 0.05, rel

    def test_decode_unaffected_by_act_quant(self):
        """T=1 cache decode must take the weight-only path regardless."""
        import dataclasses

        from trace_tpu.model.config import DecoderConfig
        from trace_tpu.model.mistral import (
            decoder_forward, init_decoder_params, init_kv_cache,
        )
        from trace_tpu.model.quantize import quantize_decoder_params

        cfg = DecoderConfig.tiny()
        cfg_aq = dataclasses.replace(cfg, act_quant=True)
        qparams = quantize_decoder_params(
            init_decoder_params(cfg, jax.random.PRNGKey(0))
        )
        B = 2
        x = jax.random.normal(jax.random.PRNGKey(4), (B, 1, cfg.hidden_size)) * 0.1
        mask = jnp.ones((B, 1), bool)
        pos = jnp.zeros((B, 1), jnp.int32)

        def run(c):
            cache = init_kv_cache(c, B, 8)
            h, _ = decoder_forward(
                qparams, c, x, mask, pos, cache=cache,
                cache_index=jnp.int32(0),
                cache_mask=jnp.zeros((B, 8), bool),
            )
            return h

        assert jnp.allclose(run(cfg), run(cfg_aq))

    def test_w4a8_matches_weight_only(self):
        """Packed-int4 leaf through the s8xs8 dot (W4A8) vs the XLA
        unpack+dequant path — same weights, activation-quant noise only."""
        from trace_tpu.kernels.quant_matmul import (
            quant_apply, quant_apply_w8a8, quantize_acts,
        )
        from trace_tpu.model.quantize import _quantize_axis, pack4

        x = jax.random.normal(jax.random.PRNGKey(6), (4, 16, 64), jnp.float32) * 0.5
        w = jax.random.normal(jax.random.PRNGKey(7), (64, 96), jnp.float32) * 0.1
        q4 = _quantize_axis(w, (0,), bits=4, qdtype=jnp.int8)
        leaf = {"qp": pack4(q4["q"]), "s": q4["s"]}
        assert leaf["qp"].shape == (32, 96)

        ref = quant_apply(x, leaf, (96,), out_dtype=jnp.float32)
        xq, xs = quantize_acts(x)
        got = quant_apply_w8a8(xq, xs, leaf, (96,), out_dtype=jnp.float32)
        rel = float(jnp.abs(got - ref).mean()) / float(jnp.abs(ref).mean())
        assert rel < 0.02, rel

    def test_prefill_w4a8_close_to_weight_only(self):
        """Whole-decoder int4p prefill: act_quant on (W4A8) vs off."""
        import dataclasses

        from trace_tpu.model.config import DecoderConfig
        from trace_tpu.model.mistral import decoder_forward, init_decoder_params
        from trace_tpu.model.quantize import quantize_decoder_params

        cfg = DecoderConfig.tiny()
        cfg_aq = dataclasses.replace(cfg, act_quant=True)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        qparams = quantize_decoder_params(params, bits=4, pack=True)

        B, T = 2, 12
        embeds = jax.random.normal(jax.random.PRNGKey(8), (B, T, cfg.hidden_size)) * 0.1
        mask = jnp.ones((B, T), bool)
        pos = jnp.broadcast_to(jnp.arange(T), (B, T))

        h_ref, _ = decoder_forward(qparams, cfg, embeds, mask, pos)
        h_aq, _ = decoder_forward(qparams, cfg_aq, embeds, mask, pos)
        rel = float(jnp.abs(h_aq - h_ref).mean()) / float(jnp.abs(h_ref).mean())
        assert rel < 0.05, rel

    def test_vit_w8a8_close(self):
        import dataclasses

        from trace_tpu.model.config import VisionConfig
        from trace_tpu.model.quantize import quantize_vision_params
        from trace_tpu.model.vit import init_vit_params, vit_forward

        cfg = VisionConfig.tiny()
        cfg_aq = dataclasses.replace(cfg, act_quant=True)
        params = quantize_vision_params(init_vit_params(cfg, jax.random.PRNGKey(0)))
        imgs = jax.random.uniform(jax.random.PRNGKey(5), (2, 56, 56, 3))

        a = vit_forward(params, cfg, imgs)
        b = vit_forward(params, cfg_aq, imgs)
        denom = float(jnp.abs(a).mean())
        rel = float(jnp.abs(a - b).mean()) / denom
        assert rel < 0.05, rel


class TestInt4:
    """4-bit weight-only path (the bitsandbytes-4bit analog, reference
    model/builder.py:39-48): packed int4 storage, XLA dequant, no W8A8."""

    def test_roundtrip_dtype_and_error(self):
        from trace_tpu.model.quantize import _quantize_axis

        w = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 128)) * 0.05
        q4 = _quantize_axis(w, (1,), bits=4)
        assert q4["q"].dtype == jnp.int4
        back = np.asarray(dequantize(q4, jnp.float32))
        err = np.abs(back - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
        assert err < 0.08  # 4-bit: ~1/14 of the per-channel max

    def test_quant_apply_matches_dequant_einsum(self):
        from trace_tpu.kernels.quant_matmul import quant_apply
        from trace_tpu.model.quantize import _quantize_axis

        w = jax.random.normal(jax.random.PRNGKey(1), (64, 96)) * 0.05
        leaf = _quantize_axis(w, (0,), bits=4)
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 64), jnp.float32)
        got = np.asarray(quant_apply(x, leaf, (96,), out_dtype=jnp.float32))
        # fp32 dequant reference (dequantize() itself rounds through bf16)
        wf = leaf["q"].astype(jnp.float32) * leaf["s"].astype(jnp.float32)
        want = np.asarray(x @ wf)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_int4_decoder_runs_and_tracks_bf16(self):
        params = init_decoder_params(CFG, jax.random.PRNGKey(3))
        q4 = quantize_decoder_params(params, bits=4)
        assert q4["layers"]["wq"]["q"].dtype == jnp.int4
        assert q4["lm_head"]["q"].dtype == jnp.int8  # head stays 8-bit

        B, T = 2, 12
        x = jax.random.normal(jax.random.PRNGKey(4), (B, T, CFG.hidden_size)) * 0.1
        mask = jnp.ones((B, T), bool)
        pos = jnp.broadcast_to(jnp.arange(T), (B, T))
        h_ref, _ = decoder_forward(params, CFG, x, mask, pos)
        l_ref = np.asarray(compute_logits(params, h_ref))
        h_q, _ = decoder_forward(q4, CFG, x, mask, pos)
        l_q = np.asarray(compute_logits(q4, h_q))
        assert np.isfinite(l_q).all()
        # looser than int8 but still tracking the bf16 logits
        agree = (l_ref.argmax(-1) == l_q.argmax(-1)).mean()
        assert agree > 0.6, agree

    def test_memory_halves_vs_int8(self):
        # jnp.int4 reports 1 byte/elt off-TPU; measure information content
        params = init_decoder_params(CFG, jax.random.PRNGKey(5))
        q8 = quantize_decoder_params(params, bits=8)
        q4 = quantize_decoder_params(params, bits=4)

        def qbits(t):
            return sum(
                x.size * (4 if x.dtype == jnp.int4 else 8 * x.dtype.itemsize)
                for x in jax.tree.leaves(t)
            )

        assert qbits(q4["layers"]) < 0.55 * qbits(q8["layers"])

    def test_model_init_int4_config(self, tmp_path):
        # host-side quantizer + pipeline config: weight-only (no act quant)
        from trace_tpu.model.quantize import quantize_decoder_params_host

        params = jax.tree.map(np.asarray, init_decoder_params(CFG, jax.random.PRNGKey(6)))
        q = quantize_decoder_params_host(params, bits=4)
        import ml_dtypes

        assert q["layers"]["wq"]["q"].dtype == ml_dtypes.int4


class TestInt4Packed:
    """Nibble-packed int4 ('int4p'): plain-int8 storage of 4-bit weights."""

    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(0)
        from trace_tpu.model.quantize import pack4, unpack4

        q = jnp.asarray(rng.integers(-7, 8, (2, 16, 6)), jnp.int8)
        np.testing.assert_array_equal(np.asarray(unpack4(pack4(q))), np.asarray(q))

    def test_quant_matmul_p4_interpret_matches_unpacked(self):
        from trace_tpu.kernels.quant_matmul import quant_matmul_p4
        from trace_tpu.model.quantize import unpack4

        rng = np.random.default_rng(1)
        M, K, N = 10, 64, 48
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
        qp = jnp.asarray(rng.integers(-128, 128, (K // 2, N)), jnp.int8)
        s = jnp.asarray(rng.uniform(0.01, 0.1, (N,)), jnp.float32)
        want = (x @ unpack4(qp).astype(jnp.float32)) * s[None]
        got = quant_matmul_p4(x, qp, s, out_dtype=jnp.float32, interpret=True,
                              bm=8, bn=16, bk=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_decoder_forward_int4p_matches_int4(self):
        """Packed storage holds the SAME quantized values as jnp.int4 mode;
        the tiny decoder must produce identical logits through both."""
        import dataclasses

        from trace_tpu.model.config import DecoderConfig
        from trace_tpu.model.mistral import init_decoder_params, decoder_forward
        from trace_tpu.model.quantize import quantize_decoder_params

        cfg = dataclasses.replace(DecoderConfig.tiny(), act_quant=False)
        params = init_decoder_params(cfg, jax.random.PRNGKey(2))
        p_i4 = dict(params)
        p_i4["layers"] = quantize_decoder_params(params, bits=4)["layers"]
        p_p4 = dict(params)
        p_p4["layers"] = quantize_decoder_params(params, bits=4, pack=True)["layers"]

        x = jax.random.normal(jax.random.PRNGKey(3), (2, 6, cfg.hidden_size)) * 0.1
        x = x.astype(jnp.float32)
        mask = jnp.ones((2, 6), bool)
        pos = jnp.arange(6)[None].repeat(2, 0)
        h4, _ = decoder_forward(p_i4, cfg, x, mask, pos)
        hp, _ = decoder_forward(p_p4, cfg, x, mask, pos)
        np.testing.assert_allclose(
            np.asarray(h4, np.float32), np.asarray(hp, np.float32),
            rtol=2e-3, atol=2e-3,
        )

    def test_host_pack_matches_device_pack(self):
        from trace_tpu.model.config import DecoderConfig
        from trace_tpu.model.mistral import init_decoder_params
        from trace_tpu.model.quantize import (
            quantize_decoder_params,
            quantize_decoder_params_host,
        )

        cfg = DecoderConfig.tiny()
        params = init_decoder_params(cfg, jax.random.PRNGKey(4))
        dev = quantize_decoder_params(params, bits=4, pack=True)
        host_in = jax.tree.map(np.asarray, params)
        host = quantize_decoder_params_host(host_in, bits=4, pack=True)
        for name in ("wq", "wo", "w_down"):
            np.testing.assert_array_equal(
                np.asarray(dev["layers"][name]["qp"]),
                np.asarray(host["layers"][name]["qp"]),
            )
            np.testing.assert_allclose(
                np.asarray(dev["layers"][name]["s"], np.float32),
                np.asarray(host["layers"][name]["s"], np.float32),
            )


class TestInt4PackedGrouped:
    """Group-128 scales for nibble-packed int4 (the 7B quality fix over
    per-channel absmax — r4 divergence: 0.3% agreement, rms 7.4x margin)."""

    def _grouped_leaf(self, K=512, N=96, seed=0, group=128):
        from trace_tpu.model.quantize import _quantize_grouped4

        rng = np.random.default_rng(seed)
        w = jnp.asarray(rng.normal(size=(1, K, N)) * 0.05, jnp.float32)
        # inject per-row outliers so group scales genuinely differ
        w = w.at[0, :: K // 4].mul(8.0)
        leaf = _quantize_grouped4(w, (1,), group)
        return w, {"qp": leaf["qp"][0], "s": leaf["s"][0]}

    def test_grouped_shapes_and_dequant(self):
        from trace_tpu.model.quantize import dequantize, packed4_groups

        K, N = 512, 96
        w, leaf = self._grouped_leaf(K, N)
        full = {"qp": leaf["qp"][None], "s": leaf["s"][None]}
        assert leaf["s"].shape == (K // 128, N)
        assert packed4_groups(full) == K // 128
        back = np.asarray(dequantize(full, jnp.float32))[0]
        err = np.abs(back - np.asarray(w[0]))
        # each group's error bounded by its own scale: half a 4-bit step
        # plus the bf16 scale-storage slop (scales are stored bf16, so the
        # dequant scale differs from the quantization scale by <= 2^-8 rel)
        gmax = np.abs(np.asarray(w[0])).reshape(K // 128, 128, N).max(1)
        bound = np.repeat(gmax / 7 * (0.5 + 7 * 2.0 ** -8) + 1e-6, 128, 0)
        assert (err <= bound + 1e-5).all()

    def test_grouped_beats_per_channel_on_outliers(self):
        from trace_tpu.model.quantize import (
            _quantize_axis, dequantize, _quantize_grouped4,
        )

        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.normal(size=(1, 512, 64)) * 0.02, jnp.float32)
        w = w.at[0, 7].mul(20.0)  # one outlier row wrecks per-channel scales
        g = _quantize_grouped4(w, (1,), 128)
        pc = _quantize_axis(w, (1,), bits=4, qdtype=jnp.int8)
        wg = np.asarray(dequantize(g, jnp.float32))
        wp = np.asarray(
            (pc["q"].astype(jnp.float32) * pc["s"].astype(jnp.float32))
        )
        err_g = np.abs(wg - np.asarray(w)).mean()
        err_p = np.abs(wp - np.asarray(w)).mean()
        assert err_g < err_p / 2, (err_g, err_p)

    def test_grouped_kernel_interpret_matches_fallback(self):
        from trace_tpu.kernels.quant_matmul import (
            quant_apply, quant_matmul_p4_grouped,
        )
        from trace_tpu.model.quantize import unpack4

        K, N, M = 512, 96, 10
        w, leaf = self._grouped_leaf(K, N, seed=5)
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
        G = K // 128
        wref = np.asarray(unpack4(leaf["qp"]), np.float32).reshape(G, K // G, N)
        wref = (wref * np.asarray(leaf["s"], np.float32)[:, None]).reshape(K, N)
        want = np.asarray(x) @ wref
        got_k = quant_matmul_p4_grouped(
            x, leaf["qp"], leaf["s"].astype(jnp.float32),
            out_dtype=jnp.float32, interpret=True, bm=8, bn=32, bk=128,
        )
        np.testing.assert_allclose(np.asarray(got_k), want, rtol=1e-4, atol=1e-4)
        # quant_apply routes grouped leaves to the XLA fallback on CPU
        got_a = quant_apply(x, leaf, (N,), out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got_a), want, rtol=1e-4, atol=1e-4)

    def test_grouped_decoder_forward_and_host_parity(self):
        """7B-shaped grouping on a mid-size config (hidden 256 -> G=2):
        device/host quantizers agree bit-exactly; forward runs weight-only
        even under act_quant (no W4A8 form for grouped leaves)."""
        import dataclasses

        from trace_tpu.model.config import DecoderConfig
        from trace_tpu.model.mistral import decoder_forward, init_decoder_params
        from trace_tpu.model.quantize import (
            quantize_decoder_params, quantize_decoder_params_host,
        )

        cfg = dataclasses.replace(
            DecoderConfig.tiny(), hidden_size=256, intermediate_size=256,
            num_heads=4, num_kv_heads=2, head_dim=64, act_quant=True,
        )
        params = init_decoder_params(cfg, jax.random.PRNGKey(9))
        dev = quantize_decoder_params(params, bits=4, pack=True)
        assert dev["layers"]["wq"]["s"].shape[1] == 2  # 256 / 128
        host = quantize_decoder_params_host(
            jax.tree.map(np.asarray, params), bits=4, pack=True
        )
        for name in ("wq", "wo", "w_down"):
            np.testing.assert_array_equal(
                np.asarray(dev["layers"][name]["qp"]),
                np.asarray(host["layers"][name]["qp"]),
            )
            np.testing.assert_allclose(
                np.asarray(dev["layers"][name]["s"], np.float32),
                np.asarray(host["layers"][name]["s"], np.float32),
            )
        x = jax.random.normal(jax.random.PRNGKey(10), (2, 6, 256)) * 0.1
        mask = jnp.ones((2, 6), bool)
        pos = jnp.arange(6)[None].repeat(2, 0)
        h, _ = decoder_forward(dev, cfg, x.astype(jnp.float32), mask, pos)
        ref, _ = decoder_forward(params, cfg, x.astype(jnp.float32), mask, pos)
        rel = float(jnp.abs(h - ref).mean() / jnp.abs(ref).mean())
        assert np.isfinite(np.asarray(h)).all()
        assert rel < 0.25, rel  # 4-bit noise bound at random weights

    def test_grouped_fuse_unfuse(self):
        from trace_tpu.model.config import DecoderConfig
        from trace_tpu.model.mistral import decoder_forward, init_decoder_params
        from trace_tpu.model.quantize import (
            fuse_decoder_serving, quantize_decoder_params,
            unfuse_decoder_serving,
        )
        import dataclasses

        cfg = dataclasses.replace(
            DecoderConfig.tiny(), hidden_size=256, intermediate_size=256,
            num_heads=4, num_kv_heads=2, head_dim=64,
        )
        params = init_decoder_params(cfg, jax.random.PRNGKey(11))
        qp = quantize_decoder_params(params, bits=4, pack=True)
        fused = fuse_decoder_serving(qp)
        assert "wqkv" in fused["layers"]
        assert fused["layers"]["wqkv"]["s"].shape[1] == 2  # groups preserved
        x = jax.random.normal(jax.random.PRNGKey(12), (2, 5, 256)) * 0.1
        mask = jnp.ones((2, 5), bool)
        pos = jnp.arange(5)[None].repeat(2, 0)
        h_ref, _ = decoder_forward(qp, cfg, x.astype(jnp.float32), mask, pos)
        h_f, _ = decoder_forward(fused, cfg, x.astype(jnp.float32), mask, pos)
        np.testing.assert_allclose(
            np.asarray(h_f, np.float32), np.asarray(h_ref, np.float32),
            rtol=2e-2, atol=2e-3,
        )
        back = unfuse_decoder_serving(fused)
        for name in ("wq", "wk", "wv", "w_gate", "w_up"):
            np.testing.assert_array_equal(
                np.asarray(back["layers"][name]["qp"]),
                np.asarray(qp["layers"][name]["qp"]).reshape(
                    qp["layers"][name]["qp"].shape[0],
                    qp["layers"][name]["qp"].shape[1], -1,
                ),
            )
