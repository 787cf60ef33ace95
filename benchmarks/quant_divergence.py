"""int8/int4-vs-bf16 decode-divergence probe on shared random 7B weights.

The serving throughput story rests on quantized configs whose quality cannot
be validated against released checkpoints in this environment (zero egress —
PARITY.md).  This probe is the weights-free proxy: with the SAME
random-but-realistically-scaled 7B decoder weights, how closely does the
quantized greedy decode track the bf16 decode over >=1k steps?

Two measurements (batch 1, head FSM active, greedy):

1. free-running divergence: the first position where the quantized greedy
   stream departs from the bf16 stream (after that, autoregressive drift
   makes per-token comparison meaningless);
2. teacher-forced per-step agreement: quantized forward over the bf16
   token stream, per-position head-masked argmax vs the bf16 token —
   agreement rate overall and per 128-token window (the divergence curve).

Phases run in FRESH processes (one TPU process at a time; bf16 + int8
weights cannot co-reside on a 16 GB chip):

    python benchmarks/quant_divergence.py --phase bf16
    python benchmarks/quant_divergence.py --phase int8
    python benchmarks/quant_divergence.py --phase int4
    python benchmarks/quant_divergence.py --report

Artifacts land in benchmarks/_divergence/.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_divergence")


def _leaf_seed(path: str) -> int:
    import zlib

    return zlib.crc32(path.encode()) & 0x7FFFFFFF


def random_host_decoder(config, dtype_name="bfloat16"):
    """Realistically-scaled random decoder params built on HOST numpy
    (device init of 7B random weights is a 14.5 GB program; the relay
    misbehaves after large-working-set programs — see bench.zero_params)."""
    import jax
    import ml_dtypes

    from trace_tpu.model.mistral import init_decoder_params

    shapes = jax.eval_shape(
        lambda k: init_decoder_params(config, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    dtype = getattr(ml_dtypes, dtype_name)

    def fill(path, s):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        rng = np.random.default_rng(_leaf_seed(name))
        if "norm" in name.rsplit("/", 1)[-1]:
            return np.ones(s.shape, dtype)
        return (rng.standard_normal(s.shape, np.float32) * 0.02).astype(dtype)

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(fill, shapes)


import jax  # noqa: E402  (after numpy/host helpers)
import jax.numpy as jnp  # noqa: E402


def head_states_from_stream(config, tokens: np.ndarray, initial_head: int = 1):
    """Head state BEFORE each emission, from the swap_tokens FSM rules."""
    v, vt = config.vocab_size, config.time_vocab_size
    states = np.zeros(len(tokens), np.int32)
    h = initial_head
    for i, t in enumerate(tokens):
        states[i] = h
        if t == v:
            h = 1
        elif t == v + 1:
            h = 2
        elif t == v + 1 + vt:
            h = 0
    return states


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase",
                    choices=["bf16", "int8", "int4", "int4p", "vit8"],
                    default=None)
    ap.add_argument("--fused", action="store_true",
                    help="apply the fuse_decoder_serving layout (wqkv + "
                         "gateup) to the quantized phase — validates the "
                         "serving layout at 7B scale (artifacts tagged "
                         "<phase>_fused)")
    ap.add_argument("--group", type=int, default=128,
                    help="int4p scale group size along K (0 = legacy "
                         "per-output-channel — the layout that collapsed "
                         "to 0.3%% agreement at 7B, r4). Artifacts for "
                         "grouped runs are tagged int4p_g<group>.")
    ap.add_argument("--suffix", default="",
                    help="extra artifact tag for env-variant runs (e.g. "
                         "'w8a8dec' when TRACE_TPU_DECODE_W8A8=1, 's8attn' "
                         "for the s8dot decode-attention kernel) — appended "
                         "as <phase>_<suffix>")
    ap.add_argument("--report", action="store_true")
    ap.add_argument("--tokens", type=int, default=1024)
    ap.add_argument("--prefix", type=int, default=256)
    ap.add_argument("--small", action="store_true", help="tiny config smoke")
    ap.add_argument("--logits-only", action="store_true",
                    help="skip the free-running decode; only run the "
                         "teacher-forced logits pass over the existing "
                         "bf16 stream")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) — JAX_PLATFORMS "
                         "is ignored under the axon sitecustomize")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    os.makedirs(OUT_DIR, exist_ok=True)
    tag = "small" if args.small else "7b"

    if args.report:
        report(tag)
        return

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    if args.phase == "vit8":
        return vit8_phase(args, tag)

    from trace_tpu.model.config import DecoderConfig
    from trace_tpu.model.mistral import compute_logits, decoder_forward
    from trace_tpu.model.quantize import (
        quantize_decoder_params_host,
    )
    from trace_tpu.runtime import generate as gen

    if args.small:
        config = DecoderConfig.tiny()
        args.tokens = min(args.tokens, 192)
        args.prefix = min(args.prefix, 64)
    else:
        config = DecoderConfig(kv_cache_dtype="int8")

    print(f"[{args.phase}] building host params...", flush=True)
    t0 = time.time()
    params = random_host_decoder(config)
    if args.phase == "int8":
        params = quantize_decoder_params_host(params, bits=8)
    elif args.phase == "int4":
        params = quantize_decoder_params_host(params, bits=4)
    elif args.phase == "int4p":
        params = quantize_decoder_params_host(
            params, bits=4, pack=True, group=args.group
        )
        if args.group:
            G = params["layers"]["wq"]["s"].shape[1]
            assert G > 1 or args.small, "grouping did not engage"
            args.phase = f"int4p_g{args.group}"
    if args.fused and args.phase in ("int8", "int4p", f"int4p_g{args.group}"):
        from trace_tpu.model.quantize import fuse_decoder_serving

        params = fuse_decoder_serving(params)
        assert "wqkv" in params["layers"], "serving fusion did not engage"
        args.phase = args.phase + "_fused"  # artifact names carry the layout
    if args.suffix:
        args.phase = args.phase + "_" + args.suffix
    print(f"host params in {time.time() - t0:.1f}s", flush=True)

    # combined input-embedding table + prefix embeds, shared across phases
    D = config.hidden_size
    CV = config.combined_vocab_size
    rng = np.random.default_rng(7)
    table_np = (rng.standard_normal((CV, D), np.float32) * 0.02)
    prefix_np = (rng.standard_normal((1, args.prefix, D), np.float32) * 0.02)

    # serving layout: decoder without its (unused) embed table
    params = {k: v for k, v in params.items() if k != "embed"}

    t0 = time.time()
    params = jax.device_put(params)
    table = jax.device_put(jnp.asarray(table_np, jnp.bfloat16))
    prefix = jax.device_put(jnp.asarray(prefix_np, jnp.bfloat16))
    print(f"upload in {time.time() - t0:.1f}s", flush=True)

    if not args.logits_only:
        mask = jnp.ones((1, args.prefix), bool)
        t0 = time.time()
        out = gen.generate(
            params, config, [prefix], mask, table,
            max_new_tokens=args.tokens, initial_head=1, eos_id=-5,
            temperature=0.0,
        )
        tokens = np.asarray(out.tokens[0])
        print(f"decode {args.tokens} tokens in {time.time() - t0:.1f}s", flush=True)
        np.save(os.path.join(OUT_DIR, f"tokens_{tag}_{args.phase}.npy"), tokens)

    # teacher-forced pass over the bf16 stream: every phase (including
    # bf16 itself) computes per-position head-masked logits so quantized
    # phases can report logit-level error against the bf16 logits — the
    # margin-aware metric.  Plain argmax agreement on RANDOM weights
    # lower-bounds trained-model agreement badly: random logits have
    # near-zero top1-top2 margins, so sub-percent quantization noise flips
    # ranks that a trained model's confident margins would absorb.
    bf16_path = os.path.join(OUT_DIR, f"tokens_{tag}_bf16.npy")
    if os.path.exists(bf16_path):
        ref = np.load(bf16_path)
        states = head_states_from_stream(config, ref)
        # embed the reference stream and run ONE forward over
        # prefix + ref[:-1]; logits at position prefix-1+i predict ref[i]
        ref_embeds = jnp.asarray(table_np[ref[:-1]], jnp.bfloat16)[None]
        seq = jnp.concatenate([prefix, ref_embeds], axis=1)
        L = seq.shape[1]
        m = jnp.ones((1, L), bool)
        pos = jnp.broadcast_to(jnp.arange(L), (1, L))
        hidden, _ = decoder_forward(params, config, seq, m, pos)
        logits = compute_logits(params, hidden)  # [1, L, CV] fp32
        mask_table = np.asarray(gen.head_mask_table(config))
        pred_logits = np.asarray(logits[0, args.prefix - 1 :])  # predicts ref[i]
        pred_logits = (pred_logits[: len(ref)] + mask_table[states]).astype(
            np.float32
        )
        np.save(
            os.path.join(OUT_DIR, f"logits_{tag}_{args.phase}.npy"),
            # head-masked entries are ~-1e30; store as -inf (fp16 range)
            np.where(pred_logits < -1e20, -np.inf, pred_logits).astype(np.float16),
        )
        if args.phase == "bf16":
            return
        pred = pred_logits.argmax(-1)
        agree = pred == ref
        win = 128
        curve = [float(agree[i : i + win].mean()) for i in range(0, len(ref), win)]
        result = {
            "teacher_forced_agreement": float(agree.mean()),
            "per_128_window": [round(c, 4) for c in curve],
            "n_tokens": int(len(ref)),
        }
        ref_logit_path = os.path.join(OUT_DIR, f"logits_{tag}_bf16.npy")
        if os.path.exists(ref_logit_path):
            lb = np.load(ref_logit_path).astype(np.float32)
            n = min(len(lb), len(pred_logits))
            lb, lq = lb[:n], pred_logits[:n]
            finite = np.isfinite(lb) & np.isfinite(lq)  # head mask is -inf
            delta = np.where(finite, lq - lb, 0.0)
            # per-position: bf16's own top1-top2 margin vs the perturbation
            def top2_margin(a):
                part = np.partition(np.where(np.isfinite(a), a, -1e30), -2, axis=-1)
                return part[..., -1] - part[..., -2]

            margins = top2_margin(lb)
            rms_err = float(np.sqrt((delta ** 2).sum() / finite.sum()))
            result.update({
                "logit_rms_err": rms_err,
                "bf16_margin_median": float(np.median(margins)),
                "bf16_margin_p90": float(np.percentile(margins, 90)),
                # agreement among positions the bf16 model is confident on
                "agreement_margin_above_median": float(
                    agree[:n][margins > np.median(margins)].mean()
                ),
                "agreement_margin_p75": float(
                    agree[:n][margins > np.percentile(margins, 75)].mean()
                ),
            })
        with open(os.path.join(OUT_DIR, f"agree_{tag}_{args.phase}.json"), "w") as f:
            json.dump(result, f)
        print(json.dumps(result), flush=True)


def vit8_phase(args, tag: str) -> None:
    """W8A8 CLIP tower vs bf16 on shared random ViT-L weights.

    The serving default quantizes the vision tower (s8xs8 MXU linears,
    btd attention); released CLIP weights are unavailable here (zero
    egress), so this is the weights-free quality proxy: embedding-level
    relative error and per-patch cosine similarity of the -2-tap features
    the connector consumes.  Published W8A8 results on trained ViTs show
    per-channel int8 to be near-lossless; random weights lower-bound that
    (no learned outlier structure to lose)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from trace_tpu.model.config import VisionConfig
    from trace_tpu.model.quantize import quantize_vision_params
    from trace_tpu.model.vit import init_vit_params, vit_forward

    vc = VisionConfig.tiny() if args.small else VisionConfig()
    B = 4 if args.small else 16
    params = init_vit_params(vc, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(11)
    imgs = jnp.asarray(
        rng.standard_normal((B, vc.image_size, vc.image_size, 3)),
        jnp.bfloat16,
    )

    use_flash = jax.devices()[0].platform != "cpu"
    ref = np.asarray(
        jax.jit(
            lambda p, x: vit_forward(p, vc, x, use_flash=use_flash)
        )(params, imgs),
        np.float32,
    )
    qp = quantize_vision_params(params)
    vq = dataclasses.replace(vc, act_quant=True)
    out = np.asarray(
        jax.jit(
            lambda p, x: vit_forward(p, vq, x, use_flash=use_flash)
        )(qp, imgs),
        np.float32,
    )

    rel = float(
        np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-9)
    )
    cos = np.sum(out * ref, -1) / np.maximum(
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1), 1e-9
    )
    result = {
        "phase": "vit8",
        "frames": int(B),
        "rel_fro_err": rel,
        "cos_mean": float(cos.mean()),
        "cos_p01": float(np.percentile(cos, 1)),
        "cos_min": float(cos.min()),
    }
    with open(os.path.join(OUT_DIR, f"agree_{tag}_vit8.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result), flush=True)


def report(tag: str):
    out = {}
    ref_path = os.path.join(OUT_DIR, f"tokens_{tag}_bf16.npy")
    ref = np.load(ref_path) if os.path.exists(ref_path) else None
    # derive the phase list from the artifacts present (agree_{tag}_*.json)
    # so new tags (int8_fused, int4p_g128, vit8, ...) surface automatically
    import glob as _glob

    phases = sorted({
        os.path.basename(p)[len(f"agree_{tag}_"):-len(".json")]
        for p in _glob.glob(os.path.join(OUT_DIR, f"agree_{tag}_*.json"))
    } | {"int8", "int4", "int4p"})
    for phase in phases:
        entry = {}
        tp = os.path.join(OUT_DIR, f"tokens_{tag}_{phase}.npy")
        if ref is not None and os.path.exists(tp):
            toks = np.load(tp)
            n = min(len(ref), len(toks))
            mismatch = np.nonzero(ref[:n] != toks[:n])[0]
            entry["free_running_first_divergence"] = (
                int(mismatch[0]) if len(mismatch) else int(n)
            )
        ap = os.path.join(OUT_DIR, f"agree_{tag}_{phase}.json")
        if os.path.exists(ap):
            with open(ap) as f:
                entry.update(json.load(f))
        out[phase] = entry
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
