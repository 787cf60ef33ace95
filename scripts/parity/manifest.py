"""Expected HF-checkpoint key/shape manifest for the released TRACE models.

The day the released checkpoints (`Yongxin-Guo/trace`, `trace-retrieval`,
`trace-uni` — reference README.md:51-60) become reachable, conversion should
be a checklist, not a debug session: this script emits the exact key → shape
table `trace_tpu.checkpoint.convert` consumes for each layout the reference's
`load_pretrained_model` routes (reference trace/model/builder.py:29-156).

Usage:
    python scripts/parity/manifest.py                     # write 7B manifests
    python scripts/parity/manifest.py --selfcheck         # tiny-scale proof
    python scripts/parity/manifest.py --verify /path/dir  # diff a real ckpt

`--verify` prints missing / extra / shape-mismatched keys against a local
checkpoint directory without converting anything (safetensors headers only
where possible), so a bad download or an unexpected layout is caught before
any 28 GB tensor is touched.

The manifest is *correct by construction*: `--selfcheck` (run in CI,
tests/test_parity_manifest.py) synthesizes a state dict with exactly the
manifest's keys/shapes at tiny config scale, runs the real converters over it
with key-access recording, and asserts (a) every manifest key is consumed,
(b) no key outside the manifest is requested, and (c) the converted tree
matches `init_trace_params`' shapes leaf-for-leaf.  The 7B table is the same
code evaluated at the released configs (Mistral-7B + CLIP ViT-L/14-336 +
spatial_slot; all three released checkpoints share this architecture — they
differ only in training data, reference README.md:51-60).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from trace_tpu.model.config import DecoderConfig, TraceConfig, VisionConfig  # noqa: E402

# Keys present in HF checkpoints that the converter deliberately ignores
# (documented so `--verify` doesn't report them as surprises).
IGNORED_HF_KEYS = {
    # CLIP post_layernorm sits after the -2 hidden-state tap (vit.py tap);
    # pooled/projection heads are CLIP-contrastive machinery TRACE never runs.
    "post_layernorm.weight",
    "post_layernorm.bias",
}


def decoder_manifest(cfg: DecoderConfig, prefix: str = "model.") -> dict:
    """Mistral decoder + TRACE heads (convert.py:convert_mistral_decoder)."""
    D, I = cfg.hidden_size, cfg.intermediate_size
    NH, NKV, HD = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    m = {f"{prefix}embed_tokens.weight": [cfg.vocab_size, D]}
    for i in range(cfg.num_layers):
        lyr = f"{prefix}layers.{i}."
        m.update({
            lyr + "input_layernorm.weight": [D],
            lyr + "post_attention_layernorm.weight": [D],
            lyr + "self_attn.q_proj.weight": [NH * HD, D],
            lyr + "self_attn.k_proj.weight": [NKV * HD, D],
            lyr + "self_attn.v_proj.weight": [NKV * HD, D],
            lyr + "self_attn.o_proj.weight": [D, NH * HD],
            lyr + "mlp.gate_proj.weight": [I, D],
            lyr + "mlp.up_proj.weight": [I, D],
            lyr + "mlp.down_proj.weight": [D, I],
        })
        if cfg.attn_qkv_bias:
            m[lyr + "self_attn.q_proj.bias"] = [NH * HD]
            m[lyr + "self_attn.k_proj.bias"] = [NKV * HD]
            m[lyr + "self_attn.v_proj.bias"] = [NKV * HD]
    m[f"{prefix}norm.weight"] = [D]
    m["lm_head.weight"] = [cfg.vocab_size, D]
    # TRACE auxiliary heads (reference trace_mistral.py:91-94). Optional in
    # the state dict — the converter zero-fills when absent (stage-0 bases).
    m["sync_head.weight"] = [1, D]
    m["time_head.weight"] = [cfg.time_vocab_size, D]
    m["score_head.weight"] = [cfg.score_vocab_size, D]
    return m


def vision_manifest(cfg: VisionConfig, prefix: str) -> dict:
    """HF CLIPVisionModel (convert.py:convert_clip_vision).

    `prefix` is `model.vision_tower.vision_tower.vision_model.` when the
    tower is bundled in the merged dir, `vision_model.` for a standalone
    openai/clip-vit-large-patch14-336 directory.
    """
    D, I, P = cfg.hidden_size, cfg.intermediate_size, cfg.patch_size
    n_pos = (cfg.image_size // P) ** 2 + 1
    m = {
        prefix + "embeddings.class_embedding": [D],
        prefix + "embeddings.patch_embedding.weight": [D, 3, P, P],
        prefix + "embeddings.position_embedding.weight": [n_pos, D],
        # HF's historical typo; convert.py also accepts `pre_layernorm.*`
        prefix + "pre_layrnorm.weight": [D],
        prefix + "pre_layrnorm.bias": [D],
    }
    for i in range(cfg.num_layers):
        lyr = prefix + f"encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            m[lyr + ln + ".weight"] = [D]
            m[lyr + ln + ".bias"] = [D]
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            m[lyr + f"self_attn.{proj}.weight"] = [D, D]
            m[lyr + f"self_attn.{proj}.bias"] = [D]
        m[lyr + "mlp.fc1.weight"] = [I, D]
        m[lyr + "mlp.fc1.bias"] = [I]
        m[lyr + "mlp.fc2.weight"] = [D, I]
        m[lyr + "mlp.fc2.bias"] = [D]
    return m


def connector_manifest(config: TraceConfig, prefix: str = "model.mm_projector.") -> dict:
    """spatial_slot / slot (convert.py:convert_spatial_slot) — the projector
    all three released checkpoints use (reference builder.py:411-424)."""
    mm, lm = config.vision.hidden_size, config.decoder.hidden_size
    t = config.mm_projector_type
    if t in ("spatial_slot", "slot"):
        return {
            prefix + "slots": [mm, config.num_slots],
            prefix + "ln_vision.weight": [mm],
            prefix + "ln_vision.bias": [mm],
            prefix + "readout.weight": [lm, mm],  # HF Linear [out, in]
        }
    if t == "linear":
        return {prefix + "weight": [lm, mm], prefix + "bias": [lm]}
    raise NotImplementedError(
        f"manifest for projector type {t!r} not tabulated (released "
        "checkpoints all use spatial_slot)"
    )


def towers_manifest(config: TraceConfig, prefix: str = "model.") -> dict:
    D = config.decoder.hidden_size
    return {
        prefix + "time_tower.embed_tokens.weight": [config.decoder.time_vocab_size, D],
        prefix + "score_tower.embed_tokens.weight": [config.decoder.score_vocab_size, D],
        prefix + "sync_tower.embed_tokens.weight": [1, D],
    }


def full_manifest(config: TraceConfig, layout: str = "merged", bundled_vision: bool = True) -> dict:
    """Key → shape table per checkpoint layout (builder.py:29-156 routing).

    layouts:
      merged          — one dir: decoder + heads + projector + towers
                        (+ vision when bundled_vision)
      mm_projector    — standalone mm_projector.bin from a stage-1 run
                        (keys may drop the `model.mm_projector.` prefix;
                        load_mm_projector re-prefixes automatically)
      clip            — standalone openai/clip-vit-large-patch14-336 dir
    """
    if layout == "merged":
        m = {}
        m.update(decoder_manifest(config.decoder))
        m.update(connector_manifest(config))
        m.update(towers_manifest(config))
        if bundled_vision:
            m.update(vision_manifest(
                config.vision, "model.vision_tower.vision_tower.vision_model."
            ))
        return m
    if layout == "mm_projector":
        return connector_manifest(config)
    if layout == "clip":
        return vision_manifest(config.vision, "vision_model.")
    raise ValueError(layout)


# LoRA layout (builder.py:63-92): adapter keys are pattern-level because the
# rank is a training-run choice. For every decoder Linear above, expect:
#   base_model.model.<key-without-.weight>.lora_A.weight  [r, in_features]
#   base_model.model.<key-without-.weight>.lora_B.weight  [out_features, r]
# plus `non_lora_trainables.bin` carrying projector/tower/head keys verbatim.
LORA_NOTE = {
    "pattern_A": "base_model.model.{linear}.lora_A.weight -> [r, in]",
    "pattern_B": "base_model.model.{linear}.lora_B.weight -> [out, r]",
    "merge": "W' = W + B @ A * (alpha / r)  (checkpoint/loader.py:merge_lora_weights)",
    "non_lora_trainables": "mm_projector/towers/heads keys as in the merged manifest",
}


def _released_config() -> TraceConfig:
    """The architecture shared by trace / trace-retrieval / trace-uni."""
    import jax.numpy as jnp

    return TraceConfig(
        decoder=DecoderConfig(),          # Mistral-7B-v0.2 geometry
        vision=VisionConfig(),            # CLIP ViT-L/14-336
        mm_projector_type="spatial_slot",
        num_slots=8,
        num_frames=128,
        dtype=jnp.bfloat16,
    )


def selfcheck() -> None:
    """Tiny-scale proof that the manifest matches the converters exactly."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from trace_tpu.checkpoint import convert as C
    from trace_tpu.model.trace_model import init_trace_params

    config = TraceConfig.tiny()
    # tiny() uses the ByteTokenizer vocab; manifest code is config-driven
    manifest = full_manifest(config, "merged", bundled_vision=True)

    accessed: set = set()

    class RecordingSD(dict):
        def __getitem__(self, k):
            accessed.add(k)
            return super().__getitem__(k)

        def __contains__(self, k):
            # membership probes (pre_layrnorm variant, optional heads) are
            # not "consumption" — only record real reads
            return super().__contains__(k)

    sd = RecordingSD({
        k: np.zeros(shape, np.float16) for k, shape in manifest.items()
    })

    params = {
        "decoder": C.convert_mistral_decoder(sd, config.decoder, dtype=jnp.float32),
        "connector": C.convert_spatial_slot(sd, dtype=jnp.float32),
        "towers": C.convert_towers(sd, dtype=jnp.float32),
        "vision": C.convert_clip_vision(
            sd, config.vision,
            prefix="model.vision_tower.vision_tower.vision_model.",
            dtype=jnp.float32,
        ),
    }

    missing = set(manifest) - accessed
    extra = accessed - set(manifest)
    assert not missing, f"manifest keys never consumed: {sorted(missing)[:8]}"
    assert not extra, f"converter read keys outside manifest: {sorted(extra)[:8]}"

    ref = jax.eval_shape(
        lambda k: init_trace_params(config, k, dtype=jnp.float32),
        jax.random.PRNGKey(0),
    )
    got_flat = jax.tree.leaves_with_path(params)
    ref_map = dict(jax.tree.leaves_with_path(ref))
    for path, leaf in got_flat:
        assert path in ref_map, f"converted leaf {path} not in init tree"
        assert tuple(leaf.shape) == tuple(ref_map[path].shape), (
            f"{path}: converted {leaf.shape} != init {ref_map[path].shape}"
        )
    assert len(got_flat) == len(ref_map), (
        f"leaf count: converted {len(got_flat)} != init {len(ref_map)}"
    )
    print(f"selfcheck OK: {len(manifest)} keys consumed exactly, "
          f"{len(got_flat)} converted leaves match init_trace_params")


def verify(path: str) -> int:
    """Diff a local checkpoint dir's tensors against the 7B manifest."""
    from trace_tpu.checkpoint.convert import load_checkpoint_tensors, read_hf_config, trace_config_from_hf

    hf_cfg = read_hf_config(path)
    config = trace_config_from_hf(hf_cfg)
    sd = load_checkpoint_tensors(path)
    bundled = any(k.startswith("model.vision_tower.") for k in sd)
    manifest = full_manifest(config, "merged", bundled_vision=bundled)

    optional = {"sync_head.weight", "time_head.weight", "score_head.weight"}
    rc = 0
    for k, shape in sorted(manifest.items()):
        if k not in sd:
            alt = k.replace("pre_layrnorm", "pre_layernorm")
            if alt in sd:
                k = alt
            elif k in optional:
                print(f"  optional-missing {k} (converter zero-fills)")
                continue
            else:
                print(f"MISSING {k} {shape}")
                rc = 1
                continue
        got = list(getattr(sd[k], "shape", ()))
        ok = got == shape or (
            k.endswith("embed_tokens.weight") and got[0] >= shape[0]
            and got[1:] == shape[1:]
        ) or (
            k == "lm_head.weight" and got[0] >= shape[0] and got[1:] == shape[1:]
        )
        if not ok:
            print(f"SHAPE {k}: checkpoint {got} != expected {shape}")
            rc = 1
    known = set(manifest) | {
        k.replace("pre_layrnorm", "pre_layernorm") for k in manifest
    }
    surprises = [
        k for k in sorted(sd)
        if k not in known and not any(k.endswith(s) for s in IGNORED_HF_KEYS)
    ]
    for k in surprises[:20]:
        print(f"EXTRA {k} {list(getattr(sd[k], 'shape', ()))}")
    print(f"verify: {len(manifest)} expected, {len(sd)} present, "
          f"{len(surprises)} unexplained extras -> {'OK' if rc == 0 else 'MISMATCH'}")
    return rc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--selfcheck", action="store_true")
    ap.add_argument("--verify", metavar="CKPT_DIR")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__)))
    args = ap.parse_args()

    if args.selfcheck:
        selfcheck()
        return
    if args.verify:
        raise SystemExit(verify(args.verify))

    config = _released_config()
    for layout, bundled, fname in (
        ("merged", True, "manifest_trace7b_merged.json"),
        ("merged", False, "manifest_trace7b_merged_novision.json"),
        ("mm_projector", None, "manifest_mm_projector.json"),
        ("clip", None, "manifest_clip_vit_l_336.json"),
    ):
        m = (full_manifest(config, layout) if bundled is None
             else full_manifest(config, layout, bundled_vision=bundled))
        n_params = sum(int(__import__("numpy").prod(s)) for s in m.values())
        doc = {
            "checkpoints": ["Yongxin-Guo/trace", "Yongxin-Guo/trace-retrieval",
                            "Yongxin-Guo/trace-uni"],
            "layout": layout + ("" if bundled in (None, True) else "+external-clip"),
            "num_keys": len(m),
            "num_params": n_params,
            "notes": {
                "embed_tokens/lm_head": "converter slices [:vocab_size]; "
                                        "larger saved tables are fine",
                "pre_layrnorm": "HF typo; pre_layernorm accepted too",
                "heads": "sync/time/score_head.weight optional (zero-filled)",
                "ignored": sorted(IGNORED_HF_KEYS),
                "lora": LORA_NOTE,
            },
            "keys": m,
        }
        out = os.path.join(args.out, fname)
        with open(out, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=False)
        print(f"wrote {out}: {len(m)} keys, {n_params/1e9:.3f}B params")


if __name__ == "__main__":
    main()
