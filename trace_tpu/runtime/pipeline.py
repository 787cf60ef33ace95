"""End-to-end inference pipeline: video file -> event triplets.

Replicates the public surface of scripts/inference/inference.py and
trace/__init__.py (model_init / infer) on the TPU-native stack:

  decode+sample frames (host) -> preprocess+ViT+connector+splice (one jitted
  device program) -> compiled FSM decode -> shared structured decoder.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from trace_tpu import conversation as conv
from trace_tpu.constants import MODAL_TOKEN_INDEX
from trace_tpu.model.config import TraceConfig
from trace_tpu.model.trace_model import (
    combined_embedding,
    encode_prefix_for_generation,
    tokens_per_frame,
)
from trace_tpu.runtime import generate as gen
from trace_tpu.tokenizers.event_codec import (
    TIME_CODEC,
    EventPredictions,
    decode_event_stream,
)
from trace_tpu.tokenizers.text import TextTokenizer, splice_modal_tokens
from trace_tpu.video.io import load_video_frames
from trace_tpu.video.preprocess import preprocess_frames


def expand_prompt_ids(
    spliced_ids: Sequence[int],
    num_video_tokens: int,
    text_vocab_size: int,
) -> tuple[np.ndarray, int]:
    """Sentinel-spliced prompt ids -> combined-space ids + video span start.

    * exactly one VIDEO/IMAGE sentinel (asserted like trace_arch.py:411),
      expanded to ``num_video_tokens`` placeholder positions (id 0 — their
      embeddings are overwritten by the feature scatter);
    * SYNC sentinels become the combined sync id (= text_vocab_size), whose
      embedding row IS the sync tower.
    """
    video_positions = [
        i for i, t in enumerate(spliced_ids)
        if t in (MODAL_TOKEN_INDEX["VIDEO"], MODAL_TOKEN_INDEX["IMAGE"])
    ]
    assert len(video_positions) == 1, "only have one video inputs!"
    vp = video_positions[0]

    out: list[int] = []
    for i, t in enumerate(spliced_ids):
        if i == vp:
            out.extend([0] * num_video_tokens)
        elif t == MODAL_TOKEN_INDEX["SYNC"]:
            out.append(text_vocab_size)
        else:
            assert t >= 0, f"unexpected sentinel {t} in inference prompt"
            out.append(int(t))
    return np.asarray(out, np.int32), vp


@partial(jax.jit, static_argnames=("config", "use_flash"))
def _encode_prefix_jit(
    params, config: TraceConfig, token_ids, video_pos, frames, frame_time_ids,
    table, use_flash: bool = False,
):
    return encode_prefix_for_generation(
        params, config, token_ids, video_pos, frames, frame_time_ids,
        use_flash=use_flash, table=table,
    )


@partial(jax.jit, static_argnames=("config", "image_size", "aspect_ratio"))
def _preprocess_jit(frames_u8, config: TraceConfig, image_size: int, aspect_ratio: str):
    return preprocess_frames(frames_u8, image_size, aspect_ratio=aspect_ratio)


@partial(jax.jit, static_argnames=("out_dtype",))
def _preprocess_yuv_jit(yuv_u8, out_dtype=jnp.float32):
    """I420 planes (already at target size) -> normalized RGB on device.

    ``out_dtype`` folds the serving bf16 cast INTO the program: a separate
    `.astype` writes the full fp32 frames (173 MB/video at 128f) to HBM and
    reads them back just to halve them."""
    from trace_tpu.video.preprocess import i420_to_rgb
    from trace_tpu.model.vit import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    rgb = i420_to_rgb(yuv_u8) / 255.0
    mean = jnp.asarray(CLIP_IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_IMAGE_STD, jnp.float32)
    return ((rgb - mean) / std).astype(out_dtype)


@partial(jax.jit, donate_argnums=(0,))
def _store_prefix_rows(store, rows, b0):
    """Write encoded prefix rows into a per-chunk store at batch offset b0,
    in place (donated), left-padding each row to the store's bucket."""
    pad = store.shape[1] - rows.shape[1]
    rows = jnp.pad(rows, ((0, 0), (pad, 0), (0, 0)))
    return jax.lax.dynamic_update_slice(
        store, rows.astype(store.dtype),
        (b0, jnp.int32(0), jnp.int32(0)),
    )


@partial(jax.jit, static_argnames=("size", "patch", "out_dtype"))
def _preprocess_yuv_band_patches_jit(yuv_band, top, left, canvas_rgb01, size,
                                     patch, out_dtype=jnp.float32):
    """Content-band I420 -> CLIP-normalized ViT patches [T, N, 3*p*p].

    The serving preprocess: planar all the way (no [S, S, 3] channels-minor
    tensor — that layout measured ~60 ms/video of pure relayout), feeding
    vit_forward's pre-extracted-patches input."""
    from trace_tpu.video.preprocess import i420_band_to_patches

    return i420_band_to_patches(
        yuv_band, top, left, canvas_rgb01, size, patch, out_dtype
    )


@partial(jax.jit, static_argnames=("patch",))
def _pixels_to_patches_jit(frames, patch):
    """[T, S, S, 3] -> [T, N, 3*p*p] (mixed-batch fallback so pixel-path
    samples can stack with patch-path samples)."""
    from trace_tpu.model.vit import extract_patches

    return extract_patches(frames, patch)


@partial(jax.jit, static_argnames=("size", "out_dtype"))
def _preprocess_yuv_band_jit(yuv_band, top, left, canvas_rgb01, size,
                             out_dtype=jnp.float32):
    """Content-band I420 -> normalized S x S RGB: convert only the uploaded
    band, place it on a canvas of the fill color's wire round-trip value
    (bit-identical to uploading the whole squared frame — the pad bands are
    uniform, see preprocess.content_band).  Cuts tunnel bytes another
    25-43% after yuv420 (aspect-dependent).  ``out_dtype`` folds the
    serving bf16 cast into the program (see _preprocess_yuv_jit)."""
    from trace_tpu.video.preprocess import i420_to_rgb
    from trace_tpu.model.vit import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    mean = jnp.asarray(CLIP_IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_IMAGE_STD, jnp.float32)
    band = ((i420_to_rgb(yuv_band) / 255.0 - mean) / std).astype(out_dtype)
    T = band.shape[0]
    canvas = jnp.broadcast_to(
        ((canvas_rgb01 - mean) / std).astype(out_dtype), (T, size, size, 3)
    )
    return jax.lax.dynamic_update_slice(
        canvas, band, (jnp.int32(0), top, left, jnp.int32(0))
    )


def encode_prefix_sharded(
    params: dict,
    config: TraceConfig,
    token_ids,          # [B, L] combined-space ids
    video_pos,          # [B]
    frames,             # [B, T, S, S, 3] CLIP-normalized
    frame_time_ids,     # [B, T, 6]
    table,              # [CV, D] combined embedding
    mesh,
):
    """Frame-sequence-parallel prefix encode under GSPMD.

    Frames shard over ('data', 'model') — one video's 128-frame ViT spreads
    across the whole mesh (the encode is embarrassingly parallel over
    frames, SURVEY.md §2.3) with vision weights replicated.  Runs the ViT
    unchunked: the sequential lax.map chunking is a single-chip VMEM bound,
    not needed once frames are spread over chips.
    """
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    dp = lambda *names: NamedSharding(mesh, Pspec(*names))
    cfg = dataclasses.replace(config, vit_chunk_size=0)
    return _encode_prefix_jit(
        params, cfg,
        jax.device_put(token_ids, dp("data", None)),
        jax.device_put(video_pos, dp("data")),
        jax.device_put(frames, dp("data", "model", None, None, None)),
        jax.device_put(frame_time_ids, dp("data", "model", None)),
        jax.device_put(table, dp()),
        False,  # pallas flash does not partition under GSPMD
    )


@dataclasses.dataclass
class PreparedSampleNP:
    """A host-only prepared sample: numpy/python leaves, no device buffers.

    Produced by TracePipeline.prepare_sample_host_np; consumed by
    infer_events_corpus's load_item (which uploads it via _upload_prepared
    at consume time) — lets a corpus runner pay the per-video host CPU
    (cv2 downscale + RGB->I420 + tokenize) outside a timed serving window
    while keeping per-video wire bytes and device work identical."""

    token_ids: object
    video_pos: object
    frames_spec: object
    time_ids: object
    timestamps: object


@dataclasses.dataclass
class TracePipeline:
    """Owns params + config + tokenizer; runs single/batched video inference.

    At first use the combined [32027, D] input-embedding table is
    materialized once and the now-redundant decoder embedding is dropped from
    the inference param set — on a 16 GB chip next to 15 GB of bf16 weights,
    that duplicated 262 MB decides whether batched decode fits.
    """

    params: dict
    config: TraceConfig
    tokenizer: TextTokenizer
    _combined: object = dataclasses.field(default=None, repr=False)
    _encode_params: dict = dataclasses.field(default=None, repr=False)
    _decoder_params: dict = dataclasses.field(default=None, repr=False)
    _vision_host: dict = dataclasses.field(default=None, repr=False)
    last_corpus_stats: dict = dataclasses.field(default=None, repr=False)

    def _prepare_memory_layout(self):
        if self._combined is not None:
            return
        self._combined = combined_embedding(self.params)
        decoder = dict(self.params["decoder"])
        decoder.pop("embed", None)
        import os

        import numpy as _np

        _probe = decoder.get("layers", {}).get("wq")
        host_tree = isinstance(_probe, dict) and any(
            isinstance(v, _np.ndarray) for v in _probe.values()
        )
        if host_tree and os.environ.get("TRACE_TPU_FUSE_DEC", "1") == "1":
            # serving layout: one QKV dot + one gate|up dot per layer — the
            # decode step is per-dot-latency-bound at serving batch, so
            # 7 dots/layer -> 4 is a direct step-time cut (no-op for
            # unquantized / LoRA / MoE trees; see fuse_decoder_serving).
            # HOST trees only: fusing device-resident 7B weights doubles
            # their HBM residency transiently and fragments the space the
            # KV arena needs (measured OOM at decode batch 24) — device
            # callers fuse at build time instead (bench.zero_params,
            # model_init's host path).
            from trace_tpu.model.quantize import fuse_decoder_serving

            decoder = fuse_decoder_serving(decoder)
        self._decoder_params = decoder
        self._encode_params = {
            k: v for k, v in self.params.items() if k != "decoder"
        }
        if "vision" in self._encode_params:
            from trace_tpu.model.vit import fuse_vision_qkv

            self._encode_params["vision"] = fuse_vision_qkv(
                self._encode_params["vision"]
            )
        # drop the pipeline's own strong ref to the duplicated embed table
        # (and to the unfused q/k/v copies — the fused tree is the serving
        # layout)
        slim = dict(self.params)
        slim["decoder"] = decoder
        if "vision" in self._encode_params:
            slim["vision"] = self._encode_params["vision"]
        self.params = slim

    def _prepare_prefix(
        self,
        frames_u8: np.ndarray,            # [T, H, W, 3] uint8
        video_timestamps: Sequence,        # [[sec], ...] per frame
        instruction: str,
        template: str = "llama_2",
    ):
        prefix, mask = self._prepare_prefix_batch(
            [frames_u8], [video_timestamps], [instruction], template
        )
        return prefix  # [1, P, D]

    def _prepare_sample_host(self, frames_u8, ts, instruction, template="llama_2",
                             defer_preprocess=False, as_numpy=False):
        """Host side of sample prep: tokenize, downscale, start the frame
        upload (device_put is async — callable from a producer thread so
        uploads overlap the previous batch's encode).

        defer_preprocess=True keeps the frames as the uploaded uint8 I420
        band (a ("yuv_band", ...) tuple resolved by _encode_prepared): a
        queued video then holds ~16 MB on device instead of the ~87 MB
        normalized bf16 buffer — with 4 producer batches in flight that is
        the difference between the decode-batch-32 KV arena fitting through
        the encode phase or not.

        as_numpy=True (requires defer_preprocess) touches NO device: the
        frame payload stays a tagged numpy tuple for a later
        _upload_prepared — see prepare_sample_host_np."""
        if as_numpy and not defer_preprocess:
            raise ValueError("as_numpy requires defer_preprocess=True")
        dev_a = (lambda x: x) if as_numpy else jnp.asarray
        dev_i = (lambda x: int(x)) if as_numpy else jnp.int32
        cfg = self.config
        S = cfg.vision.image_size
        prompt = conv.build_trace_prompt(instruction, template_name=template)
        spliced = splice_modal_tokens(prompt, self.tokenizer)
        T = frames_u8.shape[0]
        token_ids, video_pos = expand_prompt_ids(
            spliced, T * tokens_per_frame(cfg), cfg.decoder.vocab_size
        )
        time_ids = np.stack(
            [TIME_CODEC.encode_value(t[0] if isinstance(t, (list, tuple)) else t)
             for t in ts]
        ).astype(np.int32)
        # frames larger than the ViT input downscale on host first — the
        # host->device link is the bottleneck in tunneled setups
        H0, W0 = frames_u8.shape[1], frames_u8.shape[2]
        band_fast = None  # (band_u8, top, left) from the band-only downscale
        if H0 * W0 > int(1.3 * S * S):
            from trace_tpu.video.preprocess import (
                host_downscale,
                host_downscale_band,
            )

            if (
                cfg.upload_format == "yuv420"
                and cfg.image_aspect_ratio == "pad"
                and S % 4 == 0
            ):
                # bit-identical to host_downscale + band extraction, but
                # computes ONLY the band — skips the padded canvas, the
                # full-frame resize, and the extraction copy (the producer
                # threads share ONE host core here; this was most of their
                # per-video cost)
                band_fast = host_downscale_band(frames_u8, S)
            if band_fast is None:
                frames_u8 = host_downscale(frames_u8, S, cfg.image_aspect_ratio)
        if band_fast is not None or (
            cfg.upload_format == "yuv420"
            and frames_u8.shape[1] == S and frames_u8.shape[2] == S
            and S % 4 == 0
        ):
            from trace_tpu.video.preprocess import (
                CLIP_IMAGE_MEAN,
                content_band,
                i420_fill_rgb01,
                rgb_to_i420_np,
            )

            top, h, left, w = (
                content_band(H0, W0, S)
                if cfg.image_aspect_ratio == "pad"
                else (0, S, 0, S)
            )
            # straight-to-patches preprocess (planar, no [S,S,3] tensor)
            # whenever the ViT grid divides the canvas — the standard config
            patchify = S % cfg.vision.patch_size == 0
            fill = (np.asarray(CLIP_IMAGE_MEAN) * 255).astype(np.uint8)
            if band_fast is not None and (h, w) == (S, S):
                # near-square landscape: the "band" spans the whole canvas
                frames_u8 = band_fast[0]
                band_fast = None
            if (h, w) != (S, S):
                if band_fast is not None:
                    band, top, left = band_fast  # already exactly the band
                else:
                    # upload only the rows/cols that aren't the uniform pad
                    band = np.ascontiguousarray(
                        frames_u8[:, top : top + h, left : left + w]
                    )
                args = (
                    dev_a(rgb_to_i420_np(band)),
                    dev_i(top), dev_i(left),
                    dev_a(i420_fill_rgb01(fill)), S,
                )
                if patchify:
                    args = args + (cfg.vision.patch_size,)
                    if defer_preprocess:
                        frames = ("yuv_band_p",) + args
                    else:
                        frames = _preprocess_yuv_band_patches_jit(
                            *args, out_dtype=cfg.dtype
                        )
                elif defer_preprocess:
                    frames = ("yuv_band",) + args
                else:
                    frames = _preprocess_yuv_band_jit(*args, out_dtype=cfg.dtype)
            else:
                yuv = dev_a(rgb_to_i420_np(np.ascontiguousarray(frames_u8)))
                if patchify:
                    # full-frame: the band covers the whole canvas
                    args = (
                        yuv, dev_i(0), dev_i(0),
                        dev_a(i420_fill_rgb01(fill)), S,
                        cfg.vision.patch_size,
                    )
                    if defer_preprocess:
                        frames = ("yuv_band_p",) + args
                    else:
                        frames = _preprocess_yuv_band_patches_jit(
                            *args, out_dtype=cfg.dtype
                        )
                elif defer_preprocess:
                    frames = ("yuv_full", yuv)
                else:
                    frames = _preprocess_yuv_jit(yuv, out_dtype=cfg.dtype)
        elif as_numpy:
            # rare route (non-pad aspect / odd canvas): defer the whole
            # preprocess; _upload_prepared runs the eager program
            frames = ("raw_np", np.ascontiguousarray(frames_u8))
        else:
            frames = _preprocess_jit(
                jnp.asarray(frames_u8), cfg, S, cfg.image_aspect_ratio,
            ).astype(cfg.dtype)
        return (token_ids, video_pos, frames, time_ids)

    def prepare_sample_host_np(self, frames_u8, ts, instruction,
                               template="llama_2") -> "PreparedSampleNP":
        """Pure-host sample prep: tokenize + downscale + RGB->I420 with
        numpy-only outputs and ZERO device interaction (~0.3 s of host CPU
        per 128-frame video on a 1-core host).  A corpus runner can hoist
        this out of its timed window — per-video upload bytes and device
        programs are identical; only host CPU moves (the bench host has one
        core and is not the measurement target — the chip is)."""
        t, v, f, ti = self._prepare_sample_host(
            frames_u8, ts, instruction, template,
            defer_preprocess=True, as_numpy=True,
        )
        return PreparedSampleNP(t, v, f, ti, list(ts))

    def _upload_prepared(self, ps: "PreparedSampleNP"):
        """PreparedSampleNP -> the per_sample tuple _encode_prepared takes.
        Called in-pass (producer threads): the jnp.asarray here IS the
        frame upload, async as before."""
        f = ps.frames_spec
        if isinstance(f, tuple) and f[0] in ("yuv_band_p", "yuv_band"):
            tag, yuv, top, left, fill = f[:5]
            f = (tag, jnp.asarray(yuv), jnp.int32(top), jnp.int32(left),
                 jnp.asarray(fill)) + f[5:]
        elif isinstance(f, tuple) and f[0] == "yuv_full":
            f = ("yuv_full", jnp.asarray(f[1]))
        elif isinstance(f, tuple) and f[0] == "raw_np":
            cfg = self.config
            f = _preprocess_jit(
                jnp.asarray(f[1]), cfg, cfg.vision.image_size,
                cfg.image_aspect_ratio,
            ).astype(cfg.dtype)
        return (ps.token_ids, ps.video_pos, f, ps.time_ids)

    def _prepare_prefix_batch(
        self,
        frames_u8_list: Sequence[np.ndarray],
        timestamps_list: Sequence[Sequence],
        instructions: Sequence[str],
        template: str = "llama_2",
    ):
        """Batch of videos -> (prefix_embeds [B, L, D], mask [B, L]).

        Prompts are LEFT-padded to a common length (content right-aligned, the
        layout the batched decode loop expects); the per-sample video span
        shifts with the padding.
        """
        self._prepare_memory_layout()
        if self._encode_params is None:
            self._restore_vision()
        cfg = self.config
        per_sample = [
            self._prepare_sample_host(f, ts, q, template)
            for f, ts, q in zip(frames_u8_list, timestamps_list, instructions)
        ]
        return self._encode_prepared(per_sample)

    def _encode_prepared(self, per_sample: list):
        """Device side: stack prepared samples and run the encode program."""
        cfg = self.config
        L = max(len(s[0]) for s in per_sample)
        B = len(per_sample)
        token_ids = np.zeros((B, L), np.int32)
        video_pos = np.zeros((B,), np.int32)
        mask = np.zeros((B, L), bool)
        for b, (ids, vp, _, _) in enumerate(per_sample):
            pad = L - len(ids)
            token_ids[b, pad:] = ids
            video_pos[b] = vp + pad
            mask[b, pad:] = True

        def resolve(f):
            if isinstance(f, tuple) and f and f[0] == "yuv_band_p":
                return _preprocess_yuv_band_patches_jit(
                    *f[1:], out_dtype=cfg.dtype
                )
            if isinstance(f, tuple) and f and f[0] == "yuv_band":
                return _preprocess_yuv_band_jit(*f[1:], out_dtype=cfg.dtype)
            if isinstance(f, tuple) and f and f[0] == "yuv_full":
                return _preprocess_yuv_jit(f[1], out_dtype=cfg.dtype)
            return f

        resolved = [resolve(s[2]) for s in per_sample]
        if len({r.ndim for r in resolved}) > 1:
            # mixed patch/pixel batch (aspect-dependent routing): patchify
            # the pixel samples so the stack is uniform
            resolved = [
                r if r.ndim == 3
                else _pixels_to_patches_jit(r, cfg.vision.patch_size).astype(
                    cfg.dtype
                )
                for r in resolved
            ]
        frames = jnp.stack(resolved)
        time_ids = jnp.stack([jnp.asarray(s[3]) for s in per_sample])

        prefix = _encode_prefix_jit(
            self._encode_params, cfg,
            jnp.asarray(token_ids),
            jnp.asarray(video_pos),
            frames,
            time_ids,
            self._combined,
            gen.default_use_flash(),
        )
        return prefix, jnp.asarray(mask)

    def infer_events(
        self,
        video_path: str,
        instruction: str,
        *,
        num_frames: Optional[int] = None,
        max_new_tokens: int = 1024,
        temperature: float = 0.0,
        template: str = "llama_2",
        seed: int = 0,
    ) -> EventPredictions:
        """Single-video causal event inference (inference.py:15-128 parity)."""
        cfg = self.config
        frames_u8, timestamps = load_video_frames(
            video_path, num_frames or cfg.num_frames
        )
        return self.infer_events_from_frames(
            frames_u8, timestamps, instruction,
            max_new_tokens=max_new_tokens, temperature=temperature,
            template=template, seed=seed,
        )

    def infer_events_from_frames(
        self,
        frames_u8: np.ndarray,
        video_timestamps: Sequence,
        instruction: str,
        *,
        max_new_tokens: int = 1024,
        temperature: float = 0.0,
        template: str = "llama_2",
        seed: int = 0,
    ) -> EventPredictions:
        return self.infer_events_batch(
            [frames_u8], [video_timestamps], [instruction],
            max_new_tokens=max_new_tokens, temperature=temperature,
            template=template, seed=seed,
        )[0]

    def infer_events_batch(
        self,
        frames_u8_list: Sequence[np.ndarray],
        timestamps_list: Sequence[Sequence],
        instructions: Sequence[str],
        *,
        max_new_tokens: int = 1024,
        temperature: float = 0.0,
        template: str = "llama_2",
        seed: int = 0,
    ) -> list[EventPredictions]:
        """Batched multi-video event inference: one prefill + one decode loop
        for the whole batch (weight reads amortize across videos — the main
        single-chip throughput lever over the reference's batch-1 eval loop,
        eval/evaluate.py:296-302)."""
        prefix, mask = self._prepare_prefix_batch(
            frames_u8_list, timestamps_list, instructions, template
        )
        out = gen.generate(
            self._decoder_params, self.config.decoder,
            prefix, mask,
            self._combined,
            max_new_tokens=max_new_tokens,
            initial_head=1,  # prompt ends with <sync> (inference.py:45,54)
            temperature=temperature,
            eos_id=self.tokenizer.eos_token_id,
            seed=seed,
        )
        detok = lambda ids: self.tokenizer.decode(ids, skip_special_tokens=True)
        results = []
        for b in range(len(frames_u8_list)):
            ids = [int(t) for t in out.tokens[b] if t != gen.PAD_OUTPUT_ID]
            results.append(
                decode_event_stream(
                    ids, detok, text_vocab_size=self.config.decoder.vocab_size
                )
            )
        return results

    def infer_text(
        self,
        frames_u8: np.ndarray,
        video_timestamps: Sequence,
        instruct: str,
        *,
        max_new_tokens: int = 1024,
        temperature: float = 0.0,
        template: str = "llama_2",
        seed: int = 0,
    ) -> str:
        """Plain captioning / QA (reference trace/__init__.py infer: no
        <sync> suffix, text head from the start, free-form text out)."""
        self._prepare_memory_layout()
        if self._encode_params is None:
            self._restore_vision()
        cfg = self.config
        prompt = conv.build_trace_prompt(
            instruct, template_name=template, append_sync=False
        )
        spliced = splice_modal_tokens(prompt, self.tokenizer)
        T = frames_u8.shape[0]
        token_ids, video_pos = expand_prompt_ids(
            spliced, T * tokens_per_frame(cfg), cfg.decoder.vocab_size
        )
        time_ids = np.stack([
            TIME_CODEC.encode_value(t[0] if isinstance(t, (list, tuple)) else t)
            for t in video_timestamps
        ]).astype(np.int32)
        frames = _preprocess_jit(
            jnp.asarray(frames_u8), cfg, cfg.vision.image_size, cfg.image_aspect_ratio
        ).astype(cfg.dtype)
        prefix = _encode_prefix_jit(
            self._encode_params, cfg,
            jnp.asarray(token_ids)[None], jnp.asarray([video_pos], jnp.int32),
            frames[None], jnp.asarray(time_ids)[None],
            self._combined, gen.default_use_flash(),
        )
        # keyword stop (reference KeywordsStoppingCriteria, mm_utils.py:
        # 567-600): templates whose separator is not the eos token (vicuna
        # v1 '###', qwen '<|im_end|>') end the turn at the stop string.
        # The token-id form compiles INTO the decode loop (no wasted steps);
        # the text split below stays as the backstop for stop strings whose
        # mid-text tokenization differs from the standalone encoding.
        stop = conv.get_template(template).stop_str
        stop_seqs = None
        if stop and stop != getattr(self.tokenizer, "eos_token", None):
            stop_seqs = [self._stop_token_ids(stop)]
        out = gen.generate(
            self._decoder_params, cfg.decoder,
            prefix, jnp.ones((1, prefix.shape[1]), bool), self._combined,
            max_new_tokens=max_new_tokens, initial_head=0,
            temperature=temperature, eos_id=self.tokenizer.eos_token_id,
            seed=seed, stop_sequences=stop_seqs,
        )
        text_ids = [
            int(t) for t in out.tokens[0]
            if 0 <= int(t) < cfg.decoder.vocab_size
        ]
        text = self.tokenizer.decode(text_ids, skip_special_tokens=True).strip()
        if stop and stop != getattr(self.tokenizer, "eos_token", None):
            text = text.split(stop)[0].strip()
        return text

    def _stop_token_ids(self, stop: str) -> list[int]:
        """Stop string -> token ids, BOS stripped (mm_utils.py:571-577)."""
        ids = list(self.tokenizer.encode(stop))
        if ids and ids[0] == getattr(self.tokenizer, "bos_token_id", None):
            ids = ids[1:]
        return ids

    # ------------------------------------------------------------------
    # Two-phase corpus inference
    # ------------------------------------------------------------------
    def _offload_vision(self):
        """Move the (frozen, encode-only) vision tower + connector to host.

        On a 16 GB chip the 7B bf16 decoder leaves no room for a batched KV
        cache; parking the 0.6 GB CLIP tower between the encode and decode
        phases is what makes batch>1 decoding fit.
        """
        if self._encode_params is None:
            return
        if self._vision_host is None:
            self._vision_host = jax.tree.map(np.asarray, {
                "vision": self._encode_params["vision"],
                "connector": self._encode_params["connector"],
            })
        self._encode_params = None
        # self.params must drop its references too, or the device buffers
        # stay live and the offload frees nothing
        self.params = {
            k: v for k, v in self.params.items()
            if k not in ("vision", "connector")
        }

    def _restore_vision(self):
        if self._encode_params is not None or self._combined is None:
            return
        restored = jax.tree.map(jnp.asarray, self._vision_host)
        self._encode_params = {
            "vision": restored["vision"],
            "connector": restored["connector"],
            "towers": self.params["towers"],
        }
        self.params = {**self.params, **restored}

    def infer_events_corpus(
        self,
        load_item,                      # idx -> (frames_u8, timestamps, instruction)
        num_items: int,
        *,
        encode_batch: int = 2,
        decode_batch: int = 4,
        max_new_tokens: int = 512,
        temperature: float = 0.0,
        template: str = "llama_2",
        seed: int = 0,
        constrain_time: bool = False,
        offload_vision: Optional[bool] = None,
        prefill_batch: Optional[int] = None,
        producer_threads: int = 4,
        prefetch_batches: int = 6,
        token_budget: Optional[int] = None,
        prewarm_compiles: bool = True,
        streamed: bool = False,
    ) -> list[EventPredictions]:
        """Encode every video first (vision tower resident), then batch-decode.

        The tower offloads to host between the phases only when it must
        (bf16 weights leave no HBM headroom); with int8 weights everything
        fits and the 0.6 GB host round-trip (~40 s over a tunneled link) is
        skipped.

        prefill_batch < decode_batch runs the serving-style split: prefill
        sub-batches fill a shared decode-batch cache (prefill's activation
        working set ~B*P*D caps its batch well below what the ~B*D decode
        loop sustains), then one decode executable runs the full batch.
        prefill_batch=None (default) picks the split automatically for
        decode_batch > 8 — a monolithic batch-32 prefill cannot fit one
        chip; pass 0 to force the monolithic program."""
        if prefill_batch is None and decode_batch > 8:
            prefill_batch = 2 if decode_batch >= 32 else 4
        elif prefill_batch == 0:
            prefill_batch = None
        if offload_vision is None:
            from trace_tpu.model.quantize import is_quantized

            dec = self._decoder_params or self.params.get("decoder", {})
            lyr = dec.get("layers", {})
            # the serving layout may have fused wq/wk/wv into wqkv
            offload_vision = not is_quantized(lyr.get("wqkv", lyr.get("wq")))
        self._prepare_memory_layout()
        self._restore_vision()

        # Prefixes stay ON DEVICE (a host round-trip costs 2 x 21 MB/video
        # over the tunnel — measured to dominate encode time).  A producer
        # thread decodes/downscales/uploads the NEXT batch's frames while the
        # current batch encodes, hiding the slow host->device link behind
        # compute.
        from concurrent.futures import ThreadPoolExecutor

        batches = [
            list(range(s, min(s + encode_batch, num_items)))
            for s in range(0, num_items, encode_batch)
        ]

        def prepare_batch(idxs):
            out = []
            for i in idxs:
                item = load_item(i)
                if isinstance(item, PreparedSampleNP):
                    out.append((self._upload_prepared(item), item.timestamps))
                    continue
                f, ts, q = item
                out.append((
                    self._prepare_sample_host(
                        f, ts, q, template, defer_preprocess=True
                    ),
                    ts,
                ))
            return out

        import time as _time

        t_encode0 = _time.perf_counter()
        prefixes: dict = {}   # video idx -> [L_i, D] row (non-split / overflow)
        masks: dict = {}      # video idx -> 1-D bool, len == its prefix rows
        frame_ids: list[np.ndarray] = []
        kv_arena = None
        # Split mode coalesces encoded rows straight into per-decode-chunk
        # stores [B_chunk, L_bucket, D]: no per-video buffers scattered
        # through HBM (fragmentation) and no second stack copy in the
        # decode loop — both OOMed decode batch 32.
        stores: dict = {}
        legacy_chunks: set = set()
        L_bucket = None
        split_mode = bool(prefill_batch and prefill_batch < decode_batch)
        D = self.config.decoder.hidden_size

        import threading

        prewarm_thread = None
        prewarm_out: dict = {}

        # ---- decode machinery (shared by the two-phase tail loop and the
        # streamed scheduler) --------------------------------------------
        streamed_mode = bool(streamed and split_mode and not offload_vision)
        detok = lambda ids: self.tokenizer.decode(ids, skip_special_tokens=True)
        results_by_idx: dict[int, EventPredictions] = {}
        decoded_chunks: set = set()
        _phase_acc = [0.0, 0.0]   # prefill_s, decode_loop_s
        decode_wall = [0.0]
        arena_box = {"a": None}
        # chunk stores alive on device: counted from creation until the
        # chunk's decode RETURNS (a popped store stays alive through its
        # prefill — it is the prefill's input), or until legacy extraction
        live_stores = [0]

        def _arena_ready():
            nonlocal prewarm_thread, kv_arena
            if prewarm_thread is not None:
                prewarm_thread.join()
                prewarm_thread = None
                # never clobber a live (donation-recycled) arena — a failed
                # prewarm publishes None and the decode path re-allocates
                if arena_box["a"] is None:
                    arena_box["a"] = prewarm_out.get("arena")
            elif arena_box["a"] is None and kv_arena is not None:
                arena_box["a"] = kv_arena
                kv_arena = None

        def _decode_chunk(c):
            """Prefill + decode one chunk; mutates shared state.  Runs on
            the main thread (two-phase) or the single decode worker
            (streamed) — never both concurrently."""
            _arena_ready()
            t0 = _time.perf_counter()
            start = c * decode_batch
            chunk = list(range(start, min(start + decode_batch, num_items)))
            B = len(chunk)
            had_store = c in stores
            if had_store:
                prefix = stores.pop(c)
                mask = np.stack([masks[i] for i in chunk])
            else:
                # bucket to 128 so the generate wrappers skip their own pad
                L = max(prefixes[i].shape[0] for i in chunk)
                L = max(128, ((L + 127) // 128) * 128)
                rows = []
                mask = np.zeros((B, L), bool)
                for b, i in enumerate(chunk):
                    pl = prefixes[i].shape[0]
                    row = prefixes[i]
                    if pl < L:  # left-pad on device
                        row = jnp.pad(row, ((L - pl, 0), (0, 0)))
                    rows.append(row)
                    mask[b, L - pl :] = masks[i]
                prefix = jnp.stack(rows)
                # the stacked copy owns the data now; free the per-video
                # device buffers before the decode program allocates
                for i in chunk:
                    prefixes.pop(i, None)
                del rows
            fids = jnp.asarray(np.stack([frame_ids[i] for i in chunk])) \
                if constrain_time else None
            gen_kwargs = dict(
                max_new_tokens=max_new_tokens, initial_head=1,
                temperature=temperature, eos_id=self.tokenizer.eos_token_id,
                seed=seed, constrain_time=constrain_time, frame_time_ids=fids,
            )
            # one-element lists transfer ownership: generate frees the
            # stacked prefix before its decode executable allocates
            prefix_ref = [prefix]
            del prefix
            if prefill_batch and prefill_batch < B:
                # serving split: prefill sub-batches write into one donated
                # decode-batch cache; the decode executable returns the cache
                # so donation aliases it (no 2+ GiB input copy — what used to
                # block decode batch 24, benchmarks/decode_mem_probe.py)
                out = gen.generate_split(
                    self._decoder_params, self.config.decoder,
                    prefix_ref, jnp.asarray(mask), self._combined,
                    prefill_batch=prefill_batch, cache=arena_box["a"],
                    time_phases=True, token_budget=token_budget,
                    **gen_kwargs,
                )
                arena_box["a"] = out.cache  # same physical buffer, recycled
                if out.phase_times:
                    _phase_acc[0] += out.phase_times["prefill_s"]
                    _phase_acc[1] += out.phase_times["decode_s"]
            else:
                out = gen.generate(
                    self._decoder_params, self.config.decoder,
                    prefix_ref, jnp.asarray(mask), self._combined,
                    **gen_kwargs,
                )
            for b in range(B):
                ids = [int(t) for t in out.tokens[b] if t != gen.PAD_OUTPUT_ID]
                results_by_idx[chunk[b]] = decode_event_stream(
                    ids, detok, text_vocab_size=self.config.decoder.vocab_size
                )
            decoded_chunks.add(c)
            if had_store:
                live_stores[0] -= 1
            decode_wall[0] += _time.perf_counter() - t0

        def _prewarm(arena, bucket):
            """Compile (or cache-fetch) the prefill + decode executables
            while the encode phase runs.  Chains the donated arena through
            a zero-prefix prefill and a 1-step decode — the exact traces
            the decode phase will invoke — and hands the (aliased) buffer
            back through prewarm_out."""
            try:
                c = self.config.decoder
                budget = max(max_new_tokens, token_budget or 0)
                cache_len = bucket + budget
                D = c.hidden_size
                if gen.use_prefill_scan(decode_batch, prefill_batch):
                    # compile the SAME executable generate_split dispatches
                    # (scan over sub-batches at the full decode batch) —
                    # prewarming the dispatch-loop variant instead leaves
                    # the real compile inside the first timed chunk
                    zp = jnp.zeros((decode_batch, bucket, D), self.config.dtype)
                    zm = jnp.ones((decode_batch, bucket), bool)
                    arena, cm0, lh0, np0 = gen.prefill_all_into_jit(
                        self._decoder_params, c, arena, zp, zm,
                        prefill_batch=prefill_batch, cache_len=cache_len,
                        use_flash=gen.default_use_flash(),
                    )
                else:
                    zp = jnp.zeros((prefill_batch, bucket, D), self.config.dtype)
                    zm = jnp.ones((prefill_batch, bucket), bool)
                    arena, cm0, lh0, np0 = gen.prefill_into_jit(
                        self._decoder_params, c, arena, zp, zm, jnp.int32(0),
                        cache_len=cache_len, use_flash=gen.default_use_flash(),
                    )
                B = decode_batch
                tokens, num, arena = gen.decode_jit(
                    self._decoder_params, c, arena,
                    jnp.zeros((B, cache_len), bool),
                    jnp.zeros((B, D), lh0.dtype),
                    jnp.zeros((B,), jnp.int32),
                    self._combined,
                    jnp.full((B,), 1, jnp.int32),
                    prefix_len=bucket, max_new_tokens=budget,
                    temperature=temperature,
                    eos_id=self.tokenizer.eos_token_id,
                    rng=jax.random.PRNGKey(seed),
                    max_steps=(jnp.int32(1) if token_budget else None),
                )
                np.asarray(tokens[:1, :1])  # fence
            except Exception as e:  # pragma: no cover - best effort
                # the donated arena may be half-consumed — drop it and let
                # the decode phase allocate fresh
                arena = None
                print(f"decode prewarm failed ({type(e).__name__}: "
                      f"{str(e)[:120]}); decode phase will compile",
                      flush=True)
            prewarm_out["arena"] = arena

        # streamed mode: a single decode worker prefills+decodes completed
        # chunks WHILE later chunks encode — the chip interleaves decode
        # steps into the encode phase's link-wait gaps (uploads overlap
        # compute through the tunnel, benchmarks/upload_overlap_probe.py),
        # instead of leaving the link idle for the whole decode phase.
        # Throttled to <=2 chunks in flight so live prefix stores stay
        # bounded.  Falls back to two-phase for overflow/legacy chunks.
        decode_pool = (
            ThreadPoolExecutor(max_workers=1) if streamed_mode else None
        )
        pending_decodes: list = []
        next_stream_chunk = 0
        arena_started = False  # the arena (or its prewarm) exists exactly once
        fence_buf = None  # last device buffer written by the ENCODE loop

        # producer threads run host decode + cv2 downscale/I420 (~0.3 s of
        # host CPU per video; cv2 and device_put release the GIL) and the
        # async uploads; queued videos are small uint8 bands so a deeper
        # prefetch window is cheap insurance against link jitter
        with ThreadPoolExecutor(max_workers=producer_threads) as pool:
            futures = [
                pool.submit(prepare_batch, b) for b in batches[:prefetch_batches]
            ]
            next_submit = prefetch_batches
            for bi in range(len(batches)):
                while decode_pool is not None and len(pending_decodes) >= 2:
                    pending_decodes.pop(0).result()  # backpressure
                prepared = futures[bi].result()
                # drop the future's own reference: a consumed future kept
                # its result's DEVICE frame buffers (16.8 MB/video) alive
                # for the whole corpus — 1.6 GB of zombie uploads by the
                # end of a 96-video pass, and the mid-pass OOM that capped
                # the corpus at ~100 videos (r5 runs 3/4/6)
                futures[bi] = None
                if kv_arena is None and split_mode and not arena_started:
                    arena_started = True
                    # grab the decode-batch KV arena NOW, before the first
                    # encode program runs: the 2+ GiB contiguous K/V arrays
                    # stop fitting once prefix/frame buffers scatter through
                    # HBM (what OOMed batch 32 despite a 12.4 GiB AOT peak).
                    # The prefix length is just the expanded token count —
                    # known from host tokenization alone.  Sized from the
                    # first batch; fixed-prompt corpora (all the VTG tasks)
                    # never exceed it, and a longer later chunk falls back
                    # to a fresh allocation.
                    L0 = max(len(p[0]) for p, _ in prepared)
                    L_bucket = max(128, ((L0 + 127) // 128) * 128)
                    kv_arena = gen.init_kv_cache(
                        self.config.decoder, decode_batch,
                        L_bucket + max(max_new_tokens, token_budget or 0),
                        dtype=self.config.dtype,
                    )
                    if prewarm_compiles and not constrain_time:
                        # overlap the prefill/decode executable builds (or
                        # persistent-cache fetches — tens of seconds each
                        # through the remote compiler) with the encode
                        # phase: one zero-prefix prefill + a 1-step decode
                        # on the REAL arena (donation-aliased, so memory-
                        # neutral) populates the in-memory jit cache the
                        # decode phase will hit
                        prewarm_thread = threading.Thread(
                            target=_prewarm,
                            args=(kv_arena, L_bucket),
                            daemon=True,
                        )
                        kv_arena = None  # ownership with the thread
                        prewarm_thread.start()
                if next_submit < len(batches):
                    futures.append(pool.submit(prepare_batch, batches[next_submit]))
                    next_submit += 1
                prefix, mask = self._encode_prepared([p for p, _ in prepared])
                mask_rows = np.asarray(mask)
                idxs = batches[bi]
                L_enc = prefix.shape[1]
                if split_mode and L_enc > L_bucket:
                    # a longer prompt overflowed the bucket: its chunks fall
                    # back to per-video rows (rows already in those chunks'
                    # stores are extracted back out)
                    for b, i in enumerate(idxs):
                        c = i // decode_batch
                        if c not in legacy_chunks:
                            legacy_chunks.add(c)
                            st = stores.pop(c, None)
                            if st is not None:
                                live_stores[0] -= 1
                                base = c * decode_batch
                                for rr in range(st.shape[0]):
                                    j = base + rr
                                    if j < i:
                                        prefixes[j] = st[rr]
                                del st
                if split_mode:
                    for b, i in enumerate(idxs):
                        c, r = i // decode_batch, i % decode_batch
                        if L_enc > L_bucket or c in legacy_chunks:
                            prefixes[i] = prefix[b]
                            masks[i] = mask_rows[b]
                            fence_buf = prefixes[i]
                            continue
                        if c not in stores:
                            # cap LIVE chunk stores at 2 (each is
                            # B*L_bucket*D bf16 — 503 MB at serving shapes;
                            # a store stays live through its chunk's
                            # prefill after it leaves the dict): with host
                            # prep hoisted out of the pass the encoder
                            # outruns the decode worker to a 3-store
                            # high-water that OOMs next to the KV arena
                            # (r5 run 3, batch 24 + 512 budget). Waiting on
                            # the oldest pending decode releases one.
                            while (
                                decode_pool is not None
                                and live_stores[0] >= 2
                                and pending_decodes
                            ):
                                pending_decodes.pop(0).result()
                            Bc = min(decode_batch, num_items - c * decode_batch)
                            stores[c] = jnp.zeros(
                                (Bc, L_bucket, D), self.config.dtype
                            )
                            live_stores[0] += 1
                        stores[c] = _store_prefix_rows(
                            stores[c], prefix[b : b + 1], jnp.int32(r)
                        )
                        fence_buf = stores[c]
                        masks[i] = np.pad(mask_rows[b], (L_bucket - L_enc, 0))
                else:
                    for b, i in enumerate(idxs):
                        prefixes[i] = prefix[b]
                        masks[i] = mask_rows[b]
                        fence_buf = prefixes[i]
                del prefix
                for _, ts in prepared:
                    frame_ids.append(np.stack([
                        TIME_CODEC.encode_value(
                            t[0] if isinstance(t, (list, tuple)) else t
                        )
                        for t in ts
                    ]).astype(np.int32))
                if decode_pool is not None:
                    # chunks encode in index order: everything through the
                    # last index of this batch is now on device
                    done_through = idxs[-1]
                    while (
                        (next_stream_chunk + 1) * decode_batch - 1 <= done_through
                        and next_stream_chunk in stores
                        and next_stream_chunk not in legacy_chunks
                    ):
                        pending_decodes.append(
                            decode_pool.submit(_decode_chunk, next_stream_chunk)
                        )
                        next_stream_chunk += 1

        # encode phase ends when the last prefix is materialized (programs
        # run in submission order; fence the buffer the encode loop wrote
        # LAST — before draining the streamed decode pool, so encode_s does
        # not absorb decode wall time).  In streamed mode decode programs
        # interleave on the same device queue, so this is still encode
        # WINDOW time, not exclusive chip time; the fenced prefill_s /
        # decode_loop_s split carries the chip-time decomposition.
        if fence_buf is not None:
            np.asarray(jnp.sum(fence_buf.ravel()[:8].astype(jnp.float32)))
            fence_buf = None
        t_encode = _time.perf_counter() - t_encode0

        if decode_pool is not None:
            for f in pending_decodes:
                f.result()
            decode_pool.shutdown(wait=True)

        if offload_vision:
            self._offload_vision()

        t_decode0 = _time.perf_counter()
        for c in range(-(-num_items // decode_batch)):
            if c not in decoded_chunks:
                _decode_chunk(c)
        results = [results_by_idx[i] for i in range(num_items)]
        self.last_corpus_stats = {
            "encode_s": round(t_encode, 3),
            "decode_s": round(
                (decode_wall[0] if streamed_mode
                 else _time.perf_counter() - t_decode0), 3),
            "streamed": streamed_mode,
            # split-mode phase split (fenced between executables): the
            # in-program prefill otherwise masquerades as decode time
            "prefill_s": round(_phase_acc[0], 3),
            "decode_loop_s": round(_phase_acc[1], 3),
            "videos": num_items,
            # the real (max) spliced prefix length: video span + prompt.
            # Count True mask positions — len(mask) in split mode is the
            # 128-bucketed padded row, overstating by up to 127 tokens.
            "prefix_tokens": (
                max(int(np.asarray(m).sum()) for m in masks.values())
                if masks else 0
            ),
        }
        return results


def model_init(
    model_path: str,
    *,
    vision_path: Optional[str] = None,
    dtype=jnp.bfloat16,
    quant: str = "bf16",
) -> TracePipeline:
    """Load a released TRACE checkpoint dir into a pipeline
    (load_pretrained_model parity, reference model/builder.py:29-156).

    quant='int8' applies host-side weight-only int8 to the decoder (the
    bitsandbytes-option analog, reference builder.py:39-48) — the serving
    configuration that fits decode batch 32 on one 16 GB chip. Quality
    caveat pending released-checkpoint validation: BENCH_NOTES.md."""
    import dataclasses

    from trace_tpu.checkpoint.convert import convert_trace_checkpoint
    from trace_tpu.tokenizers.text import load_hf_tokenizer

    params, config = convert_trace_checkpoint(
        model_path, dtype=dtype, vision_path=vision_path
    )
    if quant in ("int8", "int4", "int4p"):
        from trace_tpu.model.quantize import quantize_decoder_params_host

        if quant == "int4" and jax.default_backend() == "axon":
            # fail fast with the support-matrix message (README) instead of
            # the client's deep RecursionError on the first int4 op
            raise ValueError(
                "quant='int4' (native jnp.int4) is not usable through the "
                "axon dev tunnel: the client RecursionErrors on any int4 "
                "op. Use quant='int4p' (nibble-packed, any backend) or "
                "'int8'. See README 'support matrix'."
            )
        bits = 8 if quant == "int8" else 4
        params = dict(params)
        # int4p = nibble-packed 4-bit (two weights per int8 byte): identical
        # quantized values to int4, but stored as plain int8 arrays so it
        # runs through jax clients without native int4 support and through
        # the Pallas tile-local unpack matmul (kernels/quant_matmul.py)
        params["decoder"] = quantize_decoder_params_host(
            params["decoder"], bits, pack=(quant == "int4p")
        )
        import os

        if os.environ.get("TRACE_TPU_FUSE_DEC", "1") == "1":
            # fuse ON HOST, before upload: device-side fusion would
            # transiently double the weight residency and fragment HBM
            # ahead of the KV arena (measured OOM at decode batch 24)
            from trace_tpu.model.quantize import fuse_decoder_serving

            params["decoder"] = fuse_decoder_serving(params["decoder"])
        config = dataclasses.replace(
            config,
            decoder=dataclasses.replace(
                config.decoder, kv_cache_dtype="int8",
                # int8 prefill runs W8A8; int4p prefill runs W4A8 (in-program
                # unpack to s8, same MXU dot) while decode stays weight-only
                # packed — halved weight bytes on the HBM-bound step. Native
                # jnp.int4 stays weight-only (no s8 operand view of S4).
                act_quant=(quant in ("int8", "int4p")),
            ),
        )
    tokenizer = load_hf_tokenizer(model_path)
    return TracePipeline(params=params, config=config, tokenizer=tokenizer)
