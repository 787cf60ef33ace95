"""The full TRACE multimodal model: vision tower + connector + towers + decoder.

Functional re-design of TraceMetaModel / TraceMetaForCausalLM
(/root/reference/trace/model/trace_arch.py).  The reference splices
per-modality embeddings with Python loops and boolean scatters per batch row
(trace_arch.py:340-524); here the data pipeline lays out one fixed-shape
combined-id sequence per sample (video span pre-expanded to its static
``T * tokens_per_frame`` length), and the device does:

* one gather from the combined [32027, D] embedding table for every
  non-video token (text, sync, time chars, score chars), and
* one dynamic-slice scatter of the computed video features into the span.

No ragged shapes, no per-row Python — everything jits and shards.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from trace_tpu.constants import TIME_TOKENS_PER_FRAME
from trace_tpu.model import connector as connector_lib
from trace_tpu.model.config import TraceConfig
from trace_tpu.model.mistral import (
    compute_logits,
    decoder_forward,
    init_decoder_params,
)
from trace_tpu.model.towers import init_tower_params
from trace_tpu.model.vit import init_vit_params, vit_forward
from trace_tpu.runtime.generate import build_combined_embedding


def init_trace_params(config: TraceConfig, key: jax.Array, dtype=None):
    dtype = dtype or config.dtype
    k1, k2, k3, k4 = jax.random.split(key, 4)
    init_conn, _ = connector_lib.build_connector(config.mm_projector_type)
    return {
        "decoder": init_decoder_params(config.decoder, k1, dtype=dtype),
        "vision": init_vit_params(config.vision, k2, dtype=dtype),
        "connector": init_conn(
            k3, config.vision.hidden_size, config.decoder.hidden_size,
            num_slots=config.num_slots, dtype=dtype,
        )
        if config.mm_projector_type in ("spatial_slot", "slot")
        else init_conn(k3, config.vision.hidden_size, config.decoder.hidden_size, dtype=dtype),
        "towers": init_tower_params(k4, config.decoder.hidden_size, dtype=dtype),
    }


def combined_embedding(params: dict) -> jax.Array:
    """[32027, D] input-embedding table: text ++ sync ++ time ++ score."""
    return build_combined_embedding(
        params["decoder"]["embed"],
        params["towers"]["sync"],
        params["towers"]["time"],
        params["towers"]["score"],
    )


def tokens_per_frame(config: TraceConfig) -> int:
    return config.num_slots + TIME_TOKENS_PER_FRAME


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _frozen_tower(vision_params, flat, vcfg, chunk, use_flash):
    """Chunked frozen-ViT forward, opaque to autodiff (zero-grad vjp)."""
    vit = lambda c: vit_forward(vision_params, vcfg, c, use_flash=use_flash)
    if chunk and flat.shape[0] > chunk and flat.shape[0] % chunk == 0:
        chunks = flat.reshape((flat.shape[0] // chunk, chunk) + flat.shape[1:])
        feats = jax.lax.map(vit, chunks)
        return feats.reshape((flat.shape[0],) + feats.shape[2:])
    return vit(flat)  # [B*T, N, D]


def _frozen_tower_fwd(vision_params, flat, vcfg, chunk, use_flash):
    out = _frozen_tower(vision_params, flat, vcfg, chunk, use_flash)
    specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), vision_params
    )
    return out, (specs, jax.ShapeDtypeStruct(flat.shape, flat.dtype))


def _frozen_tower_bwd(vcfg, chunk, use_flash, res, g):
    pspecs, fspec = res
    zero_p = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), pspecs)
    return zero_p, jnp.zeros(fspec.shape, fspec.dtype)


_frozen_tower.defvjp(_frozen_tower_fwd, _frozen_tower_bwd)


def encode_video(
    params: dict,
    config: TraceConfig,
    frames: jax.Array,          # [B, T, H, W, 3] CLIP-normalized
    frame_time_ids: jax.Array,  # [B, T, 6] local time-token ids per frame
    *,
    use_flash: bool = False,
    remat_connector: bool = False,
) -> jax.Array:
    """Frames -> interleaved visual+time token features [B, T*(S+6), D_lm].

    Reference flow (trace_arch.py:218-266): ViT over all frames, slot
    connector to S slots/frame, concat 6 time-token embeddings per frame
    (the per-frame <sync> is dropped), flatten time-major.

    The vision tower is frozen in every training stage (clip_encoder.py:27,
    @torch.no_grad at :41).  It runs inside a custom_vjp whose backward is
    zeros — equivalent to @torch.no_grad, and necessary beyond
    stop_gradient: autodiff's partial-eval would otherwise still transpose
    the chunked lax.map around the Pallas flash call, which Mosaic's
    lowering rejects (grid_context assertion).
    """
    B, T = frames.shape[:2]
    flat = frames.reshape((B * T,) + frames.shape[2:])
    feats = _frozen_tower(
        params["vision"], flat, config.vision, config.vit_chunk_size, use_flash
    )
    feats = feats.reshape(B, T, feats.shape[1], feats.shape[2])

    _, conn_fwd = connector_lib.build_connector(config.mm_projector_type)
    if remat_connector:
        # the trained connector's residuals are several [B*T, 576, 1024]
        # buffers (144 MB each at 128 frames); recomputing them from the
        # (frozen, saved-anyway) ViT features in the backward is what keeps
        # the 7B frozen-backbone train step inside one 16 GB chip
        conn_fwd = jax.checkpoint(conn_fwd)
    slots = conn_fwd(params["connector"], feats)

    if slots.ndim == 3:
        # global-pooling connectors (slot / linear / mlp / stc family) emit
        # [B, S, D] without a frame axis — no per-frame time interleave
        # (matches the reference's non-v5 aggregator paths,
        # trace_arch.py:311-338); per-frame time embeds only apply to the
        # production spatial_slot layout.
        return slots

    # [B, T, S, D_lm] per-frame connectors: interleave 6 time tokens/frame
    time_feats = params["towers"]["time"][frame_time_ids]  # [B, T, 6, D_lm]
    merged = jnp.concatenate([slots, time_feats.astype(slots.dtype)], axis=2)
    return merged.reshape(B, T * merged.shape[2], merged.shape[3])


def build_input_embeds(
    params: dict,
    config: TraceConfig,
    token_ids: jax.Array,      # [B, L] combined-space ids; video span = any id
    video_features: jax.Array,  # [B, Tv, D] from encode_video
    video_pos: jax.Array,       # [B] start index of the video span
    table: Optional[jax.Array] = None,  # precomputed combined embedding
    has_video: Optional[jax.Array] = None,  # [B] bool; False = no span splice
) -> jax.Array:
    """Gather token embeddings and scatter the video span. [B, L, D].

    ``has_video=False`` rows (text-only QA records in the trace-uni mix)
    keep their token embeddings untouched — the zero-frame features are
    computed (uniform batch compute, like the reference's zero-image
    substitute at train_mt.py:846-849) but never spliced.
    """
    if table is None:
        table = combined_embedding(params)
    embeds = table[jnp.clip(token_ids, 0, table.shape[0] - 1)]

    def put(row_embeds, row_feats, pos):
        return jax.lax.dynamic_update_slice(
            row_embeds, row_feats.astype(row_embeds.dtype), (pos, jnp.int32(0))
        )

    spliced = jax.vmap(put)(embeds, video_features, video_pos)
    if has_video is None:
        return spliced
    return jnp.where(has_video[:, None, None], spliced, embeds)


def three_stream_loss(
    dec_params: dict,
    c,
    hidden: jax.Array,          # [B, L, D] decoder output (final-normed)
    labels: jax.Array,          # [B, L] text-stream labels (or IGNORE)
    time_labels: jax.Array,
    score_labels: jax.Array,
    *,
    chunk: int = 256,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Summed 3-stream CE (reference trace_mistral.py:218-237), computed in
    sequence chunks under jax.checkpoint: the [B, L, 32027] fp32 logits
    (and their log_softmax + cotangents, ~0.8 GB at L=2048) never
    materialize — each chunk's logits are recomputed in the backward.
    Chunking is exact: softmax is per-position; sums/counts accumulate in
    fp32 and normalize once at the end."""
    from trace_tpu.constants import IGNORE_INDEX

    B, L, D = hidden.shape
    v = c.vocab_size
    # shift once: hidden[t] predicts labels[t+1]
    h = hidden[:, :-1]
    labs = jnp.stack(
        [labels[:, 1:], time_labels[:, 1:], score_labels[:, 1:]]
    )  # [3, B, L-1]
    n = -(-(L - 1) // chunk)
    pad = n * chunk - (L - 1)
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        labs = jnp.pad(labs, ((0, 0), (0, 0), (0, pad)),
                       constant_values=IGNORE_INDEX)
    h = h.reshape(B, n, chunk, D).swapaxes(0, 1)          # [n, B, C, D]
    labs = labs.reshape(3, B, n, chunk).transpose(2, 0, 1, 3)  # [n, 3, B, C]

    slices = (
        (0, v + 1),                                  # text + sync
        (v + 1, c.time_vocab_size),                  # time
        (v + 1 + c.time_vocab_size, c.score_vocab_size),  # score
    )

    def body(carry, x):
        h_c, lab_c = x
        logits = compute_logits(dec_params, h_c)     # [B, C, CV] fp32
        sums, counts = carry
        new_s, new_c = [], []
        for s, (off, width) in enumerate(slices):
            lg = jax.lax.dynamic_slice_in_dim(logits, off, width, axis=-1)
            lab = lab_c[s]
            valid = lab != IGNORE_INDEX
            lab_safe = jnp.where(valid, lab, 0)
            logp = jax.nn.log_softmax(lg, axis=-1)
            nll = -jnp.take_along_axis(logp, lab_safe[..., None], axis=-1)[..., 0]
            new_s.append(sums[s] + jnp.sum(jnp.where(valid, nll, 0.0)))
            new_c.append(counts[s] + jnp.sum(valid))
        return (jnp.stack(new_s), jnp.stack(new_c)), None

    init = (jnp.zeros((3,), jnp.float32), jnp.zeros((3,), jnp.int32))
    (sums, counts), _ = jax.lax.scan(jax.checkpoint(body), init, (h, labs))
    losses = sums / jnp.maximum(counts, 1)
    return losses[0], losses[1], losses[2]


def forward_train(
    params: dict,
    config: TraceConfig,
    batch: dict,
    *,
    remat: bool = True,
    use_flash: bool = False,
    pp_mesh=None,
    pp_microbatches: int = 1,
) -> Tuple[jax.Array, dict]:
    """Training forward: summed 3-stream CE loss (reference: trace_mistral.py:218-237).

    ``batch`` keys (all static shapes, built by the data pipeline):
      frames [B,T,H,W,3], frame_time_ids [B,T,6], token_ids [B,L],
      video_pos [B], attn_mask [B,L] bool,
      labels [B,L] (text stream: ids in [0, 32000] or IGNORE),
      time_labels [B,L] (local ids or IGNORE), score_labels [B,L].
    """
    from trace_tpu.constants import IGNORE_INDEX

    video_feats = encode_video(
        params, config, batch["frames"], batch["frame_time_ids"],
        use_flash=use_flash, remat_connector=remat,
    )
    embeds = build_input_embeds(
        params, config, batch["token_ids"], video_feats, batch["video_pos"],
        has_video=batch.get("has_video"),
    )

    B, L, D = embeds.shape
    positions = jnp.maximum(
        jnp.cumsum(batch["attn_mask"].astype(jnp.int32), axis=1) - 1, 0
    )
    # use_flash routes the LM through flash_attention_trainable: Pallas
    # forward + Pallas dq/dkv backward (kernels/flash_backward.py), scores
    # VMEM-only in both directions. The frozen vision tower takes the
    # forward-only kernel (stop_gradient upstream).
    if pp_mesh is not None:
        # pipeline-parallel decoder: layers staged over pp_mesh's 'stage'
        # axis, GPipe microbatch schedule (parallel/pipeline.py); the rest
        # of the model (ViT/connector/heads) stays replicated
        from trace_tpu.parallel.pipeline import pp_decoder_forward

        hidden = pp_decoder_forward(
            params["decoder"], config.decoder, embeds, batch["attn_mask"],
            positions, mesh=pp_mesh, num_microbatches=pp_microbatches,
            remat=remat,
        )
    else:
        hidden, _ = decoder_forward(
            params["decoder"], config.decoder, embeds, batch["attn_mask"], positions,
            remat=remat, use_flash=use_flash,
        )
    text_loss, time_loss, score_loss = three_stream_loss(
        params["decoder"], config.decoder, hidden,
        batch["labels"], batch["time_labels"], batch["score_labels"],
    )
    loss = text_loss + time_loss + score_loss
    return loss, {
        "loss": loss,
        "text_loss": text_loss,
        "time_loss": time_loss,
        "score_loss": score_loss,
    }


def encode_prefix_for_generation(
    params: dict,
    config: TraceConfig,
    token_ids: jax.Array,       # [B, L] combined ids with video span placeholder
    video_pos: jax.Array,       # [B]
    frames: jax.Array,          # [B, T, H, W, 3]
    frame_time_ids: jax.Array,  # [B, T, 6]
    *,
    use_flash: bool = False,
    table: Optional[jax.Array] = None,
) -> jax.Array:
    """Inference prefix embeds: encode video + splice, jittable end-to-end."""
    feats = encode_video(params, config, frames, frame_time_ids, use_flash=use_flash)
    return build_input_embeds(params, config, token_ids, feats, video_pos, table=table)
