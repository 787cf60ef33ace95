"""Sharded (multi-chip) generation: GSPMD prefill + FSM decode + frame-SP
encode must emit exactly the tokens the single-device path emits."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trace_tpu.model.config import TraceConfig
from trace_tpu.model.trace_model import (
    combined_embedding,
    init_trace_params,
    tokens_per_frame,
)
from trace_tpu.runtime import generate as gen
from trace_tpu.runtime.mesh import build_mesh, shard_params_for_inference
from trace_tpu.runtime.pipeline import (
    TracePipeline,
    encode_prefix_sharded,
    expand_prompt_ids,
)
from trace_tpu.tokenizers.text import ByteTokenizer

CFG = TraceConfig.tiny()


@pytest.fixture(scope="module")
def setup():
    params = init_trace_params(CFG, jax.random.PRNGKey(0))
    pipe = TracePipeline(params=params, config=CFG, tokenizer=ByteTokenizer())
    pipe._prepare_memory_layout()
    return pipe


def _prefix(pipe, B=4):  # mesh data axis = 4
    T = CFG.num_frames
    rng = np.random.default_rng(0)
    frames = [
        rng.integers(0, 255, (T, 56, 56, 3), dtype=np.uint8) for _ in range(B)
    ]
    ts = [[float(i)] for i in range(T)]
    return pipe._prepare_prefix_batch(
        frames, [ts] * B, [f"question {b}" for b in range(B)]
    )


class TestShardedGenerate:
    def test_tokens_match_single_device(self, setup):
        pipe = setup
        prefix, mask = _prefix(pipe)

        ref = gen.generate(
            pipe._decoder_params, CFG.decoder, prefix, mask, pipe._combined,
            max_new_tokens=16, initial_head=1, eos_id=-5, use_flash=False,
        )

        mesh = build_mesh(8, model_axis=2)  # tiny model: 4 heads, 2 kv heads
        sparams = shard_params_for_inference(pipe._decoder_params, mesh)
        out = gen.generate_sharded(
            sparams, CFG.decoder, prefix, mask, pipe._combined,
            mesh=mesh, max_new_tokens=16, initial_head=1, eos_id=-5,
        )
        np.testing.assert_array_equal(out.tokens, ref.tokens)
        np.testing.assert_array_equal(out.num_generated, ref.num_generated)

    def test_decoder_params_actually_sharded(self, setup):
        mesh = build_mesh(8, model_axis=2)
        sparams = shard_params_for_inference(setup._decoder_params, mesh)
        wq = sparams["layers"]["wq"]  # [L, D, NH=4, hd]
        spec = wq.sharding.spec
        assert "model" in str(spec), spec

    def test_constrained_sharded_decode(self, setup):
        pipe = setup
        prefix, mask = _prefix(pipe)
        B, T = 4, CFG.num_frames
        from trace_tpu.tokenizers.event_codec import TIME_CODEC

        fids = jnp.asarray(
            np.stack([
                np.stack([TIME_CODEC.encode_value(float(i)) for i in range(T)])
            ] * B)
        ).astype(jnp.int32)

        kw = dict(
            max_new_tokens=12, initial_head=1, eos_id=-5,
            constrain_time=True, frame_time_ids=fids,
        )
        ref = gen.generate(
            pipe._decoder_params, CFG.decoder, prefix, mask, pipe._combined,
            use_flash=False, **kw,
        )
        mesh = build_mesh(8, model_axis=2)
        sparams = shard_params_for_inference(pipe._decoder_params, mesh)
        out = gen.generate_sharded(
            sparams, CFG.decoder, prefix, mask, pipe._combined, mesh=mesh, **kw
        )
        np.testing.assert_array_equal(out.tokens, ref.tokens)


class TestFrameSPEncode:
    def test_sharded_encode_matches(self, setup):
        pipe = setup
        T = CFG.num_frames
        B = 4
        rng = np.random.default_rng(1)
        tok = pipe.tokenizer

        from trace_tpu.tokenizers.event_codec import TIME_CODEC
        from trace_tpu.tokenizers.text import splice_modal_tokens
        from trace_tpu import conversation as conv

        prompt = conv.build_trace_prompt("what happens")
        spliced = splice_modal_tokens(prompt, tok)
        ids, vp = expand_prompt_ids(
            spliced, T * tokens_per_frame(CFG), CFG.decoder.vocab_size
        )
        token_ids = jnp.asarray(np.stack([ids] * B))
        video_pos = jnp.asarray([vp] * B, jnp.int32)
        frames = jnp.asarray(
            rng.normal(size=(B, T, CFG.vision.image_size, CFG.vision.image_size, 3))
        ).astype(CFG.dtype)
        fids = jnp.asarray(
            np.stack([
                np.stack([TIME_CODEC.encode_value(float(i)) for i in range(T)])
            ] * B)
        ).astype(jnp.int32)

        from trace_tpu.runtime.pipeline import _encode_prefix_jit

        ref = _encode_prefix_jit(
            setup._encode_params, CFG, token_ids, video_pos, frames, fids,
            setup._combined, False,
        )
        mesh = build_mesh(8, model_axis=2)
        got = encode_prefix_sharded(
            setup._encode_params, CFG, token_ids, video_pos, frames, fids,
            setup._combined, mesh,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=2e-4, atol=2e-5,
        )
