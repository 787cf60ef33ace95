"""Two-phase corpus inference: parity with per-video calls + offload cycle."""

import numpy as np
import jax
import pytest

from trace_tpu.model.config import TraceConfig
from trace_tpu.model.trace_model import init_trace_params
from trace_tpu.runtime.pipeline import TracePipeline
from trace_tpu.tokenizers.text import ByteTokenizer


@pytest.fixture(scope="module")
def pipe():
    cfg = TraceConfig.tiny()
    params = init_trace_params(cfg, jax.random.PRNGKey(0))
    return TracePipeline(params=params, config=cfg, tokenizer=ByteTokenizer())


def _items(pipe, n):
    T = pipe.config.num_frames
    rng = np.random.default_rng(0)
    items = [
        (
            rng.integers(0, 255, (T, 56, 56, 3), dtype=np.uint8),
            [[float(i)] for i in range(T)],
            f"question {i}",
        )
        for i in range(n)
    ]
    return items


def test_corpus_matches_per_video(pipe):
    items = _items(pipe, 3)
    singles = [
        pipe.infer_events_from_frames(f, ts, q, max_new_tokens=12)
        for f, ts, q in items
    ]
    corpus = pipe.infer_events_corpus(
        lambda i: items[i], 3, encode_batch=2, decode_batch=2, max_new_tokens=12,
    )
    for s, c in zip(singles, corpus):
        assert s.to_dict() == c.to_dict()


def test_vision_offload_roundtrip(pipe):
    items = _items(pipe, 2)
    a = pipe.infer_events_corpus(lambda i: items[i], 2, max_new_tokens=8)
    # vision tower was offloaded at the end of the corpus run; the next
    # single-video call must transparently restore it
    b = pipe.infer_events_from_frames(*items[0], max_new_tokens=8)
    assert a[0].to_dict() == b.to_dict()

    # constrained corpus decode also runs
    c = pipe.infer_events_corpus(
        lambda i: items[i], 2, max_new_tokens=8, constrain_time=True
    )
    assert len(c) == 2


def test_corpus_split_store_path(pipe):
    """Split mode (prefill_batch < decode_batch) coalesces prefixes into
    per-chunk stores + a recycled KV arena; results must match the plain
    per-chunk path."""
    items = _items(pipe, 6)
    want = pipe.infer_events_corpus(
        lambda i: items[i], 6, encode_batch=2, decode_batch=2,
        max_new_tokens=12,
    )
    got = pipe.infer_events_corpus(
        lambda i: items[i], 6, encode_batch=2, decode_batch=4,
        prefill_batch=2, max_new_tokens=12,
    )
    for a, b in zip(want, got):
        assert a.to_dict() == b.to_dict()


def test_corpus_prepared_np_items_match(pipe):
    """load_item may return a PreparedSampleNP (pure-host prep hoisted out
    of the timed window — bench.py's pool); results must be identical to
    handing the corpus raw (frames, ts, instruction) triples, and the
    prepared sample must hold no device buffers."""
    items = _items(pipe, 4)
    want = pipe.infer_events_corpus(
        lambda i: items[i], 4, encode_batch=2, decode_batch=2,
        max_new_tokens=12,
    )
    prepared = [pipe.prepare_sample_host_np(f, ts, q) for f, ts, q in items]
    for ps in prepared:
        leaves = jax.tree.leaves(
            (ps.token_ids, ps.frames_spec, ps.time_ids)
        )
        assert not any(isinstance(x, jax.Array) for x in leaves)
    got = pipe.infer_events_corpus(
        lambda i: prepared[i], 4, encode_batch=2, decode_batch=2,
        max_new_tokens=12,
    )
    for a, b in zip(want, got):
        assert a.to_dict() == b.to_dict()

    # split/streamed mode consumes prepared items through the same path
    got2 = pipe.infer_events_corpus(
        lambda i: prepared[i], 4, encode_batch=2, decode_batch=4,
        prefill_batch=2, max_new_tokens=12, streamed=True,
    )
    for a, b in zip(want, got2):
        assert a.to_dict() == b.to_dict()


def test_corpus_split_bucket_overflow(pipe):
    """A later prompt longer than the first batch's bucket falls back to
    per-video rows for its chunks without corrupting earlier chunks."""
    items = _items(pipe, 4)
    long_q = "why " * 80  # ~320 byte-tokens past the first bucket
    items[3] = (items[3][0], items[3][1], long_q)
    want = [
        pipe.infer_events_from_frames(f, ts, q, max_new_tokens=10)
        for f, ts, q in items
    ]
    got = pipe.infer_events_corpus(
        lambda i: items[i], 4, encode_batch=2, decode_batch=2,
        prefill_batch=1, max_new_tokens=10,
    )
    for a, b in zip(want, got):
        assert a.to_dict() == b.to_dict()


def test_prewarm_compiles_is_result_neutral():
    """The compile-prewarm thread (zero-prefix prefill + 1-step decode on
    the donated arena during the encode phase) must not change tokens."""
    import jax
    import numpy as np

    from trace_tpu.model.config import TraceConfig
    from trace_tpu.model.trace_model import init_trace_params
    from trace_tpu.runtime.pipeline import TracePipeline
    from trace_tpu.tokenizers.text import ByteTokenizer

    cfg = TraceConfig.tiny()
    pipe = TracePipeline(
        params=init_trace_params(cfg, jax.random.PRNGKey(3)),
        config=cfg, tokenizer=ByteTokenizer(),
    )
    T = cfg.num_frames
    rng = np.random.default_rng(5)
    vids = [rng.integers(0, 255, (T, 40, 56, 3)).astype(np.uint8)
            for _ in range(6)]
    ts = [[float(i)] for i in range(T)]

    def load_item(i):
        return vids[i], ts, "Describe the events."

    kw = dict(encode_batch=2, decode_batch=3, prefill_batch=1,
              max_new_tokens=10, token_budget=16, offload_vision=False)
    warm = pipe.infer_events_corpus(load_item, 6, prewarm_compiles=True, **kw)
    cold = pipe.infer_events_corpus(load_item, 6, prewarm_compiles=False, **kw)
    for a, b in zip(warm, cold):
        assert a.timestamps == b.timestamps
        assert a.captions == b.captions
        assert a.scores == b.scores


def test_streamed_corpus_matches_two_phase():
    """Streamed mode (decode worker interleaved with the encode loop) must
    produce exactly the two-phase results, including a partial last chunk
    drained on the main thread."""
    import jax
    import numpy as np

    from trace_tpu.model.config import TraceConfig
    from trace_tpu.model.trace_model import init_trace_params
    from trace_tpu.runtime.pipeline import TracePipeline
    from trace_tpu.tokenizers.text import ByteTokenizer

    cfg = TraceConfig.tiny()
    pipe = TracePipeline(
        params=init_trace_params(cfg, jax.random.PRNGKey(9)),
        config=cfg, tokenizer=ByteTokenizer(),
    )
    T = cfg.num_frames
    rng = np.random.default_rng(7)
    vids = [rng.integers(0, 255, (T, 40, 56, 3)).astype(np.uint8)
            for _ in range(7)]
    ts = [[float(i)] for i in range(T)]

    def load_item(i):
        return vids[i], ts, "Localize the events."

    kw = dict(encode_batch=2, decode_batch=3, prefill_batch=1,
              max_new_tokens=8, token_budget=12, offload_vision=False)
    streamed = pipe.infer_events_corpus(load_item, 7, streamed=True, **kw)
    assert pipe.last_corpus_stats["streamed"] is True
    plain = pipe.infer_events_corpus(load_item, 7, streamed=False, **kw)
    for a, b in zip(streamed, plain):
        assert a.timestamps == b.timestamps
        assert a.captions == b.captions
        assert a.scores == b.scores


def test_streamed_decode_failure_propagates():
    """An exception in the streamed decode worker must surface to the
    caller (the bench OOM-fallback ladder depends on it) instead of
    deadlocking the encode loop."""
    import jax
    import numpy as np
    import pytest

    from trace_tpu.model.config import TraceConfig
    from trace_tpu.model.trace_model import init_trace_params
    from trace_tpu.runtime import generate as gen
    from trace_tpu.runtime.pipeline import TracePipeline
    from trace_tpu.tokenizers.text import ByteTokenizer

    cfg = TraceConfig.tiny()
    pipe = TracePipeline(
        params=init_trace_params(cfg, jax.random.PRNGKey(1)),
        config=cfg, tokenizer=ByteTokenizer(),
    )
    T = cfg.num_frames
    vids = [np.zeros((T, 40, 56, 3), np.uint8) for _ in range(6)]
    ts = [[float(i)] for i in range(T)]

    def load_item(i):
        return vids[i], ts, "q"

    orig = gen.generate_split

    def boom(*a, **k):
        raise RuntimeError("synthetic decode failure")

    gen.generate_split = boom
    try:
        with pytest.raises(RuntimeError, match="synthetic decode failure"):
            pipe.infer_events_corpus(
                load_item, 6, encode_batch=2, decode_batch=3, prefill_batch=1,
                max_new_tokens=6, offload_vision=False, streamed=True,
                prewarm_compiles=False,
            )
    finally:
        gen.generate_split = orig


def test_failed_prewarm_recovers_without_double_arena():
    """A prewarm failure (anticipated: transient remote-compile 500s) must
    not re-trigger arena allocation/prewarm in the encode loop, must not
    clobber a recycled arena, and must leave results identical."""
    import jax
    import numpy as np

    from trace_tpu.model.config import TraceConfig
    from trace_tpu.model.trace_model import init_trace_params
    from trace_tpu.runtime import generate as gen
    from trace_tpu.runtime.pipeline import TracePipeline
    from trace_tpu.tokenizers.text import ByteTokenizer

    cfg = TraceConfig.tiny()
    pipe = TracePipeline(
        params=init_trace_params(cfg, jax.random.PRNGKey(2)),
        config=cfg, tokenizer=ByteTokenizer(),
    )
    T = cfg.num_frames
    rng = np.random.default_rng(11)
    vids = [rng.integers(0, 255, (T, 40, 56, 3)).astype(np.uint8)
            for _ in range(6)]
    ts = [[float(i)] for i in range(T)]

    def load_item(i):
        return vids[i], ts, "What happens?"

    kw = dict(encode_batch=2, decode_batch=3, prefill_batch=1,
              max_new_tokens=8, token_budget=12, offload_vision=False,
              streamed=True)
    want = pipe.infer_events_corpus(load_item, 6, prewarm_compiles=False, **kw)

    arena_allocs = {"n": 0}
    orig_init = gen.init_kv_cache
    orig_dj = gen.decode_jit
    calls = {"n": 0}

    def counting_init(*a, **k):
        arena_allocs["n"] += 1
        return orig_init(*a, **k)

    def flaky_decode(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:  # the prewarm's 1-step decode
            raise RuntimeError("synthetic prewarm compile failure")
        return orig_dj(*a, **k)

    gen.init_kv_cache = counting_init
    gen.decode_jit = flaky_decode
    try:
        got = pipe.infer_events_corpus(load_item, 6, prewarm_compiles=True, **kw)
    finally:
        gen.init_kv_cache = orig_init
        gen.decode_jit = orig_dj

    for a, b in zip(got, want):
        assert a.timestamps == b.timestamps
        assert a.captions == b.captions
    # one pipeline arena + (after the failure) generate_split's fresh
    # allocations — but the ENCODE LOOP must not have re-allocated/prewarmed:
    # the pipeline-level init happens exactly once
    # (generate_split allocates per-chunk after the arena was dropped)
    assert calls["n"] >= 2  # prewarm failed, real decodes still ran
