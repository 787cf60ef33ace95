"""Training stack: label construction, freeze policies, one real train step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from trace_tpu.constants import IGNORE_INDEX
from trace_tpu.data.dataset import (
    assemble_sequence,
    build_prompt_segments,
    event_response_segments,
    snap_times_to_frames,
)
from trace_tpu.data.sampler import modality_grouped_indices, split_to_even_chunks
from trace_tpu.model.config import TraceConfig
from trace_tpu.model.trace_model import forward_train, init_trace_params, tokens_per_frame
from trace_tpu.tokenizers.text import ByteTokenizer
from trace_tpu.train.train import (
    TrainRecipe,
    build_optimizer,
    make_train_step,
    param_group,
    param_labels,
)

CFG = TraceConfig.tiny()
V = CFG.decoder.vocab_size


def _sample_batch(tok, batch_size=2, seed=0):
    from trace_tpu.data.dataset import collate_batch

    rng = np.random.default_rng(seed)
    T = CFG.num_frames
    n_video = T * tokens_per_frame(CFG)
    samples = []
    for b in range(batch_size):
        prompt_segs, video_pos = build_prompt_segments(
            "Find events.", tok, n_video, text_vocab_size=V
        )
        events = [
            {"timestamp": [0.0, 1.0], "score": [4.5], "caption": "a cat"},
            {"timestamp": [1.0, 3.0], "score": [2.0], "caption": "a dog"},
        ]
        resp = event_response_segments(events, tok, text_vocab_size=V)
        # llama_2's system prompt is ~500 byte-tokens; leave generous headroom
        # so the supervised response is never truncated away.
        seq = assemble_sequence(
            prompt_segs + resp, max_len=n_video + 640, video_pos=video_pos,
            text_vocab_size=V, eos_id=tok.eos_token_id,
        )
        samples.append({
            "frames_u8": rng.integers(0, 255, (T, 56, 56, 3), dtype=np.uint8),
            "frame_time_ids": rng.integers(2, 12, (T, 6)).astype(np.int32),
            "token_ids": seq.token_ids,
            "labels": seq.labels,
            "time_labels": seq.time_labels,
            "score_labels": seq.score_labels,
            "attn_mask": seq.attn_mask,
            "video_pos": np.int32(seq.video_pos),
        })
    return collate_batch(samples)


class TestLabelConstruction:
    def setup_method(self):
        self.tok = ByteTokenizer()

    def test_time_snapping(self):
        frame_ts = [[0.0], [2.0], [4.0]]
        out = snap_times_to_frames([[0.7, 3.2]], frame_ts)
        assert out == [[0.0, 4.0]]

    def test_three_streams_are_disjoint(self):
        events = [{"timestamp": [0.0, 1.5], "score": [4.0], "caption": "hi"}]
        segs = event_response_segments(events, self.tok, text_vocab_size=V)
        seq = assemble_sequence(segs, max_len=64, video_pos=0,
                                text_vocab_size=V, eos_id=2)
        sup_text = seq.labels != IGNORE_INDEX
        sup_time = seq.time_labels != IGNORE_INDEX
        sup_score = seq.score_labels != IGNORE_INDEX
        assert not np.any(sup_text & sup_time)
        assert not np.any(sup_text & sup_score)
        assert not np.any(sup_time & sup_score)
        # time stream: 6+1+6+1 = 14 supervised positions for [s, e]
        assert sup_time.sum() == 14
        # score stream: 3+1 = 4 for one value
        assert sup_score.sum() == 4
        # text: caption chars + <sync> + eos
        assert sup_text.sum() == len("hi") + 1 + 1

    def test_sync_label_is_vocab_size(self):
        events = [{"timestamp": [0.0], "score": [1.0], "caption": "x"}]
        segs = event_response_segments(events, self.tok, text_vocab_size=V)
        seq = assemble_sequence(segs, max_len=64, video_pos=0,
                                text_vocab_size=V, eos_id=2)
        sync_positions = seq.token_ids == V
        assert sync_positions.sum() == 1
        assert (seq.labels[sync_positions] == V).all()

    def test_prompt_is_unsupervised(self):
        segs, vp = build_prompt_segments("q", self.tok, 8, text_vocab_size=V)
        seq = assemble_sequence(segs, max_len=128, video_pos=vp,
                                text_vocab_size=V, eos_id=2, supervise_eos=False)
        assert (seq.labels == IGNORE_INDEX).all()
        assert (seq.time_labels == IGNORE_INDEX).all()


class TestFreezePolicy:
    def test_stage1_groups(self):
        assert param_group("vision/layers/wq", "pretrain") == "frozen"
        assert param_group("connector/slots", "pretrain") == "projector"
        assert param_group("towers/time", "pretrain") == "base"
        assert param_group("decoder/time_head", "pretrain") == "base"
        assert param_group("decoder/embed", "pretrain") == "frozen"
        assert param_group("decoder/layers/wq", "pretrain") == "frozen"

    def test_stage2_unfreezes_backbone(self):
        assert param_group("decoder/layers/wq", "sft") == "base"
        assert param_group("decoder/embed", "sft") == "base"
        assert param_group("vision/layers/wq", "sft") == "frozen"

    def test_stage1_frozen_params_do_not_move(self):
        params = init_trace_params(CFG, jax.random.PRNGKey(0))
        recipe = TrainRecipe.stage1(total_steps=10)
        tx = build_optimizer(params, recipe)
        opt_state = tx.init(params)
        step = jax.jit(make_train_step(CFG, tx, remat=False))

        tok = ByteTokenizer()
        batch = {k: jnp.asarray(v) for k, v in _sample_batch(tok).items()}
        # two steps: the cosine schedule warms up from lr=0 at step 0
        new_params, new_opt, metrics = step(params, opt_state, batch)
        new_params, _, metrics = step(new_params, new_opt, batch)

        assert np.isfinite(float(metrics["loss"]))
        # frozen: decoder layers identical
        np.testing.assert_array_equal(
            np.asarray(params["decoder"]["layers"]["wq"]),
            np.asarray(new_params["decoder"]["layers"]["wq"]),
        )
        np.testing.assert_array_equal(
            np.asarray(params["vision"]["layers"]["wq"]),
            np.asarray(new_params["vision"]["layers"]["wq"]),
        )
        # trained: connector + towers + aux heads moved
        assert not np.allclose(
            np.asarray(params["connector"]["slots"]),
            np.asarray(new_params["connector"]["slots"]),
        )
        assert not np.allclose(
            np.asarray(params["towers"]["time"]),
            np.asarray(new_params["towers"]["time"]),
        )
        assert not np.allclose(
            np.asarray(params["decoder"]["time_head"]),
            np.asarray(new_params["decoder"]["time_head"]),
        )


class TestTrainStepLoss:
    def test_loss_decreases_overfit(self):
        """A few sft steps on one tiny batch must reduce the summed CE."""
        params = init_trace_params(CFG, jax.random.PRNGKey(1))
        recipe = TrainRecipe(stage="sft", learning_rate=3e-3, total_steps=12)
        tx = build_optimizer(params, recipe)
        opt_state = tx.init(params)
        step = jax.jit(make_train_step(CFG, tx, remat=False))

        tok = ByteTokenizer()
        batch = {k: jnp.asarray(v) for k, v in _sample_batch(tok).items()}
        first = None
        for _ in range(8):
            params, opt_state, metrics = step(params, opt_state, batch)
            if first is None:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert last < first, (first, last)


class TestSampler:
    def test_modality_batches_do_not_mix(self):
        lengths = [10, 12, 14, -5, -6, -7, 11, -8]
        order = modality_grouped_indices(lengths, batch_size=2, seed=0)
        assert sorted(order) == list(range(8))
        for s in range(0, len(order), 2):
            signs = {lengths[i] > 0 for i in order[s : s + 2]}
            assert len(signs) == 1

    def test_even_chunks(self):
        idx = list(range(8))
        lengths = [5, 1, 4, 2, 3, 3, 2, 4]
        chunks = split_to_even_chunks(idx, lengths, 2)
        assert sorted(i for c in chunks for i in c) == idx
        assert len(chunks[0]) == len(chunks[1]) == 4


class TestShardedTrainLoop:
    def test_opt_state_init_sharded(self, tmp_path):
        """tx.init must run on SHARDED params so opt_state inherits the mesh
        placement (no replicated-then-reshard on the first step)."""
        from trace_tpu.data.dataset import collate_batch  # noqa
        from trace_tpu.runtime.mesh import build_mesh
        from trace_tpu.train.train import train_loop

        tok = ByteTokenizer()

        class FourSamples:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                return _dataset_sample(tok, i)

        mesh = build_mesh(8, model_axis=2)
        params = init_trace_params(CFG, jax.random.PRNGKey(0))
        recipe = TrainRecipe(stage="sft", total_steps=2, learning_rate=1e-4)
        params, opt_state, metrics = train_loop(
            params, CFG, FourSamples(), recipe, batch_size=4, mesh=mesh,
            log_every=0, checkpoint_dir=str(tmp_path / "ck"), save_every=1,
        )
        assert np.isfinite(float(metrics["loss"]))
        # adamw mu for a TP-sharded weight must carry the model axis
        import optax  # noqa

        leaves = jax.tree_util.tree_leaves_with_path(opt_state)
        wq_mu = [
            (p, l) for p, l in leaves
            if "wq" in "/".join(str(x) for x in p) and hasattr(l, "sharding")
        ]
        assert wq_mu, "no wq moments found in opt_state"
        assert any("model" in str(l.sharding.spec) for _, l in wq_mu), [
            str(l.sharding.spec) for _, l in wq_mu
        ]

        # resume restores and re-places on the mesh without error
        params2 = init_trace_params(CFG, jax.random.PRNGKey(0))
        p3, o3, _ = train_loop(
            params2, CFG, FourSamples(), recipe, batch_size=4, mesh=mesh,
            log_every=0, checkpoint_dir=str(tmp_path / "ck"), save_every=10,
        )

    def test_train_loop_pipeline_parallel(self):
        """train_loop drives the GPipe decoder when given a pp_mesh
        (reachable from the CLI via --pp-stages)."""
        from trace_tpu.parallel.pipeline import build_pp_mesh
        from trace_tpu.train.train import train_loop

        if len(jax.devices()) < 2:
            pytest.skip("not enough devices")
        tok = ByteTokenizer()

        class FourSamples:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                return _dataset_sample(tok, i)

        params = init_trace_params(CFG, jax.random.PRNGKey(0))
        recipe = TrainRecipe(stage="sft", total_steps=2, learning_rate=1e-4)
        _, _, metrics = train_loop(
            params, CFG, FourSamples(), recipe, batch_size=4,
            pp_mesh=build_pp_mesh(2), pp_microbatches=2, log_every=0,
        )
        assert np.isfinite(float(metrics["loss"]))


def _dataset_sample(tok, seed):
    rng = np.random.default_rng(seed)
    T = CFG.num_frames
    n_video = T * tokens_per_frame(CFG)
    prompt_segs, video_pos = build_prompt_segments(
        "Find events.", tok, n_video, text_vocab_size=V
    )
    events = [{"timestamp": [0.0, 1.0], "score": [4.5], "caption": "a cat"}]
    resp = event_response_segments(events, tok, text_vocab_size=V)
    seq = assemble_sequence(
        prompt_segs + resp, max_len=n_video + 640, video_pos=video_pos,
        text_vocab_size=V, eos_id=tok.eos_token_id,
    )
    return {
        "frames_u8": rng.integers(0, 255, (T, 56, 56, 3), dtype=np.uint8),
        "frame_time_ids": rng.integers(2, 12, (T, 6)).astype(np.int32),
        "token_ids": seq.token_ids,
        "labels": seq.labels,
        "time_labels": seq.time_labels,
        "score_labels": seq.score_labels,
        "attn_mask": seq.attn_mask,
        "video_pos": np.int32(seq.video_pos),
    }


class TestGlobalBatchSemantics:
    """The stage-1 recipe's global-batch-128 semantics at dryrun scale
    (pretrain-128.sh:11-13): grad-accum x modality-grouped sampling x GSPMD.
    Two accumulated micro-steps of 2 must produce the same parameter update
    as one step over the concatenated batch of 4 (identical per-sample token
    counts make the token-mean losses combine exactly)."""

    def test_grad_accum_matches_large_batch_on_mesh(self):
        import dataclasses

        from trace_tpu.runtime.mesh import build_mesh, shard_batch, shard_params

        tok = ByteTokenizer()
        # modality-grouped order over 4 video samples (all mm-modality):
        # the sampler decides which samples co-batch; accumulation then
        # consumes its batches two micro-batches at a time.
        lengths = [120, 80, 100, 90]
        order = modality_grouped_indices(lengths, batch_size=2, seed=3)
        assert sorted(order) == [0, 1, 2, 3]
        batch4 = _sample_batch(tok, batch_size=4, seed=11)
        # reorder the global batch per the sampler's decision
        batch4 = {k: np.asarray(v)[np.asarray(order)] for k, v in batch4.items()}

        mesh = build_mesh()
        params0 = init_trace_params(CFG, jax.random.PRNGKey(1))

        def run(recipe, micro_batches):
            params = shard_params(
                jax.tree.map(jnp.copy, params0), mesh
            )
            tx = build_optimizer(params, recipe)
            opt_state = jax.jit(tx.init)(params)
            step = jax.jit(
                make_train_step(CFG, tx, freeze_stage=recipe.stage,
                                use_flash=False),
                donate_argnums=(0, 1),
            )
            for mb in micro_batches:
                mb = shard_batch({k: jnp.asarray(v) for k, v in mb.items()}, mesh)
                params, opt_state, metrics = step(params, opt_state, mb)
            return params

        base = TrainRecipe(stage="sft", learning_rate=1e-3, total_steps=2)
        accum = dataclasses.replace(base, grad_accum_steps=2)

        halves = [
            {k: np.asarray(v)[:2] for k, v in batch4.items()},
            {k: np.asarray(v)[2:] for k, v in batch4.items()},
        ]
        p_accum = run(accum, halves)
        p_full = run(base, [batch4])

        flat_a = jax.tree_util.tree_leaves_with_path(p_accum)
        flat_f = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(p_full)
        )
        for key, leaf in flat_a:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_f[jax.tree_util.keystr(key)]),
                rtol=2e-5, atol=2e-6, err_msg=jax.tree_util.keystr(key),
            )
