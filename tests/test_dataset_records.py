"""Training-data parity: multi-turn, plain-QA, image, and text-only records
(reference preprocess surface train_mt.py:470-723 + image branch :785-805),
plus the bounded media-failure fallback."""

import json

import numpy as np
import pytest

from trace_tpu import conversation as conv_lib
from trace_tpu.constants import IGNORE_INDEX
from trace_tpu.data.dataset import (
    DatasetError,
    EventDataset,
    assemble_sequence,
    build_conversation_segments,
    collate_batch,
)
from trace_tpu.tokenizers.text import ByteTokenizer

TOK = ByteTokenizer()
V = 384  # tiny-config text vocab


class TestPromptChunks:
    """prompt_chunks must render EXACTLY what prompt() renders."""

    CASES = [
        [("u", "hello"), ("a", None)],
        [("u", "hello"), ("a", "world")],
        [("u", "q1"), ("a", "a1"), ("u", "q2"), ("a", "a2")],
        [("u", "q1"), ("a", "a1"), ("u", "q2"), ("a", None)],
    ]

    @pytest.mark.parametrize("name", ["llama_2", "v1", "plain", "qwen", "mistral_instruct"])
    @pytest.mark.parametrize("case", range(len(CASES)))
    def test_concat_equals_prompt(self, name, case):
        tpl = conv_lib.get_template(name)
        msgs = [
            (tpl.roles[0] if r == "u" else tpl.roles[1], m)
            for r, m in self.CASES[case]
        ]
        chunks = tpl.prompt_chunks(msgs)
        assert "".join(t for t, _ in chunks) == tpl.prompt(msgs)

    @pytest.mark.parametrize("name", ["llama_2", "v1", "qwen"])
    def test_assistant_text_supervised_user_not(self, name):
        tpl = conv_lib.get_template(name)
        msgs = [
            (tpl.roles[0], "QUESTION_ONE"),
            (tpl.roles[1], "ANSWER_ONE"),
            (tpl.roles[0], "QUESTION_TWO"),
            (tpl.roles[1], "ANSWER_TWO"),
        ]
        sup_text = "".join(t for t, s in tpl.prompt_chunks(msgs) if s)
        unsup_text = "".join(t for t, s in tpl.prompt_chunks(msgs) if not s)
        assert "ANSWER_ONE" in sup_text and "ANSWER_TWO" in sup_text
        assert "QUESTION_ONE" not in sup_text and "QUESTION_TWO" not in sup_text
        assert "QUESTION_ONE" in unsup_text


def _decode_segments(segs):
    ids = [t for s in segs for t in s.ids]
    return TOK.decode(ids)


class TestConversationSegments:
    def test_multiturn_qa_supervision(self):
        convs = [
            {"from": "human", "value": "<video>\nwhat happens?"},
            {"from": "gpt", "value": "a cat jumps"},
            {"from": "human", "value": "then what?"},
            {"from": "gpt", "value": "it lands"},
        ]
        segs, vp = build_conversation_segments(
            convs, TOK, 8, text_vocab_size=V, modal_tag="<video>"
        )
        assert vp is not None
        sup = "".join(
            TOK.decode(s.ids) for s in segs if s.supervised and s.kind == "text"
        )
        unsup = "".join(
            TOK.decode(s.ids) for s in segs if not s.supervised and s.kind == "text"
        )
        assert "a cat jumps" in sup and "it lands" in sup
        assert "what happens?" not in sup and "then what?" not in sup
        assert "what happens?" in unsup
        # exactly one video span of the requested width
        video = [s for s in segs if s.kind == "video"]
        assert len(video) == 1 and len(video[0].ids) == 8
        assert sum(len(s.ids) for s in segs[: segs.index(video[0])]) == vp

    def test_event_turn_plus_qa_turn(self):
        """Mixed conversation: one event round + one plain QA round."""
        convs = [
            {"from": "human", "value": "<video>\nfind events"},
            {"from": "gpt", "value": "<time><score>a cat jumps"},
            {"from": "human", "value": "describe the video"},
            {"from": "gpt", "value": "a short clip of a cat"},
        ]
        events = [{"timestamp": [0.0, 1.0], "score": [4.5]}]
        segs, vp = build_conversation_segments(
            convs, TOK, 8, text_vocab_size=V, events=events, modal_tag="<video>"
        )
        kinds = [s.kind for s in segs]
        assert "time" in kinds and "score" in kinds and "video" in kinds
        time_segs = [s for s in segs if s.kind == "time"]
        assert len(time_segs) == 1 and len(time_segs[0].ids) == 14  # 6+1+6+1
        score_segs = [s for s in segs if s.kind == "score"]
        assert len(score_segs[0].ids) == 4  # 3+1
        # the event caption and the plain QA answer are both supervised text
        sup = "".join(
            TOK.decode(s.ids) for s in segs if s.supervised and s.kind == "text"
        )
        assert "a cat jumps" in sup and "a short clip of a cat" in sup
        # the leading FSM-entry <sync> before the event stream is unsupervised
        i_time = kinds.index("time")
        lead = segs[i_time - 1]
        assert lead.ids[-1] == V and not lead.supervised

    def test_multi_event_single_turn(self):
        convs = [
            {"from": "human", "value": "<video>\nfind events"},
            {"from": "gpt", "value": "first event\nsecond event"},
        ]
        events = [
            {"timestamp": [0.0, 1.0], "score": [4.0]},
            {"timestamp": [2.0, 3.0], "score": [2.0]},
        ]
        segs, _ = build_conversation_segments(
            convs, TOK, 8, text_vocab_size=V, events=events, modal_tag="<video>"
        )
        assert len([s for s in segs if s.kind == "time"]) == 2
        sup = "".join(
            TOK.decode(s.ids) for s in segs if s.supervised and s.kind == "text"
        )
        assert "first event" in sup and "second event" in sup

    def test_text_only_has_no_video_span(self):
        convs = [
            {"from": "human", "value": "what is 2+2?"},
            {"from": "gpt", "value": "4"},
        ]
        segs, vp = build_conversation_segments(convs, TOK, 8, text_vocab_size=V)
        assert vp is None
        assert not any(s.kind == "video" for s in segs)

    def test_leading_gpt_turn_dropped(self):
        convs = [
            {"from": "gpt", "value": "stray"},
            {"from": "human", "value": "q"},
            {"from": "gpt", "value": "a"},
        ]
        segs, _ = build_conversation_segments(convs, TOK, 8, text_vocab_size=V)
        text = _decode_segments([s for s in segs if s.kind == "text"])
        assert "stray" not in text

    def test_modal_tag_moved_to_front(self):
        """preprocess_multimodal parity: tag leads its turn."""
        convs = [
            {"from": "human", "value": "what happens? <video>"},
            {"from": "gpt", "value": "things"},
        ]
        segs, vp = build_conversation_segments(
            convs, TOK, 8, text_vocab_size=V, modal_tag="<video>"
        )
        video_idx = next(i for i, s in enumerate(segs) if s.kind == "video")
        after = _decode_segments(segs[video_idx + 1 : video_idx + 2])
        assert "what happens?" in after

    def test_assemble_roundtrip(self):
        convs = [
            {"from": "human", "value": "<video>\nq"},
            {"from": "gpt", "value": "a"},
        ]
        segs, vp = build_conversation_segments(
            convs, TOK, 8, text_vocab_size=V, modal_tag="<video>"
        )
        seq = assemble_sequence(segs, 1024, vp, text_vocab_size=V, eos_id=2,
                                supervise_eos=False)
        assert seq.attn_mask.sum() == sum(len(s.ids) for s in segs)
        assert (seq.labels[~np.asarray(seq.attn_mask)] == IGNORE_INDEX).all()


def _write_dataset(tmp_path, records):
    p = tmp_path / "data.json"
    with open(p, "w") as f:
        json.dump(records, f)
    return str(p)


def _make_media(tmp_path):
    rng = np.random.default_rng(0)
    np.save(tmp_path / "vid.npy", rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8))
    from PIL import Image

    Image.fromarray(
        rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    ).save(tmp_path / "img.png")


ALL_SHAPES = [
    {  # single-turn event video record (the classic VTG shape)
        "video": "vid.npy",
        "conversations": [
            {"from": "human", "value": "<video>\nfind events"},
            {"from": "gpt", "value": "cat jumps\ndog barks"},
        ],
        "times": [[0.0, 1.0], [1.0, 2.0]],
        "scores": [[4.0], [3.0]],
    },
    {  # multi-turn video QA (no events)
        "video": "vid.npy",
        "conversations": [
            {"from": "human", "value": "<video>\nwhat is this?"},
            {"from": "gpt", "value": "a test video"},
            {"from": "human", "value": "sure?"},
            {"from": "gpt", "value": "yes"},
        ],
    },
    {  # image record
        "image": "img.png",
        "conversations": [
            {"from": "human", "value": "<image>\nwhat color?"},
            {"from": "gpt", "value": "noisy"},
        ],
    },
    {  # text-only QA record
        "conversations": [
            {"from": "human", "value": "what is 2+2?"},
            {"from": "gpt", "value": "4"},
        ],
    },
]


class TestEventDatasetShapes:
    @pytest.fixture()
    def ds(self, tmp_path):
        _make_media(tmp_path)
        path = _write_dataset(tmp_path, ALL_SHAPES)
        return EventDataset(
            path, TOK, data_folder=str(tmp_path),
            num_frames=4, num_video_tokens_per_frame=3, max_len=1024,
            image_size=32, text_vocab_size=V,
        )

    def test_all_record_shapes_build(self, ds):
        samples = [ds[i] for i in range(len(ds))]
        for s in samples:
            assert s["frames_u8"].shape == (4, 32, 32, 3)
            assert s["token_ids"].shape == (1024,)
        # event record supervises time/score streams
        assert (samples[0]["time_labels"] != IGNORE_INDEX).sum() == 28  # 2 events
        assert (samples[0]["score_labels"] != IGNORE_INDEX).sum() == 8
        # QA records supervise only text
        for s in samples[1:]:
            assert (s["time_labels"] == IGNORE_INDEX).all()
            assert (s["score_labels"] == IGNORE_INDEX).all()
        # modality flags
        assert samples[0]["has_video"] and samples[1]["has_video"]
        assert samples[2]["has_video"]
        assert not samples[3]["has_video"]
        # image record timestamps are [[0]]*T
        assert (samples[2]["frame_time_ids"] == samples[2]["frame_time_ids"][0]).all()

    def test_mixed_batch_collates_and_trains(self, ds):
        import jax
        from trace_tpu.model.config import TraceConfig
        from trace_tpu.model.trace_model import forward_train, init_trace_params
        from trace_tpu.train.train import preprocess_batch_frames

        cfg = TraceConfig.tiny()
        # align dataset shapes with the tiny model: 4 frames, 3 tokens/frame
        batch = collate_batch([ds[i] for i in range(4)])
        assert batch["has_video"].tolist() == [True, True, True, False]

        params = init_trace_params(cfg, jax.random.PRNGKey(0))
        b = dict(batch)
        b["frames"] = preprocess_batch_frames(b.pop("frames_u8"), cfg)
        # trim to the model's max video token budget
        loss, aux = forward_train(params, cfg, b, remat=False)
        assert np.isfinite(float(loss))

        # text-only rows must be insensitive to their (zero) frames
        b2 = dict(b)
        frames = np.array(b2["frames"])  # writable host copy
        frames[3] = np.random.default_rng(1).normal(size=frames[3].shape)
        b2["frames"] = frames
        loss2, _ = forward_train(params, cfg, b2, remat=False)
        assert np.isclose(float(loss), float(loss2), rtol=1e-5)

    def test_modality_lengths_sign(self, ds):
        lens = ds.modality_lengths()
        assert lens[0] < 0 and lens[1] < 0  # video records negative
        assert lens[2] > 0                  # image records positive


class TestBoundedFallback:
    def test_media_failure_substitutes_then_raises(self, tmp_path):
        _make_media(tmp_path)
        records = [
            dict(ALL_SHAPES[0]),
            {**ALL_SHAPES[0], "video": "missing.mp4"},
        ]
        path = _write_dataset(tmp_path, records)
        ds = EventDataset(
            path, TOK, data_folder=str(tmp_path), num_frames=4,
            num_video_tokens_per_frame=3, max_len=1024, image_size=32,
            text_vocab_size=V,
        )
        with pytest.warns(UserWarning, match="media decode failed"):
            s = ds[1]  # falls back to a random good record
        assert s["token_ids"].shape == (1024,)
        assert ds.media_failures >= 1  # substitution may re-draw the bad record

        # all-bad dataset: bounded retries then a hard error
        path2 = _write_dataset(
            tmp_path, [{**ALL_SHAPES[0], "video": "missing.mp4"}] * 3
        )
        ds2 = EventDataset(
            path2, TOK, data_folder=str(tmp_path), num_frames=4,
            num_video_tokens_per_frame=3, max_len=1024, image_size=32,
            text_vocab_size=V,
        )
        with pytest.warns(UserWarning):
            with pytest.raises(DatasetError):
                ds2[0]

    def test_schema_error_raises_immediately(self, tmp_path):
        _make_media(tmp_path)
        bad = {"video": "vid.npy"}  # no conversations key
        path = _write_dataset(tmp_path, [bad])
        ds = EventDataset(
            path, TOK, data_folder=str(tmp_path), num_frames=4,
            num_video_tokens_per_frame=3, max_len=1024, image_size=32,
            text_vocab_size=V,
        )
        with pytest.raises(KeyError):
            ds[0]
