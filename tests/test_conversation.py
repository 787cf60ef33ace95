"""Golden tests for prompt assembly and modal-sentinel splicing."""

from trace_tpu.constants import MODAL_TOKEN_INDEX
from trace_tpu.conversation import build_trace_prompt, get_template
from trace_tpu.tokenizers.text import ByteTokenizer, splice_modal_tokens


class TestLlama2Template:
    def test_single_turn_prompt(self):
        tpl = get_template("llama_2")
        prompt = tpl.prompt([
            tpl.user_turn("<video>\nDescribe the video."),
            tpl.assistant_turn(None),
        ])
        # LLAMA_2 branch of Conversation.get_prompt
        # (reference conversation.py:78-98): sys block wrapped in <<SYS>>,
        # user turn in [INST]...[/INST]; leading sep stripped.
        assert prompt.startswith("[INST] <<SYS>>\n")
        assert prompt.endswith("[/INST]")
        assert "<video>\nDescribe the video. [/INST]" in prompt

    def test_multi_turn(self):
        tpl = get_template("llama_2")
        prompt = tpl.prompt([
            tpl.user_turn("q1"),
            tpl.assistant_turn("a1"),
            tpl.user_turn("q2"),
            tpl.assistant_turn(None),
        ])
        assert " a1 </s>" in prompt
        assert prompt.count("[INST]") == 2
        assert prompt.endswith("[INST] q2 [/INST]")

    def test_stop_str(self):
        assert get_template("llama_2").stop_str == "</s>"


class TestTraceProductionPrompt:
    def test_sync_suffix(self):
        # reference: scripts/inference/inference.py:49-54
        prompt = build_trace_prompt("Find the events.")
        assert "<video>\nFind the events. [/INST]" in prompt
        assert prompt.endswith("<sync>")


class TestModalSplice:
    def test_video_and_sync_sentinels(self):
        tok = ByteTokenizer()
        ids = splice_modal_tokens("<video>\nhello[/INST]<sync>", tok)
        assert ids.count(MODAL_TOKEN_INDEX["VIDEO"]) == 1
        assert ids.count(MODAL_TOKEN_INDEX["SYNC"]) == 1
        assert ids[0] == tok.bos_token_id
        # VIDEO sentinel comes right after BOS (prompt starts with the tag)
        assert ids[1] == MODAL_TOKEN_INDEX["VIDEO"]
        assert ids[-1] == MODAL_TOKEN_INDEX["SYNC"]

    def test_no_bos_duplication(self):
        tok = ByteTokenizer()
        ids = splice_modal_tokens("a<video>b", tok)
        assert ids.count(tok.bos_token_id) == 1

    def test_text_round_trip(self):
        tok = ByteTokenizer()
        ids = splice_modal_tokens("abc<video>def", tok)
        text_ids = [i for i in ids if i >= 3]
        assert tok.decode(text_ids) == "abcdef"


class TestSpmLikeTokenizer:
    """SpmLikeTokenizer: SentencePiece-like sequence statistics for synthetic
    pipelines (the reference tokenizes with Mistral SPM — mm_utils.py:519)."""

    def test_llama2_dvc_prompt_token_count_matches_spm_scale(self):
        from trace_tpu.tokenizers.text import SpmLikeTokenizer

        prompt = build_trace_prompt(
            "Localize a series of activity events in the video, output the "
            "start and end timestamp for each event, and describe each event "
            "with sentences."
        )
        tok = SpmLikeTokenizer()
        n = len(splice_modal_tokens(prompt, tok))
        # real Mistral SPM ≈ 165 text tokens for this prompt; bytes = ~700.
        # The heuristic must stay within SPM scale, far from byte scale.
        assert 140 <= n <= 210, n

    def test_deterministic_and_decodable(self):
        from trace_tpu.tokenizers.text import SpmLikeTokenizer

        a, b = SpmLikeTokenizer(), SpmLikeTokenizer()
        text = "Describe the salient events, please! Timestamps: 12.5-90.0"
        assert a.encode(text) == b.encode(text)
        ids = a.encode(text)
        assert ids[0] == a.bos_token_id
        # decode inverts piece-wise (space-joined)
        out = a.decode(ids)
        for w in ("salient", "events", "please", "12", "5", "90"):
            assert w in out

    def test_long_words_split_short_words_single(self):
        from trace_tpu.tokenizers.text import SpmLikeTokenizer

        tok = SpmLikeTokenizer()
        assert len(tok.encode("cat")) == 2  # bos + 1
        assert len(tok.encode("extraordinarily")) == 1 + 3  # 15 chars -> 3

    def test_splice_compatible(self):
        from trace_tpu.tokenizers.text import SpmLikeTokenizer

        tok = SpmLikeTokenizer()
        ids = splice_modal_tokens("<video>\nhello world[/INST]<sync>", tok)
        assert ids.count(MODAL_TOKEN_INDEX["VIDEO"]) == 1
        assert ids.count(MODAL_TOKEN_INDEX["SYNC"]) == 1
        assert ids.count(tok.bos_token_id) == 1
