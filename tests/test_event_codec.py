"""Tests for the fixed-width field codecs and the shared event codec."""

import pytest

from trace_tpu.constants import (
    COMBINED_VOCAB_SIZE,
    SCORE_OFFSET,
    SCORE_SYNC_ID,
    SYNC_TOKEN_ID,
    TIME_OFFSET,
    TIME_SEP_ID,
    TIME_SYNC_ID,
)
from trace_tpu.tokenizers.event_codec import (
    LOCAL_SEP,
    LOCAL_SYNC,
    SCORE_CODEC,
    TIME_CODEC,
    classify_combined,
    decode_event_stream,
    encode_event_stream,
)
from trace_tpu.tokenizers.text import ByteTokenizer


class TestTimeCodec:
    def test_fixed_width_serialization(self):
        # format(t, '0>6.1f') — reference time_encoder.py:58
        assert TIME_CODEC.encode_value(90.0) == [
            2 + 0, 2 + 0, 2 + 9, 2 + 0, 12, 2 + 0
        ]  # "0090.0"

    def test_round_trip(self):
        for v in [0.0, 0.1, 9.5, 90.0, 123.4, 9999.9]:
            ids = TIME_CODEC.encode_value(v)
            assert len(ids) == 6
            assert TIME_CODEC.decode(ids) == [v]

    def test_multi_value_encode(self):
        # [s, e] -> s-chars <sep> e-chars <sync>
        ids = TIME_CODEC.encode([12.3, 45.6])
        assert len(ids) == 6 + 1 + 6 + 1
        assert ids[6] == LOCAL_SEP
        assert ids[-1] == LOCAL_SYNC
        assert TIME_CODEC.decode(ids) == [12.3, 45.6]

    def test_empty_encodes_to_sync_only(self):
        assert TIME_CODEC.encode([]) == [LOCAL_SYNC]

    def test_too_long_video_rejected(self):
        with pytest.raises(ValueError):
            TIME_CODEC.encode_value(10000.0)  # 7 chars; cf. mm_utils.py:466


class TestScoreCodec:
    def test_fixed_width(self):
        assert SCORE_CODEC.encode_value(4.5) == [2 + 4, 12, 2 + 5]  # "4.5"

    def test_round_trip(self):
        for v in [0.0, 1.0, 2.5, 4.5, 5.0, 9.9]:
            ids = SCORE_CODEC.encode_value(v)
            assert len(ids) == 3
            assert SCORE_CODEC.decode(ids) == [v]

    def test_out_of_range_rejected(self):
        with pytest.raises(ValueError):
            SCORE_CODEC.encode_value(10.0)


class TestCombinedSpace:
    def test_block_boundaries(self):
        assert classify_combined(0) == "text"
        assert classify_combined(31999) == "text"
        assert classify_combined(SYNC_TOKEN_ID) == "sync"
        assert classify_combined(32001) == "time"
        assert classify_combined(32013) == "time"
        assert classify_combined(32014) == "score"
        assert classify_combined(32026) == "score"
        assert COMBINED_VOCAB_SIZE == 32027
        with pytest.raises(ValueError):
            classify_combined(32027)

    def test_special_ids(self):
        assert TIME_SYNC_ID == 32001
        assert TIME_SEP_ID == 32002
        assert SCORE_SYNC_ID == 32014
        assert TIME_OFFSET == 32001
        assert SCORE_OFFSET == 32014


class TestEventStream:
    def setup_method(self):
        self.tok = ByteTokenizer()

    def _detok(self, ids):
        return self.tok.decode(ids)

    def test_round_trip_two_events(self):
        events = [
            {"timestamp": [0.0, 12.5], "score": [4.5], "caption": "a cat plays"},
            {"timestamp": [12.5, 30.0], "score": [3.0], "caption": "a chick hops"},
        ]
        stream = encode_event_stream(events, lambda s: self.tok.encode(s)[1:])
        decoded = decode_event_stream(stream, self._detok)
        assert decoded.timestamps == [[0.0, 12.5], [12.5, 30.0]]
        assert decoded.scores == [[4.5], [3.0]]
        assert decoded.captions == ["a cat plays", "a chick hops"]
        assert len(decoded.events()) == 2

    def test_unterminated_caption_is_flushed(self):
        # Generation may stop (EOS / max tokens) mid-caption; the trailing
        # partial caption must still be emitted (reference inference.py:126).
        stream = encode_event_stream(
            [{"timestamp": [1.0, 2.0], "score": [5.0], "caption": "xyz"}],
            lambda s: self.tok.encode(s)[1:],
        )[:-1]  # drop trailing text <sync>
        decoded = decode_event_stream(stream, self._detok)
        assert decoded.captions == ["xyz"]

    def test_negative_ids_skipped(self):
        decoded = decode_event_stream([-201, TIME_SYNC_ID], self._detok)
        assert decoded.timestamps == [[]]

    def test_stream_order_is_time_score_caption(self):
        stream = encode_event_stream(
            [{"timestamp": [5.0], "score": [1.0], "caption": "hi"}],
            lambda s: self.tok.encode(s)[1:],
        )
        kinds = [classify_combined(i) for i in stream]
        # 6 time chars + time sync, 3 score chars + score sync, text..., sync
        assert kinds[:7] == ["time"] * 7
        assert kinds[7:11] == ["score"] * 4
        assert kinds[-1] == "sync"
