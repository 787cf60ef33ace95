"""VTT subtitle parsing tests."""

from trace_tpu.eval.subtitles import parse_vtt, read_vtt_and_concatenate

VTT = """WEBVTT

00:00:01.000 --> 00:00:03.000
Hello <b>world</b>

00:00:03.000 --> 00:00:05.000
Hello world

00:00:05.500 --> 00:00:08.000
Second line
continues here
"""


def test_parse_cues():
    cues = parse_vtt(VTT)
    assert cues == ["Hello world", "Hello world", "Second line continues here"]


def test_concat_dedup(tmp_path):
    p = tmp_path / "s.vtt"
    p.write_text(VTT)
    out = read_vtt_and_concatenate(str(p))
    # consecutive duplicate cue dropped
    assert out == "Hello world Second line continues here"


def test_token_budget(tmp_path):
    p = tmp_path / "s.vtt"
    p.write_text(VTT)
    out = read_vtt_and_concatenate(str(p), max_len=3)
    assert len(out.split()) == 3
