"""Pluggable moderation hook (reference trace/utils.py:102-120 equivalent)."""

from trace_tpu.utils.moderation import set_moderation_backend, violates_moderation


def test_fail_open_without_backend():
    assert violates_moderation("anything") is False


def test_backend_flag_and_error_swallow():
    set_moderation_backend(lambda t: "bad" in t)
    assert violates_moderation("this is bad") is True
    assert violates_moderation("fine") is False

    def boom(t):
        raise RuntimeError("network down")

    set_moderation_backend(boom)
    assert violates_moderation("whatever") is False
    set_moderation_backend(None)
