"""Content-moderation hook (reference: trace/utils.py:102-120).

The reference posts user text to OpenAI's moderation endpoint and returns a
flagged bool, swallowing network errors.  This environment has no egress,
so the check is pluggable: register a callable (e.g. an on-device
classifier or a proxied endpoint) with `set_moderation_backend`; without
one, `violates_moderation` fails open (returns False), matching the
reference's behavior when the API call errors out.
"""

from __future__ import annotations

from typing import Callable, Optional

_backend: Optional[Callable[[str], bool]] = None


def set_moderation_backend(fn: Optional[Callable[[str], bool]]) -> None:
    """fn(text) -> True if the text violates policy. None disables."""
    global _backend
    _backend = fn


def violates_moderation(text: str) -> bool:
    """True if a registered backend flags `text`; False otherwise
    (fail-open, as the reference does on request errors)."""
    if _backend is None:
        return False
    try:
        return bool(_backend(text.replace("\n", "")))
    except Exception:
        return False
