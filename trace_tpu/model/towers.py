"""Time / score / sync embedding towers.

Reference: trace/model/multimodal_encoder/{time,score,sync}_encoder.py — each
tower is a small learned embedding table over its local vocab (13 ids for
time/score, 1 for sync).  Here they are plain arrays in the params pytree;
serialization to/from ids lives in :mod:`trace_tpu.tokenizers.event_codec`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from trace_tpu.constants import SCORE_VOCAB_SIZE, TIME_VOCAB_SIZE
from trace_tpu.tokenizers.event_codec import TIME_CODEC


def init_tower_params(key: jax.Array, hidden: int, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)

    def rnd(k, n):
        return (jax.random.normal(k, (n, hidden), jnp.float32) * 0.02).astype(dtype)

    return {
        "time": rnd(k1, TIME_VOCAB_SIZE),
        "score": rnd(k2, SCORE_VOCAB_SIZE),
        "sync": rnd(k3, 1),
    }


def embed_time(towers: dict, local_ids: jax.Array) -> jax.Array:
    return towers["time"][local_ids]


def embed_score(towers: dict, local_ids: jax.Array) -> jax.Array:
    return towers["score"][local_ids]


def embed_sync(towers: dict, n: int) -> jax.Array:
    """The sync tower ignores its input ids (sync_encoder.py:17)."""
    return jnp.broadcast_to(towers["sync"][0], (n, towers["sync"].shape[1]))


def frame_time_tokens(timestamps_sec: jax.Array | list) -> jnp.ndarray:
    """Per-frame timestamps -> [T, 6] local time-token ids (no <sync>).

    Each frame contributes the 6 fixed-width chars of its timestamp; the
    terminating <sync> is dropped when building frame features
    (reference: trace_arch.py:243 — `[:-1]`).
    """
    import numpy as np

    rows = []
    for t in list(timestamps_sec):
        t = float(t[0]) if isinstance(t, (list, tuple)) else float(t)
        rows.append(TIME_CODEC.encode_value(t))
    return jnp.asarray(np.asarray(rows, np.int32))
