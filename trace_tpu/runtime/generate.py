"""Compiled autoregressive generation with the TRACE output-head FSM.

The reference switches output heads in Python between HF generation steps by
mutating a ``heads`` list and masking the concatenated logit vector with -inf
(trace_mistral.py:244-252, 317-347).  Here the whole decode loop — including
the head state machine — runs inside one jitted ``lax.while_loop``:

* per-sequence head state is an int32 array in {0: text, 1: time, 2: score};
* head restriction is a static ``[3, combined_vocab]`` additive mask table;
* head transitions (swap_tokens, trace_mistral.py:86-88) are a branchless
  ``jnp.where`` chain on the emitted token id;
* the next token's input embedding is one gather from a combined
  ``[combined_vocab, D]`` embedding table (text embeddings ++ sync ++ time ++
  score tower embeddings), replacing the reference's four separate embedding
  modules at decode time.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trace_tpu.model.config import DecoderConfig
from trace_tpu.model.mistral import (
    NEG_INF,
    compute_logits,
    decoder_forward,
    init_kv_cache,
)

PAD_OUTPUT_ID = -1  # emitted for steps after a sequence finished


def default_use_flash() -> bool:
    """Pallas flash attention on accelerators, XLA attention on CPU."""
    return jax.default_backend() != "cpu"


def head_mask_table(config: DecoderConfig) -> jnp.ndarray:
    """[3, combined_vocab] additive mask: 0 inside the head's slice, -inf out.

    Slices follow trace_mistral.py:248: text head sees [0, V+1) (text+sync),
    time head [V+1, V+1+Vt), score head [V+1+Vt, V+1+Vt+Vs).
    """
    v, vt, vs = config.vocab_size, config.time_vocab_size, config.score_vocab_size
    cv = config.combined_vocab_size
    table = np.full((3, cv), NEG_INF, np.float32)
    table[0, : v + 1] = 0.0
    table[1, v + 1 : v + 1 + vt] = 0.0
    table[2, v + 1 + vt : v + 1 + vt + vs] = 0.0
    return jnp.asarray(table)


def swap_heads(config: DecoderConfig, head: jax.Array, token: jax.Array) -> jax.Array:
    """Branchless head transition on the emitted token (swap_tokens rules)."""
    v, vt = config.vocab_size, config.time_vocab_size
    head = jnp.where(token == v, 1, head)            # text <sync>  -> time
    head = jnp.where(token == v + 1, 2, head)        # time <sync>  -> score
    head = jnp.where(token == v + 1 + vt, 0, head)   # score <sync> -> text
    return head


def build_combined_embedding(
    text_embed: jax.Array,   # [V, D]
    sync_embed: jax.Array,   # [1, D]
    time_embed: jax.Array,   # [Vt, D]
    score_embed: jax.Array,  # [Vs, D]
) -> jax.Array:
    """Single [combined_vocab, D] input-embedding table for decode gathers."""
    return jnp.concatenate([text_embed, sync_embed, time_embed, score_embed], axis=0)


@dataclasses.dataclass
class GenerateOutput:
    tokens: np.ndarray        # [B, max_new_tokens], PAD_OUTPUT_ID after finish
    num_generated: np.ndarray  # [B]
    # generate_split only: the final KV cache, returned so a serving loop can
    # recycle one preallocated arena across batches (donation keeps it the
    # same physical buffer — no realloc, no HBM fragmentation). Discardable.
    cache: object = None
    # generate_split(time_phases=True): {"prefill_s", "decode_s"} measured
    # with a device fence between the prefill executables and the decode
    # loop — the honest split the lumped phase timing cannot see.
    phase_times: object = None


# ---------------------------------------------------------------------------
# trace-retrieval: constrain time-head decoding to input frame timestamps
# ---------------------------------------------------------------------------
# The released trace-retrieval variant forces predicted timestamps to align
# with the input frame timestamps (reference README.md:20,59; learnable via
# GT snapping at train_mt.py:842).  Decode-side, the allowed 6-char sequences
# form a trie over the frames' fixed-width timestamps; the FSM below tracks,
# per batch row, (a) how many chars of the current value were emitted and
# (b) which frames still match that prefix — a branchless [B, T] mask.

def _time_constraint_logit_mask(
    config: DecoderConfig,
    frame_chars: jax.Array,  # [B, T, 6] local time-char ids
    alive: jax.Array,        # [B, T] frames matching the current prefix
    value_pos: jax.Array,    # [B] chars emitted in the current value
) -> jax.Array:
    """Additive [B, combined_vocab] mask for the time head under the trie."""
    B, T, W = frame_chars.shape
    vt = config.time_vocab_size
    pos = jnp.clip(value_pos, 0, W - 1)
    chars_here = jnp.take_along_axis(
        frame_chars, pos[:, None, None], axis=2
    )[..., 0]  # [B, T]

    local = jnp.arange(vt)  # [vt]
    char_allowed = jnp.any(
        alive[:, :, None] & (chars_here[:, :, None] == local[None, None, :]),
        axis=1,
    )  # [B, vt]
    mid_value = (value_pos < W)[:, None]
    char_allowed = char_allowed & mid_value

    boundary = ((value_pos == 0) | (value_pos == W))[:, None]
    allowed = char_allowed.at[:, 0].set(boundary[:, 0])   # <sync>
    allowed = allowed.at[:, 1].set(boundary[:, 0])        # <sep>

    time_mask = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)
    full = jnp.zeros((B, config.combined_vocab_size), jnp.float32)
    return jax.lax.dynamic_update_slice(
        full, time_mask, (0, config.vocab_size + 1)
    )


def _time_constraint_update(
    config: DecoderConfig,
    token: jax.Array,        # [B] emitted combined ids
    frame_chars: jax.Array,  # [B, T, 6]
    alive: jax.Array,        # [B, T]
    value_pos: jax.Array,    # [B]
):
    """Advance the trie state on the emitted token."""
    v = config.vocab_size
    W = frame_chars.shape[2]
    local = token - (v + 1)
    in_time = (token >= v + 1) & (token < v + 1 + config.time_vocab_size)
    is_char = in_time & (local >= 2)
    is_reset = (~in_time) | (in_time & (local <= 1))  # sep/sync or leaving time

    pos = jnp.clip(value_pos, 0, W - 1)
    chars_here = jnp.take_along_axis(frame_chars, pos[:, None, None], axis=2)[..., 0]
    new_alive = alive & (chars_here == local[:, None])
    alive = jnp.where(is_char[:, None], new_alive, alive)
    value_pos = jnp.where(is_char, value_pos + 1, value_pos)

    alive = jnp.where(is_reset[:, None], jnp.ones_like(alive), alive)
    value_pos = jnp.where(is_reset, 0, value_pos)
    return alive, value_pos


@partial(
    jax.jit,
    static_argnames=(
        "config",
        "max_new_tokens",
        "cache_len",
        "temperature",
        "eos_id",
        "use_flash",
        "constrain_time",
        "prefill_batch",
    ),
)
def generate_jit(
    params: dict,
    config: DecoderConfig,
    prefix_embeds: jax.Array,   # [B, P, D] LEFT-padded (content right-aligned)
    prefix_mask: jax.Array,     # [B, P] bool
    combined_embed: jax.Array,  # [CV, D]
    initial_head: jax.Array,    # [B] int32
    *,
    max_new_tokens: int,
    cache_len: int,
    temperature: float = 0.0,
    eos_id: int = 2,
    use_flash: bool = False,
    constrain_time: bool = False,
    frame_time_ids: Optional[jax.Array] = None,  # [B, T, 6] local ids
    rng: Optional[jax.Array] = None,
    prefill_batch: Optional[int] = None,
    stop_ids: Optional[jax.Array] = None,  # [N, K] int32, -1 left-padded
) -> Tuple[jax.Array, jax.Array]:
    """Prefill + FSM decode, fully compiled. Returns (tokens, num_generated).

    prefill_batch < B runs the prefill in sub-batches INSIDE this one
    program: the unrolled sub-prefills write their stripes into the
    decode-batch cache (a program-internal temp, so no donated-input copy
    and XLA reuses one sub-cache buffer across iterations). Prefill's
    B*P*D activation working set is what caps the monolithic batch on a
    full chip; the decode loop's ~B*D is not.
    """
    B, P, D = prefix_embeds.shape
    assert cache_len >= P + max_new_tokens, "cache too small"
    c = config

    if prefill_batch is None or prefill_batch >= B:
        cache, cache_mask, last_hidden, next_pos = _prefill(
            params, c, prefix_embeds, prefix_mask,
            cache_len=cache_len, use_flash=use_flash,
        )
    else:
        pb = prefill_batch
        cache = init_kv_cache(c, B, cache_len, dtype=prefix_embeds.dtype)
        cms, lhs, nps = [], [], []
        for r in range(0, B, pb):
            sub_cache, cm, lh, npos = _prefill(
                params, c,
                prefix_embeds[r : r + pb], prefix_mask[r : r + pb],
                cache_len=cache_len, use_flash=use_flash,
            )
            cache = jax.tree.map(
                lambda big, small: jax.lax.dynamic_update_slice(
                    big, small.astype(big.dtype),
                    (jnp.int32(0), jnp.int32(r))
                    + (jnp.int32(0),) * (big.ndim - 2),
                ),
                cache, sub_cache,
            )
            cms.append(cm)
            lhs.append(lh)
            nps.append(npos)
        cache_mask = jnp.concatenate(cms)
        last_hidden = jnp.concatenate(lhs)
        next_pos = jnp.concatenate(nps)

    tokens, num, _ = _decode_from_state(
        params, c, cache, cache_mask, last_hidden, next_pos,
        combined_embed, initial_head,
        prefix_len=P, max_new_tokens=max_new_tokens, temperature=temperature,
        eos_id=eos_id, constrain_time=constrain_time,
        frame_time_ids=frame_time_ids, rng=rng,
        embed_dtype=prefix_embeds.dtype, stop_ids=stop_ids,
    )
    return tokens, num


def _prefill(params, c, prefix_embeds, prefix_mask, *, cache_len, use_flash):
    """Prefill phase: returns (cache, cache_mask, last_hidden, next_pos)."""
    B, P, D = prefix_embeds.shape
    cache = init_kv_cache(c, B, cache_len, dtype=prefix_embeds.dtype)
    positions = jnp.maximum(jnp.cumsum(prefix_mask.astype(jnp.int32), axis=1) - 1, 0)
    hidden, cache = decoder_forward(
        params, c, prefix_embeds, prefix_mask, positions,
        cache=cache, cache_index=jnp.int32(0),
        cache_mask=jnp.zeros((B, cache_len), jnp.bool_),
        use_flash=use_flash,
    )
    cache_mask = jnp.pad(prefix_mask.astype(jnp.bool_), ((0, 0), (0, cache_len - P)))
    last_hidden = hidden[:, -1, :]  # content is right-aligned
    next_pos = jnp.sum(prefix_mask.astype(jnp.int32), axis=1)  # [B]
    return cache, cache_mask, last_hidden, next_pos


prefill_jit = partial(
    jax.jit, static_argnames=("c", "cache_len", "use_flash")
)(_prefill)


def _prefill_into(params, c, big, prefix_embeds, prefix_mask, row, *,
                  cache_len, use_flash):
    """Prefill a sub-batch and write its rows into the donated full-batch
    cache at batch offset ``row`` — one executable, so the sub-batch cache
    is a program temp and the big cache updates in place (no separate
    merge_cache_rows pass holding both buffers live)."""
    cache, cm, lh, npos = _prefill(
        params, c, prefix_embeds, prefix_mask,
        cache_len=cache_len, use_flash=use_flash,
    )

    def put(b, s):
        idx = (jnp.int32(0), row.astype(jnp.int32)) + (jnp.int32(0),) * (b.ndim - 2)
        return jax.lax.dynamic_update_slice(b, s.astype(b.dtype), idx)

    return jax.tree.map(put, big, cache), cm, lh, npos


prefill_into_jit = partial(
    jax.jit,
    static_argnames=("c", "cache_len", "use_flash"),
    donate_argnums=(2,),
)(_prefill_into)


def _prefill_all_into(params, c, big, prefix_embeds, prefix_mask, *,
                      prefill_batch, cache_len, use_flash):
    """ALL prefill sub-batches in one executable: a lax.scan over B/pb
    sub-chunks writes each sub-cache into the donated full-batch arena.

    Replaces the Python loop of prefill_into_jit dispatches — measured
    ~36 ms of per-dispatch overhead each at serving shapes (B=24, P=2560,
    pb=2: 12 dispatches, benchmarks/prefill_probe.py 2026-08-19), which a
    single program reclaims while compiling ONE sub-batch body (scan), not
    an unrolled copy per sub-batch."""
    B, P, D = prefix_embeds.shape
    pb = prefill_batch
    nb = B // pb
    pe = prefix_embeds.reshape(nb, pb, P, D)
    pm = prefix_mask.reshape(nb, pb, P)

    def body(carry, xs):
        i, pe_i, pm_i = xs
        sub, cm, lh, npos = _prefill(
            params, c, pe_i, pm_i, cache_len=cache_len, use_flash=use_flash
        )

        def put(b, s):
            idx = (jnp.int32(0), (i * pb).astype(jnp.int32)) + (
                jnp.int32(0),
            ) * (b.ndim - 2)
            return jax.lax.dynamic_update_slice(b, s.astype(b.dtype), idx)

        return jax.tree.map(put, carry, sub), (cm, lh, npos)

    big, (cms, lhs, nps) = jax.lax.scan(
        body, big, (jnp.arange(nb), pe, pm)
    )
    return (
        big,
        cms.reshape(B, -1),
        lhs.reshape(B, -1),
        nps.reshape(B),
    )


prefill_all_into_jit = partial(
    jax.jit,
    static_argnames=("c", "prefill_batch", "cache_len", "use_flash"),
    # only the arena is donated: callers (tests, probes) legitimately reuse
    # their prefix arrays across calls, and the prefix buffer was live for
    # the whole prefill phase under the dispatch-loop layout too
    donate_argnums=(2,),
)(_prefill_all_into)


def use_prefill_scan(B: int, prefill_batch: int) -> bool:
    """Whether the serving split runs its prefill as ONE scan executable
    (prefill_all_into_jit) instead of a Python dispatch loop.

    Shared by generate_split and the pipeline's prewarm so the executable
    compiled during the encode phase is the executable the decode phase
    dispatches — a prewarm that compiles the other variant leaves the real
    compile inside the timed serving window."""
    import os as _os

    return B % prefill_batch == 0 and _os.environ.get(
        "TRACE_TPU_PREFILL_SCAN", "1"
    ) == "1"


def _decode_from_state(
    params, c, cache, cache_mask, last_hidden, next_pos,
    combined_embed, initial_head, *,
    prefix_len, max_new_tokens, temperature, eos_id,
    constrain_time, frame_time_ids, rng, embed_dtype,
    stop_ids=None, max_steps=None,
):
    """FSM decode loop from a prefilled cache (the serving decode phase).

    ``stop_ids`` ([N, K] int32, -1-padded on the LEFT) compiles keyword
    stopping INTO the loop: a rolling buffer of the last K emitted ids is
    compared against each stop sequence every step, so templates whose
    separator is not EOS (vicuna '###', qwen '<|im_end|>') stop decoding at
    the keyword instead of burning steps to max_new_tokens (reference
    KeywordsStoppingCriteria, mm_utils.py:567-600, ran post-hoc on host).
    The matched ids are still emitted; the host-side text trim stays as the
    backstop for tokenizer-dependent stop-string splits.
    """
    B = last_hidden.shape[0]
    P = prefix_len
    mask_table = head_mask_table(c)

    def stop_hit(recent):
        if stop_ids is None:
            return jnp.zeros((B,), bool)
        pad = stop_ids < 0  # [N, K]
        return jnp.any(
            jnp.all(pad[None] | (recent[:, None, :] == stop_ids[None]), axis=-1),
            axis=1,
        )

    if rng is None:
        rng = jax.random.PRNGKey(0)

    if constrain_time:
        assert frame_time_ids is not None
    else:
        frame_time_ids = jnp.zeros((B, 1, 6), jnp.int32)
    alive0 = jnp.ones(frame_time_ids.shape[:2], bool)
    vpos0 = jnp.zeros((B,), jnp.int32)

    def pick_token(logits, head, key, alive, vpos):
        masked = logits + mask_table[head]
        if constrain_time:
            # only perturbs the time block, which other heads mask anyway
            masked = masked + _time_constraint_logit_mask(
                c, frame_time_ids, alive, vpos
            )
        if temperature > 0.0:
            return jax.random.categorical(key, masked / temperature, axis=-1)
        return jnp.argmax(masked, axis=-1)

    def update_constraint(tok, alive, vpos):
        if not constrain_time:
            return alive, vpos
        return _time_constraint_update(c, tok, frame_time_ids, alive, vpos)

    # --- first token from the prefill's last hidden state -----------------
    rng, k0 = jax.random.split(rng)
    logits0 = compute_logits(params, last_hidden)
    tok0 = pick_token(logits0, initial_head, k0, alive0, vpos0).astype(jnp.int32)
    K = 0 if stop_ids is None else stop_ids.shape[1]
    recent0 = (
        jnp.full((B, max(K, 1)), -2, jnp.int32)
        .at[:, -1].set(tok0)
    )
    done0 = (tok0 == eos_id) | stop_hit(recent0)
    head0 = swap_heads(c, initial_head, tok0)
    alive0, vpos0 = update_constraint(tok0, alive0, vpos0)

    tokens = jnp.full((B, max_new_tokens), PAD_OUTPUT_ID, jnp.int32)
    tokens = tokens.at[:, 0].set(jnp.where(tok0 == eos_id, eos_id, tok0))

    state = dict(
        step=jnp.int32(1),
        tokens=tokens,
        head=head0,
        cur_tok=tok0,
        cache=cache,
        cache_mask=cache_mask,
        done=done0,
        next_pos=next_pos,
        alive=alive0,
        vpos=vpos0,
        recent=recent0,
        rng=rng,
    )

    # max_new_tokens is the STATIC token-buffer/cache budget; max_steps (a
    # traced scalar) optionally stops earlier, letting one compiled decode
    # executable + KV arena serve several requested lengths (the bench's
    # 256- and 512-token passes share everything instead of recompiling)
    step_limit = (
        jnp.int32(max_new_tokens) if max_steps is None
        else jnp.minimum(jnp.int32(max_new_tokens), max_steps.astype(jnp.int32))
    )

    def cond(s):
        return (s["step"] < step_limit) & (~jnp.all(s["done"]))

    def body(s):
        step = s["step"]
        cur_embed = combined_embed[s["cur_tok"]].astype(embed_dtype)
        write_idx = P + step - 1  # slot for the token being fed in
        hidden, cache = decoder_forward(
            params, c,
            cur_embed[:, None, :],
            jnp.ones((B, 1), jnp.bool_),
            (s["next_pos"] + step - 1)[:, None],
            cache=s["cache"], cache_index=write_idx, cache_mask=s["cache_mask"],
        )
        cache_mask = s["cache_mask"].at[:, write_idx].set(True)

        rng, key = jax.random.split(s["rng"])
        logits = compute_logits(params, hidden[:, -1, :])
        tok = pick_token(logits, s["head"], key, s["alive"], s["vpos"]).astype(jnp.int32)

        recent = jnp.concatenate([s["recent"][:, 1:], tok[:, None]], axis=1)
        newly_done = (tok == eos_id) | stop_hit(recent)
        emitted = jnp.where(
            s["done"], PAD_OUTPUT_ID, jnp.where(tok == eos_id, eos_id, tok)
        )
        tokens = s["tokens"].at[:, step].set(emitted)
        done = s["done"] | newly_done
        head = jnp.where(s["done"], s["head"], swap_heads(c, s["head"], tok))
        alive, vpos = update_constraint(tok, s["alive"], s["vpos"])

        return dict(
            step=step + 1,
            tokens=tokens,
            head=head,
            cur_tok=tok,
            cache=cache,
            cache_mask=cache_mask,
            done=done,
            next_pos=s["next_pos"],
            alive=alive,
            vpos=vpos,
            recent=recent,
            rng=rng,
        )

    final = jax.lax.while_loop(cond, body, state)
    num = jnp.sum(final["tokens"] != PAD_OUTPUT_ID, axis=1)
    # the final cache is dead to callers, but decode_jit must RETURN it:
    # donation only aliases input buffers to matching OUTPUTS, and without
    # the alias XLA copies the whole donated cache into a temp before the
    # while loop (measured 2.3 GiB at B=16 int8 — what blocked batch 24)
    return final["tokens"], num, final["cache"]


@partial(
    jax.jit,
    static_argnames=(
        "config", "prefix_len", "max_new_tokens", "temperature", "eos_id",
        "constrain_time",
    ),
    donate_argnums=(2,),  # the cache is consumed in place
)
def decode_jit(
    params: dict,
    config: DecoderConfig,
    cache,                      # from prefill_jit / merge_cache_rows
    cache_mask: jax.Array,      # [B, S] bool
    last_hidden: jax.Array,     # [B, D]
    next_pos: jax.Array,        # [B] int32
    combined_embed: jax.Array,  # [CV, D]
    initial_head: jax.Array,    # [B] int32
    *,
    prefix_len: int,
    max_new_tokens: int,
    temperature: float = 0.0,
    eos_id: int = 2,
    constrain_time: bool = False,
    frame_time_ids: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    stop_ids: Optional[jax.Array] = None,
    max_steps: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, object]:
    """Decode phase as its own executable (serving-style prefill/decode
    split).  Lets prefill run at a smaller batch than decode: prefill's
    activation working set is ~B*P*D while decode's is ~B*D, so on a full
    chip the decode batch can be 2x the largest prefill batch that fits.
    All rows must share prefix_len (pipeline pads to the common bucket).

    Returns (tokens, num_generated, final_cache): the cache output exists
    only so the donated cache input aliases it (in-place while-loop
    updates) — discard it."""
    embed_dtype = jax.tree.leaves(cache)[0].dtype
    if isinstance(cache, dict):  # int8 layout stores values as int8
        embed_dtype = combined_embed.dtype
    return _decode_from_state(
        params, config, cache, cache_mask, last_hidden, next_pos,
        combined_embed, initial_head,
        prefix_len=prefix_len, max_new_tokens=max_new_tokens,
        temperature=temperature, eos_id=eos_id,
        constrain_time=constrain_time, frame_time_ids=frame_time_ids,
        rng=rng, embed_dtype=embed_dtype, stop_ids=stop_ids,
        max_steps=max_steps,
    )


@partial(jax.jit, donate_argnums=(0,))
def merge_cache_rows(big, small, row: jax.Array):
    """Write `small`'s batch rows into `big` at batch offset `row`, in
    place (donated).  Caches are [L, B, NKV, S, hd]-stacked pytrees."""
    def put(b, s):
        idx = (jnp.int32(0), row.astype(jnp.int32)) + (jnp.int32(0),) * (b.ndim - 2)
        return jax.lax.dynamic_update_slice(b, s.astype(b.dtype), idx)

    return jax.tree.map(put, big, small)


def pack_stop_sequences(stop_sequences) -> Optional[jax.Array]:
    """[[ids...], ...] -> [N, K] int32, -1 LEFT-padded (or None if empty)."""
    if not stop_sequences:
        return None
    seqs = [list(map(int, s)) for s in stop_sequences if len(s) > 0]
    if not seqs:
        return None
    K = max(len(s) for s in seqs)
    arr = np.full((len(seqs), K), -1, np.int32)
    for i, s in enumerate(seqs):
        arr[i, K - len(s):] = s
    return jnp.asarray(arr)


def generate(
    params: dict,
    config: DecoderConfig,
    prefix_embeds: jax.Array,
    prefix_mask: jax.Array,
    combined_embed: jax.Array,
    *,
    max_new_tokens: int = 1024,
    initial_head: int = 1,
    temperature: float = 0.0,
    eos_id: int = 2,
    seed: int = 0,
    pad_to_multiple: int = 128,
    use_flash: Optional[bool] = None,
    constrain_time: bool = False,
    frame_time_ids: Optional[jax.Array] = None,
    prefill_batch: Optional[int] = None,
    stop_sequences=None,
) -> GenerateOutput:
    """Host-side wrapper: left-pad/bucket the prefix, invoke the jitted loop.

    ``initial_head`` defaults to 1 (time head) matching the production prompt
    that ends with ``<sync>`` (scripts/inference/inference.py:45,54).
    ``prefill_batch`` sub-batches the prefill inside the compiled program
    (see generate_jit).  One-element-list prefix args transfer ownership
    (see generate_split).
    """
    if isinstance(prefix_embeds, list):
        prefix_embeds = prefix_embeds.pop()  # empty the caller's list
    if isinstance(prefix_mask, list):
        prefix_mask = prefix_mask.pop()
    B, P, D = prefix_embeds.shape
    bucket = max(pad_to_multiple, ((P + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple)
    if bucket != P:
        pad = bucket - P
        prefix_embeds = jnp.pad(prefix_embeds, ((0, 0), (pad, 0), (0, 0)))
        prefix_mask = jnp.pad(prefix_mask, ((0, 0), (pad, 0)))

    if use_flash is None:
        use_flash = default_use_flash()

    cache_len = bucket + max_new_tokens
    heads = jnp.full((B,), initial_head, jnp.int32)
    tokens, num = generate_jit(
        params, config, prefix_embeds, prefix_mask.astype(jnp.bool_),
        combined_embed, heads,
        max_new_tokens=max_new_tokens, cache_len=cache_len,
        temperature=temperature, eos_id=eos_id, use_flash=use_flash,
        constrain_time=constrain_time, frame_time_ids=frame_time_ids,
        rng=jax.random.PRNGKey(seed), prefill_batch=prefill_batch,
        stop_ids=pack_stop_sequences(stop_sequences),
    )
    return GenerateOutput(tokens=np.asarray(tokens), num_generated=np.asarray(num))


def generate_sharded(
    params: dict,
    config: DecoderConfig,
    prefix_embeds: jax.Array,
    prefix_mask: jax.Array,
    combined_embed: jax.Array,
    *,
    mesh,
    **kw,
) -> GenerateOutput:
    """Multi-chip generation: prefill + FSM decode compiled under GSPMD.

    ``params`` should be placed via
    :func:`trace_tpu.runtime.mesh.shard_params_for_inference` (decoder TP
    over 'model'); the batch shards over 'data'.  XLA partitions the dots
    over the sharded head/intermediate axes and inserts the ICI collectives
    — including inside the ``lax.while_loop`` decode body, whose carried
    KV cache inherits the TP sharding on its kv-head axis.

    The Pallas decode-attention/flash kernels are disabled: XLA cannot
    partition the custom calls, and its own attention partitions naturally
    over the sharded head axis (frame-SP handles the ViT side, see
    encode_prefix_sharded in runtime/pipeline.py).
    """
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    from trace_tpu.model.quantize import is_packed4

    if any(is_packed4(l) for l in params.get("layers", {}).values()):
        # the nibble-packed int4 matmul is a Pallas custom call XLA cannot
        # partition under GSPMD (and its XLA fallback would materialize the
        # unpacked weights) — int4p is a single-chip serving format
        raise ValueError(
            "int4p (nibble-packed) weights are single-chip only; use "
            "quant='int8' or 'int4' for sharded generation"
        )

    cfg = dataclasses.replace(config, use_decode_kernel=False)
    dp = lambda *names: NamedSharding(mesh, Pspec(*names))
    prefix_embeds = jax.device_put(prefix_embeds, dp("data", None, None))
    prefix_mask = jax.device_put(prefix_mask, dp("data", None))
    combined_embed = jax.device_put(combined_embed, dp())
    ft = kw.get("frame_time_ids")
    if ft is not None:
        kw["frame_time_ids"] = jax.device_put(ft, dp("data", None, None))
    return generate(
        params, cfg, prefix_embeds, prefix_mask, combined_embed,
        use_flash=False, **kw,
    )


def generate_split(
    params: dict,
    config: DecoderConfig,
    prefix_embeds: jax.Array,
    prefix_mask: jax.Array,
    combined_embed: jax.Array,
    *,
    prefill_batch: int,
    max_new_tokens: int = 1024,
    initial_head: int = 1,
    temperature: float = 0.0,
    eos_id: int = 2,
    seed: int = 0,
    pad_to_multiple: int = 128,
    use_flash: Optional[bool] = None,
    constrain_time: bool = False,
    frame_time_ids: Optional[jax.Array] = None,
    stop_sequences=None,
    cache=None,
    time_phases: bool = False,
    token_budget: Optional[int] = None,
) -> GenerateOutput:
    """generate() with the serving-style prefill/decode split: prefill runs
    in `prefill_batch` sub-batches that each write their rows into one
    donated decode-batch cache (prefill_into_jit), then a single decode
    executable runs the full batch.  Prefill's activation working set
    (~B*P*D) is what caps the monolithic batch on a full chip; decode's
    (~B*D) is not.

    ``prefix_embeds``/``prefix_mask`` may be passed as one-element lists:
    the list is emptied (ownership transfer), so the ~B*P*D prefix buffer
    is genuinely freed before the decode executable allocates — a caller
    holding its own binding would otherwise keep it live through the whole
    call (measured ~0.5 GiB at B=32, part of what OOMs batch 32).

    ``cache``: a preallocated KV arena (init_kv_cache shapes) to reuse —
    donated through prefill and decode, returned on ``GenerateOutput.cache``
    as the SAME physical buffer for the next call.  Allocating the 2+ GiB
    contiguous K/V arrays once up front, before other traffic fragments
    HBM, is what lets decode batch 32 fit on one chip; shape mismatches
    fall back to a fresh allocation."""
    if isinstance(prefix_embeds, list):
        prefix_embeds = prefix_embeds.pop()  # empty the caller's list
    if isinstance(prefix_mask, list):
        prefix_mask = prefix_mask.pop()
    B, P, D = prefix_embeds.shape
    bucket = max(
        pad_to_multiple,
        ((P + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple,
    )
    if bucket != P:
        pad = bucket - P
        prefix_embeds = jnp.pad(prefix_embeds, ((0, 0), (pad, 0), (0, 0)))
        prefix_mask = jnp.pad(prefix_mask, ((0, 0), (pad, 0)))
    prefix_mask = prefix_mask.astype(jnp.bool_)
    if use_flash is None:
        use_flash = default_use_flash()
    # token_budget > max_new_tokens sizes the cache/token buffer (and hence
    # the compiled executables) for the LARGER budget while a traced
    # max_steps scalar stops the loop at max_new_tokens — callers that run
    # several decode lengths (the bench's 256- and 512-token passes) then
    # share one decode executable and one KV arena instead of recompiling
    budget = max(max_new_tokens, token_budget or 0)
    cache_len = bucket + budget

    embed_dtype = prefix_embeds.dtype
    big = None
    if cache is not None:
        want = jax.eval_shape(
            lambda: init_kv_cache(config, B, cache_len, dtype=embed_dtype)
        )
        have = jax.tree.map(
            lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), cache
        )
        if jax.tree.structure(want) == jax.tree.structure(have) and all(
            a.shape == b.shape and a.dtype == b.dtype
            for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(have))
        ):
            big = cache
        del cache
    if big is None:
        big = init_kv_cache(config, B, cache_len, dtype=embed_dtype)
    import time as _time

    t0 = _time.perf_counter()
    import os as _os

    if use_prefill_scan(B, prefill_batch):
        # one executable for the whole prefill phase (scan over sub-
        # batches): reclaims ~36 ms/dispatch of launch overhead at serving
        # shapes (benchmarks/prefill_probe.py) and donates the prefix
        # buffer away the moment the program owns it
        big, cm_all, lh_all, np_all = prefill_all_into_jit(
            params, config, big, prefix_embeds, prefix_mask,
            prefill_batch=prefill_batch, cache_len=cache_len,
            use_flash=use_flash,
        )
        prefix_embeds = None
    else:
        cms, lhs, nps = [], [], []
        for r in range(0, B, prefill_batch):
            big, cm, lh, npos = prefill_into_jit(
                params, config, big,
                prefix_embeds[r : r + prefill_batch],
                prefix_mask[r : r + prefill_batch],
                jnp.int32(r),
                cache_len=cache_len, use_flash=use_flash,
            )
            cms.append(cm)
            lhs.append(lh)
            nps.append(npos)
        cm_all = jnp.concatenate(cms)
        lh_all = jnp.concatenate(lhs)
        np_all = jnp.concatenate(nps)
    # the prefix embeds (~B*P*D bf16) are dead once prefilled — free them
    # before the decode executable allocates its temps
    del prefix_embeds

    t1 = None
    if time_phases:
        # fence the prefill (block_until_ready is a no-op through the
        # tunneled backend; a tiny D2H reduction forces completion)
        np.asarray(jnp.sum(lh_all.ravel()[:8].astype(jnp.float32)))
        t1 = _time.perf_counter()

    heads = jnp.full((B,), initial_head, jnp.int32)
    tokens, num, big = decode_jit(
        params, config, big,
        cm_all, lh_all, np_all,
        combined_embed, heads,
        prefix_len=bucket, max_new_tokens=budget,
        temperature=temperature, eos_id=eos_id,
        constrain_time=constrain_time, frame_time_ids=frame_time_ids,
        rng=jax.random.PRNGKey(seed),
        stop_ids=pack_stop_sequences(stop_sequences),
        # always traced when a budget is given — a None here is a static
        # difference that would split the 256/512 passes into two traces
        max_steps=(jnp.int32(max_new_tokens) if token_budget else None),
    )
    tokens = np.asarray(tokens)  # forces the decode loop to completion
    phase_times = None
    if time_phases:
        t2 = _time.perf_counter()
        phase_times = {"prefill_s": t1 - t0, "decode_s": t2 - t1}
    return GenerateOutput(
        tokens=tokens, num_generated=np.asarray(num), cache=big,
        phase_times=phase_times,
    )
