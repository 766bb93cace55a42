"""Device-side prompt-lookup drafting for speculative decoding.

Draft tokens are proposed by N-GRAM MATCHING against the sequence's own
token history (prompt + everything generated so far) — no draft model, no
extra weights, no host round-trip: the matcher is a handful of vectorized
compares that run inside the same XLA program as the verify step
(models/llama.spec_decode_multi), so the whole speculative loop stays
on-device.

Why this fits TPU serving: decode is HBM-bound (every step streams all
weights + KV for ONE token per sequence), so verifying T candidate tokens
in one multi-query step (ops/flash_decode.flash_verify) costs barely more
than decoding one. Any accepted draft token is close to free; drafts are
exactness-checked by the verify step, so a bad draft costs nothing but the
missed opportunity. Prompt lookup is the standard draft-model-free scheme
(a.k.a. n-gram speculation); greedy outputs are BIT-IDENTICAL to plain
decoding by construction.

The reference has no speculative path at all (SURVEY.md §2 — one token per
kernel launch, flash_attn.cu:554-586); this is new capability on top of its
feature set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _match_pos(history, length, n: int):
    """Most recent earlier occurrence of the trailing ``n``-gram → (B,) int32
    window-start position, -1 when none exists."""
    b, s_hist = history.shape
    n_pos = s_hist - n + 1
    match = jnp.ones((b, n_pos), bool)
    for j in range(n):
        key_j = jnp.take_along_axis(
            history,
            jnp.clip(length - n + 1 + j, 0, s_hist - 1)[:, None],
            axis=1,
        )  # (B, 1)
        match = jnp.logical_and(match, history[:, j : n_pos + j] == key_j)
    pos = jnp.arange(n_pos, dtype=jnp.int32)[None, :]
    # exclude the key's own occurrence (p == length - n + 1) and anything
    # later; windows that would cross `length` are excluded with it
    valid = pos < (length - n + 1)[:, None]
    return jnp.max(jnp.where(jnp.logical_and(match, valid), pos, -1), axis=1)


def propose_drafts(
    history: jax.Array,  # (B, S_hist) int32 token ids
    length: jax.Array,  # (B,) int32 — tokens processed so far (cache length)
    pending: jax.Array,  # (B,) int32 — next token to process (position `length`)
    *,
    num_draft: int,
    ngram: int = 2,
) -> jax.Array:
    """Propose ``num_draft`` continuation tokens per sequence → (B, k) int32.

    ``history[b, p]`` is the token at absolute position ``p``; positions
    ``0 .. length[b]`` are valid (the caller writes ``pending`` at position
    ``length`` before drafting). LONGEST-MATCH BACKOFF (the standard
    prompt-lookup scheme): the trailing ``ngram``-gram is tried first; if it
    has no earlier occurrence the key shortens by one, down to a single
    token — long keys are precise (their continuations usually agree with
    the model) but rare, short keys always hit but mispredict more, and the
    backoff takes the longest available. Measured on the trained byte model
    (spec_bench --trained): fixed 2-gram accepts ~0.38 extra tokens/step vs
    ~0.09 for a fixed 3-gram (recall collapse); backoff dominates both.
    With no match at any length the draft repeats ``pending`` — the verify
    step will simply accept nothing and emit its usual one token.
    """
    length = length.astype(jnp.int32)
    best_p = jnp.full(history.shape[:1], -1, jnp.int32)
    best_n = jnp.zeros(history.shape[:1], jnp.int32)
    for n in range(ngram, 0, -1):
        p_n = _match_pos(history, length, n)
        take = jnp.logical_and(best_p < 0, p_n >= 0)
        best_p = jnp.where(take, p_n, best_p)
        best_n = jnp.where(take, n, best_n)
    found = best_p >= 0

    s_hist = history.shape[1]
    idx = jnp.clip(
        best_p[:, None] + best_n[:, None]
        + jnp.arange(num_draft, dtype=jnp.int32)[None, :],
        0,
        s_hist - 1,
    )
    draft = jnp.take_along_axis(history, idx, axis=1)  # (B, k)
    return jnp.where(found[:, None], draft, pending[:, None])


def write_token(
    history: jax.Array, pos: jax.Array, tok: jax.Array
) -> jax.Array:
    """``history[b, pos[b]] = tok[b]`` (clamped) → new history."""
    s_hist = history.shape[1]
    pos = jnp.clip(pos.astype(jnp.int32), 0, s_hist - 1)

    def upd(h_b, p_b, t_b):
        return jax.lax.dynamic_update_slice(h_b, t_b[None], (p_b,))

    return jax.vmap(upd)(history, pos, tok.astype(history.dtype))


def write_block(
    history: jax.Array, pos: jax.Array, toks: jax.Array
) -> jax.Array:
    """``history[b, pos[b] + j] = toks[b, j]`` (start clamped so the block
    fits) → new history."""
    s_hist = history.shape[1]
    t = toks.shape[1]
    pos = jnp.clip(pos.astype(jnp.int32), 0, s_hist - t)

    def upd(h_b, p_b, t_b):
        return jax.lax.dynamic_update_slice(h_b, t_b, (p_b,))

    return jax.vmap(upd)(history, pos, toks.astype(history.dtype))
