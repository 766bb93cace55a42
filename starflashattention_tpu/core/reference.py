"""Pure-jnp reference attention — the executable numerics spec.

Implements, in plain XLA ops at fp32, exactly what the Pallas kernels must
compute. This is the asserted analog of the reference's PyTorch golden model
(/root/reference/examples/python/testFlashDecoder.py:61-94: chunk fused QKV →
RoPE → cache concat → softmax(QK^T/sqrt(D)) @ V), extended with GQA, ragged
lengths, causal prefill, and the split-KV LSE merge that specifies the
combine pass (the mathematically-correct version of
/root/reference/src/flash_attn.cu:877-935 — see SURVEY.md §2.9d).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)  # avoids exp(-inf - -inf) NaN


def repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """Expand KV heads for GQA: (B, Hkv, ...) -> (B, Hkv * n_rep, ...)."""
    if n_rep == 1:
        return x
    return jnp.repeat(x, n_rep, axis=1)


def mha_reference(
    q: jax.Array,  # (B, Hq, Sq, D)
    k: jax.Array,  # (B, Hkv, Skv, D)
    v: jax.Array,  # (B, Hkv, Skv, D)
    *,
    lengths: jax.Array | None = None,  # (B,) valid KV length per sequence
    causal: bool = False,
    q_offset: jax.Array | None = None,  # (B,) absolute position of q[:, :, 0]
    sm_scale: float | None = None,
    sliding_window: int | None = None,  # row attends [row - W + 1, row]
    attention_sinks: int = 0,  # first-k positions always attendable
    softcap: float | None = None,  # Gemma-2: cap*tanh(s/cap) on scaled scores
) -> jax.Array:
    """Full-softmax multi-head attention at fp32. Returns (B, Hq, Sq, D).

    ``sliding_window`` (Mistral-style local attention, a capability the
    reference lacks): query at absolute position p attends only KV positions
    in ``[p - W + 1, p]`` (plus the length/causal masks).

    ``attention_sinks`` (StreamingLLM-style): the first k positions stay
    attendable even when they fall outside the sliding window — the
    bounded-memory infinite-context recipe (window + sinks). Only
    meaningful together with ``sliding_window``.
    """
    b, hq, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    assert hq % hkv == 0, (hq, hkv)
    k = repeat_kv(k, hq // hkv)
    v = repeat_kv(v, hq // hkv)
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)

    s = jnp.einsum(
        "bhqd,bhkd->bhqk",
        q.astype(jnp.float32),
        k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)

    kv_pos = jnp.arange(skv)[None, None, None, :]
    mask = jnp.ones((b, 1, sq, skv), dtype=bool)
    if lengths is not None:
        mask &= kv_pos < lengths[:, None, None, None]
    q_pos = jnp.arange(sq)[None, None, :, None]
    if q_offset is not None:
        q_pos = q_pos + q_offset[:, None, None, None]
    if causal:
        mask &= kv_pos <= q_pos
    if sliding_window is not None:
        in_band = kv_pos > q_pos - sliding_window
        if attention_sinks:
            in_band |= kv_pos < attention_sinks
        mask &= in_band
    s = jnp.where(mask, s, NEG_INF)

    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return o.astype(q.dtype)


def decode_reference(
    q: jax.Array,  # (B, Hq, D) — one new token per sequence
    k_cache: jax.Array,  # (B, Hkv, S, D) — already contains the new token
    v_cache: jax.Array,
    lengths: jax.Array,  # (B,) — number of valid cache positions (incl. new token)
    *,
    sm_scale: float | None = None,
    sliding_window: int | None = None,
    attention_sinks: int = 0,
    softcap: float | None = None,
) -> jax.Array:
    """Decode-phase attention: 1 query token vs the KV cache.

    The functional spec of the reference's flash_decoder + flash_combine pair
    (flash_attn.cu:554-935) once the cache append has happened. The decode
    query sits at position ``lengths - 1``, so ``sliding_window`` restricts
    it to KV positions ``[lengths - W, lengths)`` (plus the first
    ``attention_sinks`` positions, if set).
    """
    o = mha_reference(
        q[:, :, None, :], k_cache, v_cache, lengths=lengths, sm_scale=sm_scale,
        q_offset=lengths - 1, sliding_window=sliding_window,
        attention_sinks=attention_sinks, softcap=softcap,
    )
    return o[:, :, 0, :]


def decode_reference_with_stats(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    lengths: jax.Array,
    *,
    sm_scale: float | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Decode attention returning UNNORMALIZED (o_acc, m, l) partials.

    ``o = o_acc / l`` after a global merge. This is the per-shard quantity the
    split-KV scheme produces (flash_attn.cu:854-873) and what the distributed
    cross-chip combine consumes.
    """
    b, hq, d = q.shape
    hkv = k_cache.shape[1]
    k = repeat_kv(k_cache, hq // hkv).astype(jnp.float32)
    v = repeat_kv(v_cache, hq // hkv).astype(jnp.float32)
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    s = jnp.einsum("bhd,bhkd->bhk", q.astype(jnp.float32), k) * sm_scale
    mask = jnp.arange(k.shape[2])[None, None, :] < lengths[:, None, None]
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1)  # (B, Hq)
    p = jnp.exp(s - m[..., None]) * mask
    l = jnp.sum(p, axis=-1)  # (B, Hq)
    o_acc = jnp.einsum("bhk,bhkd->bhd", p, v)  # unnormalized
    return o_acc, m, l


def lse_combine(
    o_parts: jax.Array,  # (N, ..., D) unnormalized partial outputs
    m_parts: jax.Array,  # (N, ...) running maxes
    l_parts: jax.Array,  # (N, ...) running exp-sums
) -> jax.Array:
    """Merge N split-KV partials by log-sum-exp rescaling.

    The mathematically-correct form of the reference's flash_combine_kernel
    (flash_attn.cu:877-935): M = max_i m_i; O = sum_i e^{m_i - M} o_i /
    sum_i e^{m_i - M} l_i. Splits that saw no valid KV contribute
    (m=-inf→e^... = 0, l=0, o=0) and drop out.
    """
    m_parts = m_parts.astype(jnp.float32)
    l_parts = l_parts.astype(jnp.float32)
    m_global = jnp.max(m_parts, axis=0)
    alpha = jnp.exp(m_parts - m_global[None])  # (N, ...)
    l_global = jnp.sum(alpha * l_parts, axis=0)
    o_global = jnp.sum(alpha[..., None] * o_parts.astype(jnp.float32), axis=0)
    l_safe = jnp.where(l_global == 0.0, 1.0, l_global)
    return o_global / l_safe[..., None]


def prefill_reference(
    q: jax.Array,  # (B, Hq, Sq, D)
    k: jax.Array,  # (B, Hkv, Skv, D)
    v: jax.Array,
    *,
    lengths: jax.Array | None = None,
    causal: bool = True,
    sm_scale: float | None = None,
    sliding_window: int | None = None,
    softcap: float | None = None,
) -> jax.Array:
    """Causal multi-token prefill attention (capability the reference lacks;
    mandated by BASELINE.json config 2)."""
    return mha_reference(
        q, k, v, lengths=lengths, causal=causal, sm_scale=sm_scale,
        sliding_window=sliding_window, softcap=softcap,
    )
