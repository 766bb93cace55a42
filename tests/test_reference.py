"""Tests for the pure-jnp executable spec (core/reference.py).

Includes the reference repo's two de-facto checks, upgraded to assertions
(SURVEY.md §4): the all-ones smoke input (softmax of constant scores → mean of
V = 1.0) and a randomized cross-check against an independent numpy softmax.
"""

import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.core.reference import (
    decode_reference,
    decode_reference_with_stats,
    lse_combine,
    mha_reference,
    prefill_reference,
)


def numpy_attention(q, k, v, lengths=None, causal=False, q_offset=None):
    """Independent numpy oracle."""
    b, hq, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    rep = hq // hkv
    k = np.repeat(k, rep, axis=1)
    v = np.repeat(v, rep, axis=1)
    s = np.einsum("bhqd,bhkd->bhqk", q, k).astype(np.float64) / np.sqrt(d)
    mask = np.ones((b, 1, sq, skv), dtype=bool)
    kv_pos = np.arange(skv)[None, None, None, :]
    if lengths is not None:
        mask &= kv_pos < lengths[:, None, None, None]
    if causal:
        q_pos = np.arange(sq)[None, None, :, None]
        if q_offset is not None:
            q_pos = q_pos + q_offset[:, None, None, None]
        mask &= kv_pos <= q_pos
    s = np.where(mask, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


def test_all_ones_smoke():
    # Reference smoke test: all-ones inputs → output exactly 1.0
    # (testFlashDecoder.cc:63-78 / testFlashDecoder.py:111-116 analog).
    b, h, s, d = 2, 4, 64, 32
    q = jnp.ones((b, h, d), jnp.float32)
    k = jnp.ones((b, h, s, d), jnp.float32)
    v = jnp.ones((b, h, s, d), jnp.float32)
    lengths = jnp.full((b,), s, jnp.int32)
    o = decode_reference(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(o), 1.0, rtol=1e-6)


def test_decode_matches_numpy(rng):
    b, hq, hkv, s, d = 3, 8, 2, 96, 64
    q = rng.standard_normal((b, hq, d), dtype=np.float32)
    k = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    lengths = np.array([96, 17, 1], np.int32)
    o = decode_reference(jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(lengths))
    expect = numpy_attention(q[:, :, None], k, v, lengths=lengths)[:, :, 0]
    np.testing.assert_allclose(np.asarray(o), expect, rtol=2e-5, atol=2e-5)


def test_prefill_causal_matches_numpy(rng):
    b, hq, hkv, sq, skv, d = 2, 4, 4, 32, 32, 16
    q = rng.standard_normal((b, hq, sq, d), dtype=np.float32)
    k = rng.standard_normal((b, hkv, skv, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, skv, d), dtype=np.float32)
    lengths = np.array([32, 20], np.int32)
    o = prefill_reference(
        jnp.array(q), jnp.array(k), jnp.array(v), lengths=jnp.array(lengths)
    )
    expect = numpy_attention(q, k, v, lengths=lengths, causal=True)
    np.testing.assert_allclose(np.asarray(o), expect, rtol=2e-5, atol=2e-5)


def test_prefill_with_cache_offset(rng):
    # Chunked prefill: q chunk starts at absolute position 16 of a 48-long KV.
    b, h, sq, skv, d = 1, 2, 16, 48, 32
    q = rng.standard_normal((b, h, sq, d), dtype=np.float32)
    k = rng.standard_normal((b, h, skv, d), dtype=np.float32)
    v = rng.standard_normal((b, h, skv, d), dtype=np.float32)
    off = np.array([16], np.int32)
    o = mha_reference(
        jnp.array(q), jnp.array(k), jnp.array(v), causal=True,
        q_offset=jnp.array(off),
    )
    expect = numpy_attention(q, k, v, causal=True, q_offset=off)
    np.testing.assert_allclose(np.asarray(o), expect, rtol=2e-5, atol=2e-5)


def test_split_kv_lse_combine_matches_unsplit(rng):
    """Splitting the KV range and LSE-merging partials must equal full attention.

    This is the numerics contract the flash_combine analog must satisfy
    (the mathematically-correct version of flash_attn.cu:877-935)."""
    b, hq, hkv, s, d = 2, 4, 2, 128, 32
    n_splits = 4
    q = rng.standard_normal((b, hq, d), dtype=np.float32)
    k = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    lengths = np.array([128, 45], np.int32)  # split 2+ of seq 1 sees no valid KV

    full = decode_reference(jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(lengths))

    chunk = s // n_splits
    o_parts, m_parts, l_parts = [], [], []
    for i in range(n_splits):
        lo = i * chunk
        eff_len = np.clip(lengths - lo, 0, chunk)
        o_i, m_i, l_i = decode_reference_with_stats(
            jnp.array(q),
            jnp.array(k[:, :, lo : lo + chunk]),
            jnp.array(v[:, :, lo : lo + chunk]),
            jnp.array(eff_len),
        )
        o_parts.append(o_i)
        m_parts.append(m_i)
        l_parts.append(l_i)
    merged = lse_combine(
        jnp.stack(o_parts), jnp.stack(m_parts), jnp.stack(l_parts)
    )
    np.testing.assert_allclose(np.asarray(merged), np.asarray(full), rtol=1e-5, atol=1e-5)


def test_gqa_equals_repeated_mha(rng):
    b, hq, hkv, s, d = 2, 8, 2, 64, 32
    q = rng.standard_normal((b, hq, d), dtype=np.float32)
    k = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    lengths = np.full((b,), s, np.int32)
    gqa = decode_reference(jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(lengths))
    mha = decode_reference(
        jnp.array(q),
        jnp.array(np.repeat(k, hq // hkv, axis=1)),
        jnp.array(np.repeat(v, hq // hkv, axis=1)),
        jnp.array(lengths),
    )
    np.testing.assert_allclose(np.asarray(gqa), np.asarray(mha), rtol=1e-6)
