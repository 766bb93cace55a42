"""End-to-end attention step functions vs a from-scratch jnp golden model.

The golden model reproduces the reference's PyTorch LlamaAttention
(testFlashDecoder.py:61-94): RoPE → cache concat → softmax attention — here
asserted automatically over multi-layer, multi-step decode with ragged
lengths (SURVEY.md §4 upgrade).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.cache import contiguous, paged
from starflashattention_tpu.core.reference import mha_reference
from starflashattention_tpu.core.rope import apply_rope, rope_table
from starflashattention_tpu.runtime.params import AttentionConfig
from starflashattention_tpu.runtime.steps import (
    attention_decode_step,
    attention_decode_step_paged,
    attention_prefill_step,
    mha_fwd,
    split_fused_qkv,
)

CFG = AttentionConfig(num_q_heads=4, num_kv_heads=2, head_dim=32, num_splits=2, block_k=64)
S_MAX = 128


def golden_decode(q_steps, k_steps, v_steps, cos, sin, style="half"):
    """Sequential full-softmax decode: token t attends positions 0..t."""
    outs = []
    k_hist, v_hist = [], []
    for t, (q, k, v) in enumerate(zip(q_steps, k_steps, v_steps)):
        pos = jnp.full((q.shape[0],), t, jnp.int32)
        qr = apply_rope(q, pos, cos, sin, style=style)
        kr = apply_rope(k, pos, cos, sin, style=style)
        k_hist.append(kr)
        v_hist.append(v)
        kc = jnp.stack(k_hist, axis=2)  # (B, Hkv, t+1, D)
        vc = jnp.stack(v_hist, axis=2)
        o = mha_reference(qr[:, :, None, :], kc, vc)[:, :, 0, :]
        outs.append(o)
    return outs


def test_multi_step_multi_layer_decode(rng):
    b, L, steps = 2, 2, 5
    cos, sin = rope_table(S_MAX, CFG.rot_dim)
    cache = contiguous.init_cache(L, b, CFG.num_kv_heads, S_MAX, CFG.head_dim, dtype=jnp.float32)

    per_layer_qs = {l: [] for l in range(L)}
    per_layer_ks = {l: [] for l in range(L)}
    per_layer_vs = {l: [] for l in range(L)}
    outs = {l: [] for l in range(L)}
    for t in range(steps):
        for l in range(L):
            q = jnp.asarray(rng.standard_normal((b, CFG.num_q_heads, CFG.head_dim)), jnp.float32)
            k = jnp.asarray(rng.standard_normal((b, CFG.num_kv_heads, CFG.head_dim)), jnp.float32)
            v = jnp.asarray(rng.standard_normal((b, CFG.num_kv_heads, CFG.head_dim)), jnp.float32)
            per_layer_qs[l].append(q)
            per_layer_ks[l].append(k)
            per_layer_vs[l].append(v)
            o, cache = attention_decode_step(CFG, cache, l, q, k, v, cos, sin)
            outs[l].append(o)
        cache = contiguous.advance(cache)

    for l in range(L):
        gold = golden_decode(per_layer_qs[l], per_layer_ks[l], per_layer_vs[l], cos, sin)
        for t in range(steps):
            np.testing.assert_allclose(
                np.asarray(outs[l][t]), np.asarray(gold[t]), atol=2e-5, rtol=2e-5,
                err_msg=f"layer {l} step {t}",
            )


def test_paged_decode_step_matches_contiguous(rng):
    b, L = 2, 1
    cos, sin = rope_table(S_MAX, CFG.rot_dim)
    c_cache = contiguous.init_cache(L, b, CFG.num_kv_heads, S_MAX, CFG.head_dim, dtype=jnp.float32)
    ps = 16
    p_cache = paged.init_paged_cache(
        L, b, CFG.num_kv_heads, CFG.head_dim,
        num_pages=2 * (S_MAX // ps) + 1, page_size=ps, pages_per_seq=S_MAX // ps,
        dtype=jnp.float32,
    )
    alloc = paged.PageAllocator(p_cache.num_pages)
    pt = np.zeros((b, p_cache.pages_per_seq), np.int32)
    for i in range(b):
        pt[i] = alloc.alloc(p_cache.pages_per_seq)
    import dataclasses
    p_cache = dataclasses.replace(p_cache, page_table=jnp.asarray(pt))

    for t in range(4):
        q = jnp.asarray(rng.standard_normal((b, CFG.num_q_heads, CFG.head_dim)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, CFG.num_kv_heads, CFG.head_dim)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, CFG.num_kv_heads, CFG.head_dim)), jnp.float32)
        o_c, c_cache = attention_decode_step(CFG, c_cache, 0, q, k, v, cos, sin)
        o_p, p_cache = attention_decode_step_paged(CFG, p_cache, 0, q, k, v, cos, sin)
        np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_c), atol=2e-5, rtol=2e-5)
        c_cache = contiguous.advance(c_cache)
        import dataclasses as dc
        p_cache = dc.replace(p_cache, lengths=p_cache.lengths + 1)


def test_prefill_then_decode_consistency(rng):
    """Prefill a prompt then decode one token == decoding all tokens one by one."""
    b, sq = 2, 8
    cos, sin = rope_table(S_MAX, CFG.rot_dim)

    qs = [jnp.asarray(rng.standard_normal((b, CFG.num_q_heads, CFG.head_dim)), jnp.float32) for _ in range(sq + 1)]
    ks = [jnp.asarray(rng.standard_normal((b, CFG.num_kv_heads, CFG.head_dim)), jnp.float32) for _ in range(sq + 1)]
    vs = [jnp.asarray(rng.standard_normal((b, CFG.num_kv_heads, CFG.head_dim)), jnp.float32) for _ in range(sq + 1)]

    # Path A: token-by-token decode.
    cache_a = contiguous.init_cache(1, b, CFG.num_kv_heads, S_MAX, CFG.head_dim, dtype=jnp.float32)
    outs_a = []
    for t in range(sq + 1):
        o, cache_a = attention_decode_step(CFG, cache_a, 0, qs[t], ks[t], vs[t], cos, sin)
        outs_a.append(o)
        cache_a = contiguous.advance(cache_a)

    # Path B: prefill sq tokens as a chunk, then decode the last token.
    cache_b = contiguous.init_cache(1, b, CFG.num_kv_heads, S_MAX, CFG.head_dim, dtype=jnp.float32)
    q_chunk = jnp.stack(qs[:sq], axis=2)  # (B, Hq, Sq, D)
    k_chunk = jnp.stack(ks[:sq], axis=2)
    v_chunk = jnp.stack(vs[:sq], axis=2)
    new_lengths = jnp.full((b,), sq, jnp.int32)
    o_chunk, cache_b = attention_prefill_step(
        CFG, cache_b, 0, q_chunk, k_chunk, v_chunk, new_lengths, cos, sin
    )
    cache_b = contiguous.advance(cache_b, sq)
    o_last, cache_b = attention_decode_step(CFG, cache_b, 0, qs[sq], ks[sq], vs[sq], cos, sin)

    for t in range(sq):
        np.testing.assert_allclose(
            np.asarray(o_chunk[:, :, t]), np.asarray(outs_a[t]), atol=3e-5, rtol=3e-5,
            err_msg=f"prefill row {t}",
        )
    np.testing.assert_allclose(np.asarray(o_last), np.asarray(outs_a[sq]), atol=3e-5, rtol=3e-5)


def test_mha_fwd_fused_qkv_and_bias(rng):
    b = 2
    cos, sin = rope_table(S_MAX, CFG.rot_dim)
    hq, hkv, d = CFG.num_q_heads, CFG.num_kv_heads, CFG.head_dim
    qkv = jnp.asarray(rng.standard_normal((b, hq + 2 * hkv, d)), jnp.float32)
    qb = jnp.asarray(rng.standard_normal((hq, d)), jnp.float32)

    cache = contiguous.init_cache(1, b, hkv, S_MAX, d, dtype=jnp.float32)
    o, _ = mha_fwd(CFG, cache, 0, qkv, cos, sin, q_bias=qb)

    q, k, v = split_fused_qkv(qkv, CFG)
    cache2 = contiguous.init_cache(1, b, hkv, S_MAX, d, dtype=jnp.float32)
    o2, _ = attention_decode_step(CFG, cache2, 0, q + qb, k, v, cos, sin)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o2), atol=1e-6)


def test_split_fused_qkv_flat_layout(rng):
    flat = jnp.asarray(rng.standard_normal((3, (4 + 2 * 2) * 32)), jnp.float32)
    q, k, v = split_fused_qkv(flat, CFG)
    assert q.shape == (3, 4, 32) and k.shape == (3, 2, 32) and v.shape == (3, 2, 32)


def test_config_validation():
    with pytest.raises(ValueError):
        AttentionConfig(num_q_heads=5, num_kv_heads=2, head_dim=32)
    with pytest.raises(ValueError):
        AttentionConfig(num_q_heads=4, num_kv_heads=2, head_dim=33)
