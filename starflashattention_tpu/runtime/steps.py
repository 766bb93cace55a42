"""Fused attention step functions: RoPE + cache append + attention + combine.

One jitted program per step — the TPU-native replacement for the reference's
launch sequence (flash_api.cpp:42-68 → run_flash_decoder, flash_attn.cu:937-
1018, which does 3 struct memcpys, 2 kernel launches, and a device-wide sync
per call). The fused-QKV unpacking (flash_api.cpp:30: stride = 3*H*D) becomes
:func:`split_fused_qkv`; the in-kernel cache append (flash_attn.cu:691-701)
becomes a donated functional update XLA performs in place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from starflashattention_tpu.cache import contiguous, paged
from starflashattention_tpu.ops.flash_decode import flash_decode
from starflashattention_tpu.ops.flash_prefill import flash_prefill
from starflashattention_tpu.ops.paged_decode import paged_flash_decode
from starflashattention_tpu.core.rope import apply_rope, rope_table
from starflashattention_tpu.runtime.params import AttentionConfig


def split_fused_qkv(
    qkv: jax.Array, cfg: AttentionConfig
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Split a fused projection (..., (Hq + 2*Hkv) * D) or (..., Hq+2Hkv, D)
    into q (..., Hq, D), k/v (..., Hkv, D) — the reference's qkv layout
    (params.h:13-14: (B, 3, H, D)) generalized to GQA widths."""
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    if qkv.shape[-1] == (hq + 2 * hkv) * d:
        qkv = qkv.reshape(*qkv.shape[:-1], hq + 2 * hkv, d)
    assert qkv.shape[-2] == hq + 2 * hkv, qkv.shape
    q = qkv[..., :hq, :]
    k = qkv[..., hq : hq + hkv, :]
    v = qkv[..., hq + hkv :, :]
    return q, k, v


def _rope_tables(cfg: AttentionConfig, max_seq_len: int, dtype=jnp.float32):
    return rope_table(max_seq_len, cfg.rot_dim, base=cfg.rope_base, dtype=dtype)


def attention_decode_step(
    cfg: AttentionConfig,
    cache: contiguous.KVCache,
    layer: int,
    q: jax.Array,  # (B, Hq, D) — pre-RoPE
    k_new: jax.Array,  # (B, Hkv, D)
    v_new: jax.Array,
    cos_table: jax.Array,
    sin_table: jax.Array,
) -> tuple[jax.Array, contiguous.KVCache]:
    """One layer's decode attention: RoPE(q, k_new) at position ``lengths``,
    append into the layer's cache, attend over lengths+1 positions.

    Call :func:`cache.contiguous.advance` once after ALL layers ran (the
    reference likewise appends per layer while the caller owns seq_len,
    params.h:20).
    """
    pos = cache.lengths  # (B,) — position of the new token
    q = apply_rope(q, pos, cos_table, sin_table, style=cfg.rope_style)
    k_new = apply_rope(k_new, pos, cos_table, sin_table, style=cfg.rope_style)
    cache = contiguous.append_decode(cache, layer, k_new, v_new)
    ks, vs = cache.layer_scales(layer)
    o = flash_decode(
        q,
        cache.k,
        cache.v,
        cache.lengths + 1,
        layer=layer,  # in-kernel layer-table indexing — no per-layer gather
        sm_scale=cfg.sm_scale,
        num_splits=cfg.num_splits,
        block_k=cfg.block_k,
        k_scales=ks,
        v_scales=vs,
    )
    return o, cache


def attention_decode_step_paged(
    cfg: AttentionConfig,
    cache: paged.PagedKVCache,
    layer: int,
    q: jax.Array,  # (B, Hq, D)
    k_new: jax.Array,
    v_new: jax.Array,
    cos_table: jax.Array,
    sin_table: jax.Array,
) -> tuple[jax.Array, paged.PagedKVCache]:
    """Paged-cache decode attention for one layer."""
    pos = cache.lengths
    q = apply_rope(q, pos, cos_table, sin_table, style=cfg.rope_style)
    k_new = apply_rope(k_new, pos, cos_table, sin_table, style=cfg.rope_style)
    cache = paged.append_decode_paged(cache, layer, k_new, v_new)
    ks, vs = cache.layer_scales(layer)
    o = paged_flash_decode(
        q,
        cache.k_pages[layer],
        cache.v_pages[layer],
        cache.page_table,
        cache.lengths + 1,
        sm_scale=cfg.sm_scale,
        pages_per_compute_block=cfg.pages_per_compute_block,
        k_scales=ks,
        v_scales=vs,
    )
    return o, cache


def attention_prefill_step(
    cfg: AttentionConfig,
    cache: contiguous.KVCache,
    layer: int,
    q: jax.Array,  # (B, Hq, Sq, D) — pre-RoPE prompt chunk
    k_new: jax.Array,  # (B, Hkv, Sq, D)
    v_new: jax.Array,
    new_lengths: jax.Array,  # (B,) valid tokens in this chunk
    cos_table: jax.Array,
    sin_table: jax.Array,
) -> tuple[jax.Array, contiguous.KVCache]:
    """One layer's prefill: RoPE the chunk at absolute positions, append to
    the cache, causal-attend the chunk against the whole prefix."""
    start = cache.lengths  # (B,)
    sq = q.shape[2]
    pos = start[:, None] + jnp.arange(sq)[None, :]  # (B, Sq)
    # positions broadcast over heads: x is (B, H, Sq, D), positions (B, 1, Sq)
    q = apply_rope(q, pos[:, None, :], cos_table, sin_table, style=cfg.rope_style)
    k_new = apply_rope(k_new, pos[:, None, :], cos_table, sin_table, style=cfg.rope_style)
    cache = contiguous.append_prefill(cache, layer, k_new, v_new)
    k_l, v_l = cache.layer(layer)
    ks, vs = cache.layer_scales(layer)
    if ks is not None:
        # Quantized prefill: attend via dequantized dense view of the prefix.
        # (kernel-fused quantized prefill is a decode-dominant workload's cold
        # path; the hot quantized path is flash_decode/paged_flash_decode.)
        k_l = k_l.astype(jnp.float32) * ks[None, :, None, None]
        v_l = v_l.astype(jnp.float32) * vs[None, :, None, None]
        k_l = k_l.astype(q.dtype)
        v_l = v_l.astype(q.dtype)
    # NB: `start` aliased the pre-donation cache.lengths and is dead after the
    # append; the appended cache's (unchanged) lengths buffer is the live one.
    start = cache.lengths
    o = flash_prefill(
        q,
        k_l,
        v_l,
        lengths=start + new_lengths,
        causal=True,
        q_offsets=start,
        sm_scale=cfg.sm_scale,
    )
    return o, cache


def mha_fwd(
    cfg: AttentionConfig,
    cache: contiguous.KVCache,
    layer: int,
    qkv: jax.Array,  # (B, Hq + 2*Hkv, D) fused projection for ONE new token
    cos_table: jax.Array,
    sin_table: jax.Array,
    q_bias: jax.Array | None = None,
    k_bias: jax.Array | None = None,
    v_bias: jax.Array | None = None,
) -> tuple[jax.Array, contiguous.KVCache]:
    """Reference-API-parity entry point: the analog of
    ``star_flash_attn.mha_fwd_cuda(qkv, q_bias, k_bias, v_bias, k_cache_table,
    v_cache_table, seq_len, o, ...)`` (flash_api.cpp:42-68), including the
    QKV biases the reference accepts but never applies (SURVEY.md §2.9h —
    here they work)."""
    q, k_new, v_new = split_fused_qkv(qkv, cfg)
    if q_bias is not None:
        q = q + q_bias.reshape(cfg.num_q_heads, cfg.head_dim)
    if k_bias is not None:
        k_new = k_new + k_bias.reshape(cfg.num_kv_heads, cfg.head_dim)
    if v_bias is not None:
        v_new = v_new + v_bias.reshape(cfg.num_kv_heads, cfg.head_dim)
    return attention_decode_step(cfg, cache, layer, q, k_new, v_new, cos_table, sin_table)
