"""Contiguous multi-layer KV-cache tables.

TPU-native analog of the reference's per-layer cache tables
(/root/reference/src/params.h:22-25: ``k_cache_table/v_cache_table`` indexed by
``idx_layer``; appended in-kernel at flash_attn.cu:691-701). Layers stack into
one leading axis so a whole model's cache is a single donate-able buffer pair;
the append is a functional ``dynamic_update_slice`` that XLA turns into an
in-place write when the buffer is donated to the jitted step.

Quantized caches store int8 / fp8 payloads with per-(layer, kv_head) fp32
scales fixed at allocation (calibration) time, so appended tokens quantize
against existing scales without a rescan (core/quant.py:quantize_value).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from starflashattention_tpu.core import quant


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Multi-layer contiguous KV cache.

    ``k``/``v``: (L, B, Hkv, S, D) — bf16/fp32, or int8/float8_e4m3fn when
    quantized. ``lengths``: (B,) int32 — valid positions per sequence (shared
    by all layers). ``k_scales``/``v_scales``: (L, Hkv) fp32 or None.
    """

    k: jax.Array
    v: jax.Array
    lengths: jax.Array
    k_scales: jax.Array | None = None
    v_scales: jax.Array | None = None

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]

    @property
    def num_kv_heads(self) -> int:
        return self.k.shape[2]

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[3]

    @property
    def head_dim(self) -> int:
        return self.k.shape[4]

    @property
    def quant_mode(self) -> str:
        if self.k.dtype == jnp.int8:
            return "int8"
        if self.k.dtype == jnp.float8_e4m3fn:
            return "fp8"
        return "none"

    def layer(self, idx: int) -> tuple[jax.Array, jax.Array]:
        """(k, v) tables for one layer — the analog of indexing the
        reference's cache table by ``idx_layer`` (flash_attn.cu:617-621)."""
        return self.k[idx], self.v[idx]

    def layer_scales(self, idx: int) -> tuple[jax.Array | None, jax.Array | None]:
        if self.k_scales is None:
            return None, None
        return self.k_scales[idx], self.v_scales[idx]


def init_cache(
    num_layers: int,
    batch_size: int,
    num_kv_heads: int,
    max_seq_len: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    quant_mode: quant.QuantMode = "none",
    calibration_scale: float = 1.0,
) -> KVCache:
    """Allocate an empty cache. For quantized modes the per-head scales are
    initialized to ``calibration_scale / qmax`` (absmax calibration can
    overwrite them before serving)."""
    if quant_mode == "none":
        shape = (num_layers, batch_size, num_kv_heads, max_seq_len, head_dim)
        return KVCache(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            lengths=jnp.zeros((batch_size,), jnp.int32),
        )
    qdtype = jnp.int8 if quant_mode == "int8" else jnp.float8_e4m3fn
    qmax = quant.INT8_MAX if quant_mode == "int8" else quant.FP8_MAX
    shape = (num_layers, batch_size, num_kv_heads, max_seq_len, head_dim)
    # Distinct arrays: k/v scale buffers are donated independently.
    return KVCache(
        k=jnp.zeros(shape, qdtype),
        v=jnp.zeros(shape, qdtype),
        lengths=jnp.zeros((batch_size,), jnp.int32),
        k_scales=jnp.full((num_layers, num_kv_heads), calibration_scale / qmax, jnp.float32),
        v_scales=jnp.full((num_layers, num_kv_heads), calibration_scale / qmax, jnp.float32),
    )


def _quantize_new(x: jax.Array, scales: jax.Array | None, dtype) -> jax.Array:
    """Quantize new K/V rows against the cache's fixed per-head scales."""
    if scales is None:
        return x.astype(dtype)
    mode = "int8" if dtype == jnp.int8 else "fp8"
    return quant.quantize_value(x, scales, mode, head_axis=1)


def append_decode(
    cache: KVCache,
    layer,
    k_new: jax.Array,  # (B, Hkv, D) — one token per sequence
    v_new: jax.Array,
) -> KVCache:
    """Write the current token's K/V at each sequence's ``lengths[b]`` slot.

    Functional analog of the reference's fused in-kernel append
    (flash_attn.cu:691-701); donate the cache at the enclosing jitted step and
    XLA updates it in place. ``layer`` may be a traced index (lax.scan over
    layers in models/llama.py). ``lengths`` is NOT advanced — call
    :func:`advance` once per step after all layers have appended (the
    reference likewise appends per layer while the caller owns seq_len).
    """
    ks, vs = cache.layer_scales(layer)
    k_new = _quantize_new(k_new, ks, cache.k.dtype)
    v_new = _quantize_new(v_new, vs, cache.v.dtype)

    # Batched dynamic_update_slice (NOT a scatter — XLA copies the whole
    # table for batched scatters on TPU; dus aliases the donated buffer).
    def upd(table_b, new_b, pos):
        return jax.lax.dynamic_update_slice(table_b, new_b[:, None, :], (0, pos, 0))

    k_l = jax.vmap(upd)(cache.k[layer], k_new, cache.lengths)
    v_l = jax.vmap(upd)(cache.v[layer], v_new, cache.lengths)
    return dataclasses.replace(
        cache,
        k=cache.k.at[layer].set(k_l),
        v=cache.v.at[layer].set(v_l),
    )


def append_prefill(
    cache: KVCache,
    layer,
    k_new: jax.Array,  # (B, Hkv, Sq, D) — prompt chunk
    v_new: jax.Array,
    active: jax.Array | None = None,  # (B,) bool — rows to actually write
) -> KVCache:
    """Write a whole prompt chunk starting at each sequence's ``lengths[b]``
    (chunked prefill / prompt ingestion — capability the decode-only
    reference lacks). The offset is read from the donated cache itself so no
    aliased buffer crosses the jit boundary.

    ``active=False`` rows self-write their existing window (a no-op), so the
    serving engine can prefill newly-admitted slots while other slots' cache
    state stays untouched — all under one static-shape program.
    """
    start = cache.lengths
    ks, vs = cache.layer_scales(layer)
    k_new = _quantize_new(k_new, ks, cache.k.dtype)
    v_new = _quantize_new(v_new, vs, cache.v.dtype)
    sq = k_new.shape[2]
    if active is None:
        active = jnp.ones((k_new.shape[0],), bool)

    def upd(table_b, new_b, pos, act):
        window = jax.lax.dynamic_slice(
            table_b, (0, pos, 0), (table_b.shape[0], sq, table_b.shape[2])
        )
        return jax.lax.dynamic_update_slice(
            table_b, jnp.where(act, new_b, window), (0, pos, 0)
        )

    k_l = jax.vmap(upd)(cache.k[layer], k_new, start, active)
    v_l = jax.vmap(upd)(cache.v[layer], v_new, start, active)
    return dataclasses.replace(
        cache,
        k=cache.k.at[layer].set(k_l),
        v=cache.v.at[layer].set(v_l),
    )


def advance(cache: KVCache, steps: jax.Array | int = 1) -> KVCache:
    """Advance ``lengths`` after a full model step (all layers appended)."""
    return dataclasses.replace(cache, lengths=cache.lengths + steps)
