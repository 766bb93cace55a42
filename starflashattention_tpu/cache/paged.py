"""Paged KV-cache pool: physical pages + per-sequence page tables.

New capability over the reference (whose cache is a dense caller-owned table,
/root/reference/src/params.h:22-25); mandated by BASELINE.json ("INT8-quantized
paged KV-cache with per-head scales"). Pages are the unit of HBM allocation so
continuous batching can admit/evict sequences without moving data.

Layout: ``k_pages``/``v_pages`` are (L, Hkv, num_pages, page_size, D) — layer
and head major so one (head, page) DMA is a contiguous (page_size, D) tile.
``page_table`` is (B, pages_per_seq) int32 of physical page ids. The
:class:`PageAllocator` is host-side bookkeeping (free-list) — the device never
sees it, only the page_table arrays it produces. Its hot path is backed by the
C++ native allocator when built (native/; falls back to pure Python).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.core import quant


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Paged multi-layer KV cache (device state)."""

    k_pages: jax.Array  # (L, Hkv, P, page_size, D)
    v_pages: jax.Array
    page_table: jax.Array  # (B, pages_per_seq) int32
    lengths: jax.Array  # (B,) int32
    k_scales: jax.Array | None = None  # (L, Hkv) f32
    v_scales: jax.Array | None = None

    @property
    def num_layers(self) -> int:
        return self.k_pages.shape[0]

    @property
    def num_kv_heads(self) -> int:
        return self.k_pages.shape[1]

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[2]

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def head_dim(self) -> int:
        return self.k_pages.shape[4]

    @property
    def batch_size(self) -> int:
        return self.page_table.shape[0]

    @property
    def pages_per_seq(self) -> int:
        return self.page_table.shape[1]

    @property
    def quant_mode(self) -> str:
        if self.k_pages.dtype == jnp.int8:
            return "int8"
        if self.k_pages.dtype == jnp.float8_e4m3fn:
            return "fp8"
        return "none"

    def layer_scales(self, idx: int):
        if self.k_scales is None:
            return None, None
        return self.k_scales[idx], self.v_scales[idx]


def init_paged_cache(
    num_layers: int,
    batch_size: int,
    num_kv_heads: int,
    head_dim: int,
    *,
    num_pages: int,
    page_size: int = 128,
    pages_per_seq: int,
    dtype=jnp.bfloat16,
    quant_mode: quant.QuantMode = "none",
    calibration_scale: float = 1.0,
) -> PagedKVCache:
    if quant_mode == "none":
        qdtype, k_scales, v_scales = dtype, None, None
    else:
        qdtype = jnp.int8 if quant_mode == "int8" else jnp.float8_e4m3fn
        qmax = quant.INT8_MAX if quant_mode == "int8" else quant.FP8_MAX
        # Distinct arrays: k/v scale buffers are donated independently.
        k_scales = jnp.full((num_layers, num_kv_heads), calibration_scale / qmax, jnp.float32)
        v_scales = jnp.full((num_layers, num_kv_heads), calibration_scale / qmax, jnp.float32)
    shape = (num_layers, num_kv_heads, num_pages, page_size, head_dim)
    return PagedKVCache(
        k_pages=jnp.zeros(shape, qdtype),
        v_pages=jnp.zeros(shape, qdtype),
        page_table=jnp.zeros((batch_size, pages_per_seq), jnp.int32),
        lengths=jnp.zeros((batch_size,), jnp.int32),
        k_scales=k_scales,
        v_scales=v_scales,
    )


class PageAllocator:
    """Host-side free-list allocator for physical pages.

    Page 0 is reserved as the null page (fresh page-table rows point at it),
    so the kernels can DMA page-table entries of not-yet-allocated logical
    pages without reading out of bounds.
    """

    NULL_PAGE = 0

    def __init__(self, num_pages: int):
        if num_pages < 2:
            raise ValueError("need at least 2 pages (page 0 is reserved)")
        self.num_pages = num_pages
        self._free: list[int] = list(range(num_pages - 1, 0, -1))  # stack, excludes 0

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> list[int]:
        if n > len(self._free):
            raise MemoryError(f"paged KV pool exhausted: want {n}, free {len(self._free)}")
        out = [self._free.pop() for _ in range(n)]
        return out

    def free(self, pages) -> None:
        for p in pages:
            if p != self.NULL_PAGE:
                self._free.append(int(p))

    def pages_needed(self, length: int, page_size: int) -> int:
        return -(-length // page_size)


class SeqPagePool:
    """Per-sequence page allocator: the pure-Python twin of
    ``utils.native.NativePagePool`` (same handle API), built on
    :class:`PageAllocator`. The serving engine takes either interchangeably —
    the native one when the C++ core is built, this otherwise."""

    def __init__(self, num_pages: int):
        self._alloc = PageAllocator(num_pages)
        self.num_pages = num_pages
        self._seqs: dict[int, list[int]] = {}
        self._next = 1

    @property
    def free_pages(self) -> int:
        return self._alloc.free_pages

    def seq_new(self) -> int:
        h = self._next
        self._next += 1
        self._seqs[h] = []
        return h

    def seq_extend(self, handle: int, new_len: int, page_size: int) -> int:
        pages = self._seqs[handle]
        need = self._alloc.pages_needed(new_len, page_size)
        if need > len(pages):
            pages.extend(self._alloc.alloc(need - len(pages)))
        return len(pages)

    def seq_pages(self, handle: int) -> list[int]:
        return list(self._seqs[handle])

    def seq_free(self, handle: int) -> None:
        self._alloc.free(self._seqs.pop(handle))

    def seq_release_prefix(self, handle: int, n: int) -> list[int]:
        """Detach the handle's first ``n`` pages WITHOUT freeing them —
        ownership transfers to the caller (serving/prefix_cache.py moves
        full prompt pages into the content-addressed prefix store). The
        handle keeps only its remaining tail pages."""
        pages = self._seqs[handle]
        if n > len(pages):
            raise ValueError(f"handle owns {len(pages)} pages, cannot release {n}")
        head, self._seqs[handle] = pages[:n], pages[n:]
        return head

    def free_raw(self, pages) -> None:
        """Return loose pages (detached via seq_release_prefix, later evicted
        from the prefix store) straight to the allocator."""
        self._alloc.free(pages)


def _quantize_new(x: jax.Array, scales: jax.Array | None, dtype) -> jax.Array:
    if scales is None:
        return x.astype(dtype)
    mode = "int8" if dtype == jnp.int8 else "fp8"
    return quant.quantize_value(x, scales, mode, head_axis=1)


def append_decode_paged(
    cache: PagedKVCache,
    layer: int,
    k_new: jax.Array,  # (B, Hkv, D)
    v_new: jax.Array,
) -> PagedKVCache:
    """Scatter one new token per sequence into its current page slot."""
    ks, vs = cache.layer_scales(layer)
    k_new = _quantize_new(k_new, ks, cache.k_pages.dtype)
    v_new = _quantize_new(v_new, vs, cache.v_pages.dtype)

    pos = cache.lengths  # (B,)
    ps = cache.page_size
    logical = pos // ps
    slot = pos % ps
    b_idx = jnp.arange(cache.batch_size)
    phys = cache.page_table[b_idx, logical]  # (B,)

    # NB advanced-indexing placement: the integer `layer` index plus the head
    # slice separate the (phys, slot) index arrays, so the broadcast (B,) dims
    # move to the FRONT — the update value layout is (B, Hkv, D).
    k_pages = cache.k_pages.at[layer, :, phys, slot, :].set(k_new)
    v_pages = cache.v_pages.at[layer, :, phys, slot, :].set(v_new)
    return dataclasses.replace(cache, k_pages=k_pages, v_pages=v_pages)


def scatter_prefill_chunk(
    pages: jax.Array,  # (L, Hkv, P, page_size, D) pool (one table)
    layer: jax.Array | int,
    vals: jax.Array,  # (B, Hkv, Sq, D) chunk, ALREADY in the pool dtype
    page_table: jax.Array,  # (B, pages_per_seq) int32
    start: jax.Array,  # (B,) write offset per sequence
    new_lengths: jax.Array,  # (B,) tokens valid in this chunk per sequence
) -> jax.Array:
    """Array-level prompt-chunk scatter (positions start..start+new_lengths).

    Rows with ``new_lengths == 0`` write nothing — the serving engine's
    inactive slots. Usable inside scan-over-layers with a traced ``layer``.
    """
    l, hkv, num_pages, ps, d = pages.shape
    b, _, sq, _ = vals.shape
    _, pages_per_seq = page_table.shape
    tok = jnp.arange(sq)[None, :]  # (1, Sq)
    pos = start[:, None] + tok  # (B, Sq)
    valid = tok < new_lengths[:, None]
    logical = pos // ps
    b_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, sq))
    phys = page_table[b_idx, jnp.minimum(logical, pages_per_seq - 1)]
    slot = pos % ps
    # Out-of-range tokens → out-of-bounds page id, dropped by scatter mode.
    phys = jnp.where(valid, phys, num_pages)

    phys_f = phys.reshape(-1)  # (B*Sq,)
    slot_f = slot.reshape(-1)
    # NB advanced-indexing placement (same rule as append_decode_paged):
    # value layout (B*Sq, Hkv, D).
    flat = vals.transpose(0, 2, 1, 3).reshape(b * sq, hkv, d)
    return pages.at[layer, :, phys_f, slot_f, :].set(flat, mode="drop")


def gather_prefix(
    pages: jax.Array,  # (L, Hkv, P, page_size, D) pool (one table)
    layer: jax.Array | int,
    page_table: jax.Array,  # (B, pages_per_seq) int32
    prefix_len: int,  # STATIC — tokens of already-pooled prefix to read
) -> jax.Array:
    """Gather each sequence's first ``prefix_len`` pooled tokens back into a
    contiguous (B, Hkv, prefix_len, D) buffer (chunked prefill: continuation
    chunks attend prefix + chunk; the prefix lives only in the pool).
    ``prefix_len`` is static — the serving engine's chunk loop advances all
    active rows in lockstep, so chunk index i needs exactly i·chunk tokens.
    Usable inside scan-over-layers with a traced ``layer``."""
    l, hkv, num_pages, ps, d = pages.shape
    b, pages_per_seq = page_table.shape
    n_pages = -(-prefix_len // ps)
    ids = page_table[:, :n_pages]  # (B, n)
    lp = jax.lax.dynamic_index_in_dim(pages, layer, 0, keepdims=False)
    g = jnp.take(lp, ids.reshape(-1), axis=1)  # (Hkv, B*n, ps, D)
    g = g.reshape(hkv, b, n_pages * ps, d).transpose(1, 0, 2, 3)
    return g[:, :, :prefix_len]


def append_prefill_paged(
    cache: PagedKVCache,
    layer: int,
    k_new: jax.Array,  # (B, Hkv, Sq, D) prompt chunk
    v_new: jax.Array,
    start: jax.Array,  # (B,) write offset per sequence
    new_lengths: jax.Array,  # (B,) tokens valid in this chunk per sequence
) -> PagedKVCache:
    """Scatter a prompt chunk across pages (positions start..start+new_lengths)."""
    ks, vs = cache.layer_scales(layer)
    k_new = _quantize_new(k_new, ks, cache.k_pages.dtype)
    v_new = _quantize_new(v_new, vs, cache.v_pages.dtype)
    k_pages = scatter_prefill_chunk(
        cache.k_pages, layer, k_new, cache.page_table, start, new_lengths
    )
    v_pages = scatter_prefill_chunk(
        cache.v_pages, layer, v_new, cache.page_table, start, new_lengths
    )
    return dataclasses.replace(cache, k_pages=k_pages, v_pages=v_pages)


def gather_layer(cache: PagedKVCache, layer: int) -> tuple[jax.Array, jax.Array]:
    """Materialize a dense (B, Hkv, S, D) view of one layer — TEST/REFERENCE
    ONLY (the kernels never do this; they DMA pages directly)."""
    ps = cache.page_size
    # (B, pages_per_seq) → gather (B, Hkv, pages_per_seq, ps, D)
    k = cache.k_pages[layer][:, cache.page_table]  # (Hkv, B, pp, ps, D)
    v = cache.v_pages[layer][:, cache.page_table]
    b = cache.batch_size
    s = cache.pages_per_seq * ps
    k = k.transpose(1, 0, 2, 3, 4).reshape(b, cache.num_kv_heads, s, cache.head_dim)
    v = v.transpose(1, 0, 2, 3, 4).reshape(b, cache.num_kv_heads, s, cache.head_dim)
    return k, v
