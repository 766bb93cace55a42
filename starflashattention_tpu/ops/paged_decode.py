"""Paged flash-decode Pallas kernel: non-contiguous KV pages, double-buffered DMA.

The serving-path analog of ops/flash_decode.py for a paged pool
(cache/paged.py). Where the contiguous kernel lets the Pallas grid pipeline
stream the cache, pages are scattered in HBM, so this kernel drives its own
DMA: per (batch, kv_block) grid cell it looks up the block's physical page
ids from the scalar-prefetched page table, issues one async copy per
(head, page) into a VMEM double buffer, and prefetches the NEXT block's pages
(possibly of the next batch) while computing the current block's online
softmax. ONE cell covers ALL KV heads — the same collapsed-batch MXU dot as
the contiguous kernel (per-cell overhead, not DMA, dominates small-cell
designs on TPU).

This is the same pipelining idea as the reference's cp.async commit/wait-group
staging (/root/reference/src/flash_attn.cu:4-27, 287-292) — but across whole
KV pages and driven by a page table, with INT8/FP8 payloads upcast in VMEM and
per-head scales folded into the query / output scaling outside the kernel
(BASELINE.json roofline target: quantized pages halve the HBM bytes per
token, which is the decode bottleneck).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


class _PageCopies:
    """One async copy per (head, page) of a KV block → VMEM buffer slot.

    Pages are non-contiguous, so one strided DMA cannot fetch a block;
    issuing all copies concurrently makes latency ≈ the slowest page, not
    the sum (cf. the reference staging one tile per cp.async group).
    """

    def __init__(self, pages_hbm, buf, sem, page_tbl_ref, base, hkv, ppcb, lidx):
        # `base` is a flat scalar offset into the (B * pages_per_seq,) table;
        # scalar SMEM loads at dynamic indices are fine where ref slices
        # would need 128-alignment. `lidx` selects the layer of the stacked
        # (L, Hkv, P, ps, D) table in-kernel — the analog of the contiguous
        # kernel's scalar-prefetched layer id (no per-layer gather copy).
        self._copies = []
        for j in range(ppcb):
            phys = page_tbl_ref[base + j]
            for h in range(hkv):
                self._copies.append(
                    pltpu.make_async_copy(
                        pages_hbm.at[lidx, h, phys],  # (page_size, D)
                        buf.at[h, j],
                        sem,
                    )
                )

    def start(self):
        for c in self._copies:
            c.start()

    def wait(self):
        for c in self._copies:
            c.wait()


def _paged_decode_kernel(
    # scalar prefetch
    lengths_ref,  # (B,) int32
    page_tbl_ref,  # (B * pages_per_seq,) int32 flattened
    layer_ref,  # (1,) int32 — layer of the stacked table
    # inputs
    q_ref,  # (1, Hkv, G, D) VMEM — pre-scaled by sm_scale (and K scale)
    k_pages_hbm,  # (L, Hkv, P, page_size, D) ANY
    v_pages_hbm,
    # outputs
    o_ref,  # (1, Hkv, G, D) f32 — normalized
    # scratch
    buf_i_ref,  # (1,) int32 SMEM — slot of the in-flight current block
    k_buf,  # (2, Hkv, ppcb, page_size, D) VMEM
    v_buf,
    k_sems,  # DMA (2,)
    v_sems,
    m_s,  # (Hkv, G, LANES) f32
    l_s,
    acc_s,  # (Hkv, G, D) f32
    *,
    batch_size: int,
    pages_per_seq: int,
    ppcb: int,
    page_size: int,
    hkv: int,
    window=None,  # static int | None, or traced via _paged_decode_kernel_dyn
    sink_blocks: int = 0,
    sinks: int = 0,
    softcap: float | None = None,
):
    b, i = pl.program_id(0), pl.program_id(1)
    bk = ppcb * page_size
    length = lengths_ref[b]
    # Every sequence executes AT LEAST one (fully masked) block: a zero-length
    # row that skipped _run entirely would break the prefetch chain — its cell
    # would neither wait its own prefetched copies nor prefetch the next
    # sequence's, leaving o_ref unwritten here and the FOLLOWING sequence
    # waiting on semaphores signaled by the wrong pages (silent cross-sequence
    # corruption). The masked block reads the null page and contributes
    # nothing (p is masked to 0 below), yielding a safe zero output.

    def start_blk(ln):
        # Sliding window: the walk starts at the first block intersecting
        # [ln - window, ln) — blocks (and pages) below it are never fetched,
        # which is what lets the engine FREE out-of-window pages (the same
        # bk-granular bound: serving/engine.PagedEngine reclaims page j only
        # once (j+1)·page_size <= (ln - window) // bk * bk; with sinks the
        # engine additionally retains pages below the sink boundary).
        if window is None:
            return 0
        return jnp.maximum(ln - window, 0) // bk

    def walk(ln, step):
        """Physical KV block visited at walk index `step` for a sequence of
        length `ln`: with attention sinks the walk is two segments — sink
        blocks 0..ns-1 first (ns = how many sink blocks the band does NOT
        already cover), then the window band from its first block."""
        first = start_blk(ln)
        if not sink_blocks:
            return first + step, num_blocks_for(ln) - first
        ns = jnp.minimum(sink_blocks, first)
        blk = jnp.where(step < ns, step, first + step - ns)
        return blk, num_blocks_for(ln) - first + ns

    def num_blocks_for(ln):
        return jnp.maximum(pl.cdiv(ln, bk), 1)

    lidx = layer_ref[0]

    def copies(bb, blk, slot):
        base = bb * pages_per_seq + blk * ppcb
        return (
            _PageCopies(k_pages_hbm, k_buf.at[slot], k_sems.at[slot], page_tbl_ref, base, hkv, ppcb, lidx),
            _PageCopies(v_pages_hbm, v_buf.at[slot], v_sems.at[slot], page_tbl_ref, base, hkv, ppcb, lidx),
        )

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _first():
        buf_i_ref[0] = 0
        ck, cv = copies(0, walk(lengths_ref[0], 0)[0], 0)
        ck.start()
        cv.start()

    blk, walk_len = walk(length, i)  # physical KV block this cell covers

    @pl.when(i < walk_len)
    def _run():
        slot = buf_i_ref[0]

        # Prefetch the next valid cell's pages into the other slot (the
        # next sequence starts at ITS OWN walk start — sink block 0 if it
        # has out-of-band sinks, else its first in-band block).
        next_in_seq = i + 1 < walk_len
        nb = jnp.where(next_in_seq, b, b + 1)
        has_next = nb < batch_size
        nb_c = jnp.minimum(nb, batch_size - 1)  # safe lengths_ref index
        ni = jnp.where(
            next_in_seq, walk(length, i + 1)[0], walk(lengths_ref[nb_c], 0)[0]
        )

        @pl.when(has_next)
        def _prefetch():
            ck, cv = copies(nb_c, ni, 1 - slot)
            ck.start()
            cv.start()
            buf_i_ref[0] = 1 - slot

        ck, cv = copies(b, blk, slot)  # reconstruct to wait on the semaphores
        ck.wait()

        @pl.when(i == 0)
        def _init():
            m_s[...] = jnp.full_like(m_s, NEG_INF)
            l_s[...] = jnp.zeros_like(l_s)
            acc_s[...] = jnp.zeros_like(acc_s)

        q = q_ref[0]  # (Hkv, G, D)
        k = k_buf[slot].reshape(hkv, bk, -1)  # (Hkv, bk, D)
        if k.dtype != q.dtype:
            k = k.astype(q.dtype)

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (Hkv, G, bk)
        if softcap is not None:
            # Gemma-2 softcapping on the scaled scores (q pre-folds sm_scale)
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        kv_pos = blk * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        valid = kv_pos < length
        if window is not None:
            # Mistral-style band: the query at position length - 1 attends
            # KV positions [length - window, length) — plus the first
            # `sinks` positions when attention sinks are on
            in_band = kv_pos >= length - window
            if sinks:
                in_band = jnp.logical_or(in_band, kv_pos < sinks)
            valid = jnp.logical_and(valid, in_band)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_s[...]
        m_curr = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[..., :1])
        # Explicit mask: in a FULLY masked block (zero-length row) m_next
        # stays NEG_INF, so exp(s - m_next) = exp(0) = 1 for every masked
        # entry — without this, l would count bk phantom keys of the null
        # page. With length > 0, masked entries already underflow to 0 and
        # this is a no-op.
        p = jnp.where(valid, p, 0.0)
        l_s[...] = alpha * l_s[...] + jnp.sum(p, axis=2, keepdims=True)
        m_s[...] = m_next

        cv.wait()
        v = v_buf[slot].reshape(hkv, bk, -1)
        if v.dtype != q.dtype:
            v = v.astype(q.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_s[...] = acc_s[...] * alpha[..., :1] + pv

        # Normalized output each valid block; the last valid write wins and
        # the block stays resident in VMEM until b changes.
        l = l_s[..., :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_s[...] / l_safe).astype(o_ref.dtype)


def _paged_decode_kernel_dyn(
    lengths_ref, page_tbl_ref, layer_ref, window_ref, *rest, **kw,
):
    """Dynamic-window twin: window rides as a 4th scalar-prefetch operand
    (Gemma-2 alternating sliding/full layers under one scan — see
    flash_decode._decode_kernel_fused_dyn)."""
    _paged_decode_kernel(
        lengths_ref, page_tbl_ref, layer_ref, *rest,
        window=window_ref[0], **kw,
    )


def paged_flash_decode(
    q: jax.Array,  # (B, Hq, D)
    k_pages: jax.Array,  # (Hkv, P, page_size, D) or (L, Hkv, P, ps, D) + layer
    v_pages: jax.Array,
    page_table: jax.Array,  # (B, pages_per_seq) int32
    lengths: jax.Array,  # (B,) int32
    *,
    layer: jax.Array | int | None = None,
    sm_scale: float | None = None,
    pages_per_compute_block: int = 4,
    k_scales: jax.Array | None = None,  # (Hkv,) f32
    v_scales: jax.Array | None = None,
    interpret: bool | None = None,
    max_len_hint: int | None = None,
    window=None,  # int (static) or traced scalar (Gemma-2 per-layer windows)
    sinks: int = 0,
    softcap: float | None = None,
) -> jax.Array:
    """Paged decode attention → (B, Hq, D).

    ``sinks`` (static, with ``window``): StreamingLLM attention sinks — the
    first ``sinks`` positions stay attendable outside the window; the page
    walk gains up to ``ceil(sinks/block)`` prepended steps and the engine
    keeps sink pages out of rolling-buffer reclamation.

    ``max_len_hint`` (static): caller-guaranteed bound on ``lengths`` —
    shrinks the page-walk grid to ``ceil(ceil(hint/page_size)/ppcb)`` steps
    instead of walking every allocatable page slot (the serving engine
    derives it from host-known slot lengths; see ops/flash_decode).

    ``window`` (static): Mistral-style sliding-window attention — each
    sequence's page walk starts at its first in-band block (max(len - window,
    0) // (ppcb·page_size)), so out-of-window pages are never DMA'd and the
    grid needs only ceil(window / block) + 1 steps per sequence. The engine
    additionally FREES pages that fall fully below every future walk
    (rolling-buffer KV: pool usage per sequence is O(window), not O(len)).

    Stacked-layer mode: pass the whole (L, Hkv, P, ps, D) page pool plus a
    (traced) ``layer`` index; the DMA source is selected in-kernel — REQUIRED
    under scan-over-layers (an XLA dynamic-slice feeding a Pallas operand
    would copy the entire layer's pages per step; same rationale as
    ops/flash_decode's in-kernel cache-table indexing)."""
    b, hq, d = q.shape
    if k_pages.ndim == 4:
        k_pages = k_pages[None]
        v_pages = v_pages[None]
        layer = 0
    assert layer is not None, "layer index required for a stacked (L, ...) page pool"
    _, hkv, num_pages, page_size, _ = k_pages.shape
    assert hq % hkv == 0
    g = hq // hkv
    _, pages_per_seq = page_table.shape
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    if interpret is None:
        interpret = _use_interpret()
    quantized = k_pages.dtype in (jnp.int8, jnp.float8_e4m3fn)
    if quantized:
        assert k_scales is not None and v_scales is not None

    ppcb = min(pages_per_compute_block, pages_per_seq)
    while pages_per_seq % ppcb != 0:
        ppcb -= 1
    max_blocks = pages_per_seq // ppcb
    if max_len_hint is not None:
        hint_pages = -(-min(max_len_hint, pages_per_seq * page_size) // page_size)
        max_blocks = max(min(max_blocks, -(-hint_pages // ppcb)), 1)
    if sinks and window is None:
        raise ValueError("attention sinks require a sliding window")
    dyn_window = isinstance(window, jax.Array)
    if dyn_window and sinks:
        raise ValueError("attention sinks need a STATIC window")
    sink_blocks = 0
    if window is not None and not dyn_window:
        # shifted walk visits at most ceil(window/bk) + 1 blocks per
        # sequence, plus the prepended sink blocks (a DYNAMIC window cannot
        # shrink the static grid — blocks past the band dedupe/skip)
        bk = ppcb * page_size
        sink_blocks = -(-sinks // bk) if sinks else 0
        max_blocks = max(
            min(max_blocks, -(-window // bk) + 1 + sink_blocks), 1
        )

    # Fold sm_scale (and K dequant scale) into q; V scale into the output.
    q4 = q.reshape(b, hkv, g, d)
    scale = jnp.asarray(sm_scale, jnp.float32)
    if quantized:
        scale = scale * k_scales.astype(jnp.float32)[None, :, None, None]
    q4 = (q4.astype(jnp.float32) * scale).astype(q.dtype)

    kernel = functools.partial(
        _paged_decode_kernel_dyn if dyn_window else _paged_decode_kernel,
        batch_size=b,
        pages_per_seq=pages_per_seq,
        ppcb=ppcb,
        page_size=page_size,
        hkv=hkv,
        sink_blocks=sink_blocks,
        sinks=sinks,
        softcap=softcap,
        **({} if dyn_window else {"window": window}),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4 if dyn_window else 3,
        grid=(b, max_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, hkv, g, d), lambda bi, ii, *_: (bi, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, hkv, g, d), lambda bi, ii, *_: (bi, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((2, hkv, ppcb, page_size, d), k_pages.dtype),
            pltpu.VMEM((2, hkv, ppcb, page_size, d), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((hkv, g, LANES), jnp.float32),
            pltpu.VMEM((hkv, g, LANES), jnp.float32),
            pltpu.VMEM((hkv, g, d), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        page_table.astype(jnp.int32).reshape(-1),
        jnp.asarray(layer, jnp.int32).reshape(1),
        *([window.astype(jnp.int32).reshape(1)] if dyn_window else []),
        q4,
        k_pages,
        v_pages,
    )
    if quantized:
        out = out * v_scales.astype(jnp.float32)[None, :, None, None]
    return out.reshape(b, hq, d).astype(q.dtype)
