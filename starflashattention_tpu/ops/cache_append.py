"""In-place KV-cache row append (Pallas, aliased table, windowed RMW DMA).

The reference appends the current token's K/V to the cache inside its decode
kernel (/root/reference/src/flash_attn.cu:691-701). The XLA-functional
alternatives both move far too many bytes on TPU: a batched scatter copies
the whole table, and slicing one layer out/in (`table[l]` → update →
`dynamic_update_index_in_dim`) moves the full layer per step (~134 MB/layer
at 7B shapes — measured ~40% of the decode step).

Why this shape of kernel: Mosaic cannot DMA a size-1 slice of the tiled
(second-minor) S dim — "Slice shape along dimension 3 must be aligned to
tiling (8)" — and collapsing (S, D) → (S*D,) to make the write a lane slice
is NOT layout-preserving on TPU (the (8, 128) tiling of (S, D) differs from
the lane tiling of (S*D,)), so the reshape physically re-lays the whole
table out and back every call (measured: 5.4 s/call at 7B shapes). Instead
this kernel does a windowed read-modify-write with everything aligned:

  1. DMA the WINDOW-aligned (Hkv, WINDOW, D) slab around each sequence's
     write position HBM→VMEM (WINDOW = 32 rows covers every dtype's sublane
     tiling: 8 for f32, 16 for bf16-packed, 32 for int8/fp8),
  2. blend the new row in with a vector select on the VPU,
  3. DMA the slab back.

``input_output_aliases`` pins the output to the input buffer, so the table
never moves; per step the traffic is B·Hkv·2·WINDOW·D bytes per table
(~1 MB/layer at 7B shapes vs the 134 MB functional update).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Covers the sublane tiling of every cache dtype (f32: 8, bf16: 16 packed,
# int8/fp8: 32) so the window DMA is always tile-aligned.
WINDOW = 32


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rmw_body(
    pos_ref, new_refs, win_refs, sem, *, batch, window, hbm_window
):
    """Shared RMW routine: for each table t and sequence b, read the aligned
    window (``hbm_window(t, b, start)`` names the HBM slab), blend row
    ``pos[b] % window``, write back. All reads are started before any wait;
    all writes started before any wait — the DMAs overlap."""

    n_tables = len(win_refs)

    def win_copy(t, b, direction):
        start = pl.multiple_of((pos_ref[b] // window) * window, window)
        hbm = hbm_window(t, b, start)
        vmem = win_refs[t].at[b]
        if direction == "read":
            return pltpu.make_async_copy(hbm, vmem, sem)
        return pltpu.make_async_copy(vmem, hbm, sem)

    reads = [win_copy(t, b, "read") for t in range(n_tables) for b in range(batch)]
    for c in reads:
        c.start()
    for c in reads:
        c.wait()

    # Blend: per-sequence vector select (SMEM loads are scalar-only, so the
    # row index comes out one scalar at a time; the select itself is VPU).
    for t in range(n_tables):
        for b in range(batch):
            slab = win_refs[t][b]  # (Hkv, W, D)
            sel = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 1) == pos_ref[b] % window
            win_refs[t][b] = jnp.where(sel, new_refs[t][b][:, None, :], slab)

    writes = [win_copy(t, b, "write") for t in range(n_tables) for b in range(batch)]
    for c in writes:
        c.start()
    for c in writes:
        c.wait()


def _append_kernel_kv(
    # scalar prefetch
    layer_ref,  # (1,) int32
    pos_ref,  # (B,) int32 — write position per sequence
    # inputs
    k_new_ref,  # (B, Hkv, D) VMEM
    v_new_ref,  # (B, Hkv, D) VMEM
    k_hbm,  # (L, B, Hkv, S, D) ANY — aliased to output 0
    v_hbm,  # aliased to output 1
    # outputs (aliased)
    k_out,
    v_out,
    # scratch
    k_win,  # (B, Hkv, WINDOW, D) VMEM
    v_win,
    sem,
    *,
    batch: int,
    window: int,
):
    lidx = layer_ref[0]
    outs = (k_out, v_out)

    def hbm_window(t, b, start):
        return outs[t].at[lidx, b, :, pl.ds(start, window), :]

    _rmw_body(
        pos_ref, (k_new_ref, v_new_ref), (k_win, v_win), sem,
        batch=batch, window=window, hbm_window=hbm_window,
    )


def _append_kernel_one(layer_ref, pos_ref, new_ref, t_hbm, t_out, win, sem, *, batch, window):
    lidx = layer_ref[0]

    def hbm_window(t, b, start):
        return t_out.at[lidx, b, :, pl.ds(start, window), :]

    _rmw_body(pos_ref, (new_ref,), (win,), sem,
              batch=batch, window=window, hbm_window=hbm_window)


def _window_for(s: int, dtype=None) -> int:
    """Window rows for the RMW slab: the dtype's sublane tiling (f32: 8,
    bf16: 16, int8/fp8: 32) so the DMA stays tile-aligned while moving the
    fewest bytes — measured (benchmarks/exp_append.py, B=16/Hkv=8): the
    bf16 16-row window runs ~1.7x faster than a fixed 32-row one (the RMW is
    latency-bound; halving slab bytes shortens every burst). Reduced further
    when S is smaller (tiny test caches)."""
    w = WINDOW if dtype is None else max(32 // jnp.dtype(dtype).itemsize, 8)
    while w > 1 and s % w:
        w //= 2
    return w


def _check_lane_dim(d: int, interpret: bool) -> None:
    """Mosaic can only DMA window slices whose last (lane) dim is 128-tile
    aligned; head_dim < 128 compiles on CPU interpret but ICEs on real TPU
    ("Slice shape along dimension 4 must be aligned to tiling (128)").
    Fail fast with an actionable message instead."""
    if not interpret and d % 128:
        raise ValueError(
            f"cache append on TPU requires head_dim to be a multiple of 128 "
            f"(got {d}); pad the head dim or use a CPU/interpret run for "
            f"tiny test geometries"
        )


def append_rows_kv(
    k_table: jax.Array,  # (L, B, Hkv, S, D)
    v_table: jax.Array,
    k_new: jax.Array,  # (B, Hkv, D), same dtype as table
    v_new: jax.Array,
    layer: jax.Array | int,
    pos: jax.Array,  # (B,) int32 — caller clamps to < S
    *,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """``table[layer, b, :, pos[b], :] = new[b]`` for both tables — in place.

    The K and V writes share one kernel so all 4·B window DMAs are in flight
    together. Returns the updated tables; under jit the output buffers ARE
    the input buffers (``input_output_aliases``), so thread the results
    exactly like the functional update they replace.
    """
    l, b, hkv, s, d = k_table.shape
    assert v_table.shape == k_table.shape, (v_table.shape, k_table.shape)
    assert k_new.shape == (b, hkv, d), (k_new.shape, k_table.shape)
    assert k_new.dtype == k_table.dtype, (k_new.dtype, k_table.dtype)
    if interpret is None:
        interpret = _use_interpret()
    _check_lane_dim(d, interpret)
    window = _window_for(s, k_table.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hkv, window, d), k_table.dtype),
            pltpu.VMEM((b, hkv, window, d), v_table.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_append_kernel_kv, batch=b, window=window),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_table.shape, k_table.dtype),
            jax.ShapeDtypeStruct(v_table.shape, v_table.dtype),
        ],
        # operand index counts scalar-prefetch args: (layer, pos, kn, vn, k, v)
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        pos.astype(jnp.int32),
        k_new,
        v_new,
        k_table,
        v_table,
    )


def _append_kernel_paged(
    # scalar prefetch
    layer_ref,  # (1,) int32
    pos_ref,  # (B,) int32 — logical write position per sequence
    page_tbl_ref,  # (B * pages_per_seq,) int32 flattened
    # inputs
    k_new_ref,  # (B, Hkv, D) VMEM
    v_new_ref,
    k_hbm,  # (L, Hkv, P, page_size, D) ANY — aliased to output 0
    v_hbm,
    # outputs (aliased)
    k_out,
    v_out,
    # scratch
    k_win,  # (B, Hkv, WINDOW, D)
    v_win,
    sem,
    *,
    batch: int,
    window: int,
    page_size: int,
    pages_per_seq: int,
):
    lidx = layer_ref[0]
    outs = (k_out, v_out)

    def hbm_window(t, b, start):
        # `start` is the window-aligned LOGICAL position; window | page_size,
        # so the whole window lives inside one physical page.
        phys = page_tbl_ref[b * pages_per_seq + start // page_size]
        # re-annotate: `% page_size` drops the multiple_of fact Mosaic needs
        # to prove the sublane slice is tile-aligned.
        in_page = pl.multiple_of(start % page_size, window)
        return outs[t].at[lidx, :, phys, pl.ds(in_page, window), :]

    _rmw_body(
        pos_ref, (k_new_ref, v_new_ref), (k_win, v_win), sem,
        batch=batch, window=window, hbm_window=hbm_window,
    )


def append_rows_paged_kv(
    k_pages: jax.Array,  # (L, Hkv, P, page_size, D)
    v_pages: jax.Array,
    k_new: jax.Array,  # (B, Hkv, D), same dtype as pool
    v_new: jax.Array,
    layer: jax.Array | int,
    page_table: jax.Array,  # (B, pages_per_seq) int32
    pos: jax.Array,  # (B,) int32 — logical position; its page must be mapped
    *,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """``pool[layer, :, page_table[b, pos[b]//ps], pos[b]%ps, :] = new[b]``
    for both pools — in place (aliased), same windowed-RMW as
    :func:`append_rows_kv` but routed through the page table. The paged analog
    of the reference's in-kernel append (flash_attn.cu:691-701)."""
    l, hkv, p, page_size, d = k_pages.shape
    b = k_new.shape[0]
    assert v_pages.shape == k_pages.shape, (v_pages.shape, k_pages.shape)
    assert k_new.shape == (b, hkv, d), (k_new.shape, k_pages.shape)
    assert k_new.dtype == k_pages.dtype, (k_new.dtype, k_pages.dtype)
    _, pages_per_seq = page_table.shape
    if interpret is None:
        interpret = _use_interpret()
    _check_lane_dim(d, interpret)
    window = _window_for(page_size, k_pages.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hkv, window, d), k_pages.dtype),
            pltpu.VMEM((b, hkv, window, d), v_pages.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _append_kernel_paged,
            batch=b, window=window,
            page_size=page_size, pages_per_seq=pages_per_seq,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ],
        # operand index counts scalar-prefetch args:
        # (layer, pos, page_tbl, kn, vn, k, v)
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        pos.astype(jnp.int32),
        page_table.astype(jnp.int32).reshape(-1),
        k_new,
        v_new,
        k_pages,
        v_pages,
    )


def _append_block_kernel_kv(
    # scalar prefetch
    layer_ref,  # (1,) int32
    pos_ref,  # (B,) int32 — first write position per sequence
    nval_ref,  # (B,) int32 — rows to blend per sequence (0 = no-op row)
    # inputs (pre-shifted to slab-local offsets, see append_block_kv)
    k_new_ref,  # (B, Hkv, SLAB, D) VMEM
    v_new_ref,
    k_hbm,  # (L, B, Hkv, S, D) ANY — aliased to output 0
    v_hbm,
    # outputs (aliased)
    k_out,
    v_out,
    # scratch
    k_win,  # (B, Hkv, SLAB, D) VMEM
    v_win,
    sem,
    *,
    batch: int,
    window: int,
    slab: int,
    s_total: int,
):
    lidx = layer_ref[0]
    outs = (k_out, v_out)
    news = (k_new_ref, v_new_ref)
    wins = (k_win, v_win)

    def slab_start(b):
        return pl.multiple_of(
            jnp.minimum((pos_ref[b] // window) * window, s_total - slab), window
        )

    def win_copy(t, b, direction):
        hbm = outs[t].at[lidx, b, :, pl.ds(slab_start(b), slab), :]
        vmem = wins[t].at[b]
        if direction == "read":
            return pltpu.make_async_copy(hbm, vmem, sem)
        return pltpu.make_async_copy(vmem, hbm, sem)

    reads = [win_copy(t, b, "read") for t in range(2) for b in range(batch)]
    for c in reads:
        c.start()
    for c in reads:
        c.wait()

    for t in range(2):
        for b in range(batch):
            off = pos_ref[b] - slab_start(b)
            slab_v = wins[t][b]  # (Hkv, SLAB, D)
            row = jax.lax.broadcasted_iota(jnp.int32, slab_v.shape, 1)
            sel = jnp.logical_and(row >= off, row < off + nval_ref[b])
            wins[t][b] = jnp.where(sel, news[t][b], slab_v)

    writes = [win_copy(t, b, "write") for t in range(2) for b in range(batch)]
    for c in writes:
        c.start()
    for c in writes:
        c.wait()


def append_block_kv(
    k_table: jax.Array,  # (L, B, Hkv, S, D)
    v_table: jax.Array,
    k_new: jax.Array,  # (B, Hkv, T, D), same dtype as table
    v_new: jax.Array,
    layer: jax.Array | int,
    pos: jax.Array,  # (B,) int32 — first write position; caller clamps pos+T <= S
    n_valid: jax.Array | None = None,  # (B,) rows to write (None = all T)
    *,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """``table[layer, b, :, pos[b]+j, :] = new[b, :, j, :]`` for
    ``j < n_valid[b]`` — in place (aliased), both tables in one kernel.

    The multi-row form of :func:`append_rows_kv` for speculative-decoding
    VERIFY steps (models/llama._verify_core): the T new rows of a sequence
    can straddle one WINDOW boundary, so the RMW slab is 2 windows wide and
    the blend selects ``[off, off + n_valid)`` inside it. Requires
    ``T <= window`` (32 rows on real caches — drafts are ≤ ~16 tokens).
    Traffic: B·Hkv·3·SLAB·D bytes per table per call (~4 MB/layer at 7B
    shapes) vs the ~134 MB/layer functional layer-slice update the prefill
    path uses — the reason verify steps cost ≈ one decode step.
    """
    l, b, hkv, s, d = k_table.shape
    t = k_new.shape[2]
    assert v_table.shape == k_table.shape, (v_table.shape, k_table.shape)
    assert k_new.shape == (b, hkv, t, d), (k_new.shape, k_table.shape)
    assert k_new.dtype == k_table.dtype, (k_new.dtype, k_table.dtype)
    if interpret is None:
        interpret = _use_interpret()
    _check_lane_dim(d, interpret)
    window = _window_for(s, k_table.dtype)
    slab = min(2 * window, s)
    if t > window:
        raise ValueError(
            f"append_block_kv span {t} exceeds the RMW window {window} "
            f"(cache length {s}); use fewer draft tokens or a longer cache"
        )
    pos = pos.astype(jnp.int32)
    if n_valid is None:
        n_valid = jnp.full((b,), t, jnp.int32)
    n_valid = n_valid.astype(jnp.int32)

    # Pre-shift the new rows to their slab-local offset (XLA-side: the
    # per-sequence dynamic_update_slice into a (Hkv, SLAB, D) zero block is
    # tiny). The kernel recomputes the same slab start from `pos`.
    start = jnp.minimum((pos // window) * window, s - slab)
    off = pos - start

    def shift(new_b, off_b):
        z = jnp.zeros((hkv, slab, d), new_b.dtype)
        return jax.lax.dynamic_update_slice(z, new_b, (0, off_b, 0))

    k_shift = jax.vmap(shift)(k_new, off)
    v_shift = jax.vmap(shift)(v_new, off)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hkv, slab, d), k_table.dtype),
            pltpu.VMEM((b, hkv, slab, d), v_table.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _append_block_kernel_kv,
            batch=b, window=window, slab=slab, s_total=s,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_table.shape, k_table.dtype),
            jax.ShapeDtypeStruct(v_table.shape, v_table.dtype),
        ],
        # operand index counts scalar-prefetch args:
        # (layer, pos, nval, kn, vn, k, v)
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        pos,
        n_valid,
        k_shift,
        v_shift,
        k_table,
        v_table,
    )


def append_rows(
    table: jax.Array,  # (L, B, Hkv, S, D)
    new: jax.Array,  # (B, Hkv, D), same dtype as table
    layer: jax.Array | int,
    pos: jax.Array,  # (B,) int32
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Single-table form of :func:`append_rows_kv`."""
    l, b, hkv, s, d = table.shape
    assert new.shape == (b, hkv, d), (new.shape, table.shape)
    assert new.dtype == table.dtype, (new.dtype, table.dtype)
    if interpret is None:
        interpret = _use_interpret()
    _check_lane_dim(d, interpret)
    window = _window_for(s, table.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((b, hkv, window, d), table.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_append_kernel_one, batch=b, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        pos.astype(jnp.int32),
        new,
        table,
    )
