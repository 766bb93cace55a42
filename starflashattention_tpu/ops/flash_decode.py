"""Split-KV flash-decode Pallas kernel (contiguous KV cache).

TPU-native redesign of the reference's decode path
(/root/reference/src/flash_attn.cu:554-935): one query token per sequence
attends to its KV cache with an online softmax, the KV sequence split across
parallel grid cells ("flash-decoding", grid dim y = num_splits at
flash_attn.cu:953), and the per-split partials merged by log-sum-exp
rescaling (the mathematically-correct form of flash_combine_kernel,
flash_attn.cu:877-935 — see SURVEY.md §2.9d for why the reference's own
normalization is not reproduced).

Differences from the CUDA design, by construction of the hardware:

* The CUDA kernel hand-stages K/V tiles HBM→smem with ``cp.async`` and
  reduces with warp shuffles (flash_attn.cu:261-447). Here the Pallas grid
  pipeline double-buffers the HBM→VMEM stream automatically, and the
  reductions are lane-dimension ``jnp.max/sum`` on the VPU.
* ONE grid cell handles ALL KV heads of a (batch, split, kv_block): the CUDA
  grid's per-(head) GEMVs (1 warp each) become batched MXU dots over
  (Hkv, G, D)·(Hkv, Bk, D) — big DMAs and few cells, because on TPU the
  per-cell overhead and small-tile waste dominate tiny-block designs.
* The multi-layer cache table is indexed INSIDE the kernel via a
  scalar-prefetched layer id feeding the BlockSpec index maps (the analog of
  the reference's ``idx_layer`` lookup, flash_attn.cu:617-621) — no
  per-layer gather copy ever exists. The same index maps clamp the KV block
  to each sequence's valid range, so blocks past ``lengths`` are never
  fetched (the pipeline dedupes the repeated index).
* INT8 / FP8 KV dequant is fused: quantized tiles upcast in VMEM registers;
  the per-head K scale folds into the query (with sm_scale) and the V scale
  into the partial outputs — no fp cache copy in HBM (BASELINE.json).
* The decode and combine passes live in ONE jitted program with no host
  round-trip (the reference needs a full cudaDeviceSynchronize between its
  two launches, flash_attn.cu:986).
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


def _attend_block(
    lengths_ref, q_ref, k_ref, v_ref, m_s, l_s, acc_s,
    *, group, block_start, lens, nb, qspan=1, window=None, sinks=0, scale=None,
    softcap=None,
):
    """One KV block's online-softmax update into the (m, l, acc) scratch.

    ``qspan > 1`` is the VERIFY mode (speculative decoding): the row dim of
    ``q`` is (G, qspan) flattened and row (g, j) is the query at absolute
    position ``lengths[b] - 1 + j`` — each successive draft token may attend
    one more KV row than the previous (a staircase causal mask, evaluated as
    ``kv_pos < length + j`` with the same vector compare the ragged mask
    already does).

    ``scale`` (static float) multiplies the scores in-kernel — the
    non-quantized path uses it instead of pre-scaling q, removing one XLA
    dispatch per call (material at short context where the whole kernel is
    ~6 us; the quantized path still folds per-head K scales into q
    outside)."""
    q = q_ref[...]  # (NB, Hkv, G, D)
    k = k_ref[0]  # (NB, Hkv, Bk, D)
    v = v_ref[0]
    # Quantized tiles upcast in VMEM registers (never materialized in HBM).
    if k.dtype != q.dtype:
        k = k.astype(q.dtype)
    if v.dtype != q.dtype:
        v = v.astype(q.dtype)

    # Mosaic's matmul takes at most ONE batch dim — collapse (NB, Hkv)
    # around the dots. Leading-dim reshapes keep the (sublane, lane)
    # layout, so these are free.
    hkv, g, d = q.shape[1], q.shape[2], q.shape[3]
    bk = k.shape[2]
    s = jax.lax.dot_general(
        q.reshape(nb * hkv, g, d),
        k.reshape(nb * hkv, bk, d),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(nb, hkv, g, bk)  # (NB, Hkv, G, Bk)
    if scale is not None:
        s = s * scale
    if softcap is not None:
        # Gemma-2 attention logit softcapping: cap*tanh(s/cap) on the SCALED
        # scores, before masking (HF order). The quantized path pre-folds
        # sm_scale into q, so s is in scaled units on every path here.
        s = softcap * jnp.tanh(s * (1.0 / softcap))

    kv_pos = block_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
    # Broadcast each sequence's scalar length over its batch slice with
    # unrolled selects (Mosaic cannot shape-cast a 1-D vector to 4-D).
    seq_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    len_b = jnp.full(s.shape, lens[0], jnp.int32)
    for j in range(1, nb):
        len_b = jnp.where(seq_idx == j, lens[j], len_b)
    if qspan > 1:
        # staircase mask: query row (g, j) sees j extra KV rows
        row_off = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 2), qspan
        )
        len_b = len_b + row_off
    valid = kv_pos < len_b
    if window is not None:
        # sliding window (Mistral-style): the query at position len_b - 1
        # attends KV positions [len_b - window, len_b); with attention
        # sinks (StreamingLLM), the first `sinks` positions stay attendable
        in_band = kv_pos >= len_b - window
        if sinks:
            in_band = jnp.logical_or(in_band, kv_pos < sinks)
        valid = jnp.logical_and(valid, in_band)
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_s[...]  # (NB, Hkv, G, LANES), lanes equal
    m_curr = jnp.max(s, axis=3, keepdims=True)  # (NB, Hkv, G, 1)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[..., :1])  # (NB, Hkv, G, Bk)
    l_s[...] = alpha * l_s[...] + jnp.sum(p, axis=3, keepdims=True)
    m_s[...] = m_next

    pv = jax.lax.dot_general(
        p.astype(v.dtype).reshape(nb * hkv, g, bk),
        v.reshape(nb * hkv, bk, d),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(nb, hkv, g, d)  # (NB, Hkv, G, D)
    acc_s[...] = acc_s[...] * alpha[..., :1] + pv


def _decode_kernel(
    # scalar-prefetch operands (PrefetchScalarGridSpec: also fed to index maps)
    lengths_ref,  # (B,) int32 — valid KV length per sequence
    layer_ref,  # (1,) int32 — which layer of the (L, ...) cache table
    # tensor operands
    q_ref,  # (NB, Hkv, G, D) — pre-scaled by sm_scale (and K scale if quant)
    k_ref,  # (1, NB, Hkv, Bk, D) — layer-selected KV block, all heads
    v_ref,  # (1, NB, Hkv, Bk, D)
    # outputs
    o_ref,  # (NB, 1, Hkv, G, D) f32 — UNNORMALIZED partial output
    m_ref,  # (NB, 1, Hkv, G, LANES) f32
    l_ref,  # (NB, 1, Hkv, G, LANES) f32
    # scratch
    m_s,  # (NB, Hkv, G, LANES) f32
    l_s,  # (NB, Hkv, G, LANES) f32
    acc_s,  # (NB, Hkv, G, D) f32
    *,
    block_k: int,
    blocks_per_split: int,
    batch_block: int,
    scale: float | None = None,
):
    blk = pl.program_id(2)  # kv-block index inside this split
    split = pl.program_id(1)
    group = pl.program_id(0)  # batch group of `batch_block` sequences
    nb = batch_block

    @pl.when(blk == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    # Per-sequence lengths of this group (SMEM loads are scalar; nb is
    # static so this unrolls to nb loads).
    lens = [lengths_ref[group * nb + j] for j in range(nb)]
    group_max = functools.reduce(jnp.maximum, lens)
    block_start = (split * blocks_per_split + blk) * block_k

    @pl.when(block_start < group_max)
    def _attend():
        _attend_block(
            lengths_ref, q_ref, k_ref, v_ref, m_s, l_s, acc_s,
            group=group, block_start=block_start, lens=lens, nb=nb,
            scale=scale,
        )

    @pl.when(blk == blocks_per_split - 1)
    def _emit():
        o_ref[:, 0] = acc_s[...]
        m_ref[:, 0] = m_s[...]
        l_ref[:, 0] = l_s[...]


def _win_first(lens, nb, qspan, window, block_k):
    """First KV block any sequence of the group needs under a sliding
    window: min over live (len > 0) sequences of (len + qspan - 1 - window)
    // block_k, clamped at 0. Without a window this is block 0."""
    if window is None:
        return 0
    starts = [
        jnp.where(
            lens[j] > 0,
            jnp.maximum(lens[j] + (qspan - 1) - window, 0),
            jnp.int32(2**30),
        )
        for j in range(nb)
    ]
    lo = functools.reduce(jnp.minimum, starts)
    return jnp.minimum(lo, jnp.int32(2**30 - 1)) // block_k


def _decode_kernel_fused(
    # Single-split variant: normalize in-kernel, write the FINAL output in
    # the query dtype — no f32 partials or (m, l) stats ever reach HBM. At
    # short context this removes ~3 MB/step of epilogue traffic (measured
    # ~25% of the whole kernel's bytes at ctx=384, B=16, Hkv=8).
    lengths_ref,
    layer_ref,
    q_ref,  # (NB, Hkv, G, D)
    k_ref,  # (1, NB, Hkv, Bk, D)
    v_ref,  # (1, NB, Hkv, Bk, D)
    o_ref,  # (NB, Hkv, G, D) in q dtype — FINAL normalized output
    m_s,
    l_s,
    acc_s,
    *,
    block_k: int,
    blocks_per_split: int,
    batch_block: int,
    qspan: int = 1,
    window=None,  # static int, or a TRACED scalar via _decode_kernel_fused_dyn
    sink_blocks: int = 0,
    sinks: int = 0,
    scale: float | None = None,
    softcap: float | None = None,
):
    blk = pl.program_id(1)  # grid = (groups, sink_blocks + blocks)
    group = pl.program_id(0)
    nb = batch_block

    @pl.when(blk == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    lens = [lengths_ref[group * nb + j] for j in range(nb)]
    group_max = functools.reduce(jnp.maximum, lens) + (qspan - 1)
    # Sliding window: walk only blocks that intersect the group's window
    # band [group_win_start, group_max). The index map shifts the fetch by
    # the same first-block offset (must stay in lockstep with _win_first).
    # Attention sinks prepend `sink_blocks` iterations visiting blocks
    # 0..sink_blocks-1 — skipped when the band walk already covers them
    # (first <= blk), so no block is ever attended twice.
    first = _win_first(lens, nb, qspan, window, block_k)
    if sink_blocks:
        in_sink = blk < sink_blocks
        block_start = jnp.where(
            in_sink, blk * block_k, (first + blk - sink_blocks) * block_k
        )
        should_run = jnp.where(
            in_sink,
            jnp.logical_and(blk < first, block_start < group_max),
            block_start < group_max,
        )
    else:
        block_start = (first + blk) * block_k
        should_run = block_start < group_max

    @pl.when(should_run)
    def _attend():
        _attend_block(
            lengths_ref, q_ref, k_ref, v_ref, m_s, l_s, acc_s,
            group=group, block_start=block_start, lens=lens, nb=nb,
            qspan=qspan, window=window, sinks=sinks, scale=scale,
            softcap=softcap,
        )

    @pl.when(blk == sink_blocks + blocks_per_split - 1)
    def _emit():
        l = l_s[..., :1]  # (NB, Hkv, G, 1)
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (acc_s[...] / l_safe).astype(o_ref.dtype)


def _decode_kernel_fused_dyn(
    lengths_ref, layer_ref, window_ref,
    q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, **kw,
):
    """Dynamic-window twin of :func:`_decode_kernel_fused`: the window rides
    as a third scalar-prefetch operand (a TRACED per-call value — Gemma-2's
    alternating sliding/full layers under one scan-over-layers). Every use
    of ``window`` in the kernel body / _win_first is vector arithmetic, so a
    traced scalar drops straight in; only the sink machinery (static block
    counts) requires a static window, and the caller rejects that combo."""
    _decode_kernel_fused(
        lengths_ref, layer_ref, q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s,
        window=window_ref[0], **kw,
    )


def _split_geometry(s: int, num_splits: int, block_k: int) -> tuple[int, int, int]:
    """Pick (num_splits, block_k, blocks_per_split) tiling S exactly.

    Joint search over feasible (ns <= num_splits, bk <= block_k) pairs,
    maximizing block_k first (DMA efficiency dominates) and num_splits
    second — a greedy descent can strand small caches at block_k=1
    (e.g. s=128 with the default knobs has the exact (1, 128) tiling)."""
    cap = min(block_k, s)
    best = (0, 0)  # (bk, ns)
    for ns in range(num_splits, 0, -1):
        if s % ns:
            continue
        per_split = s // ns
        bk = next(b for b in range(min(cap, per_split), 0, -1) if per_split % b == 0)
        if (bk, ns) > best:
            best = (bk, ns)
    block_k, num_splits = best
    if block_k < 32 and s > 256:
        # A cache length with no usable tiling (e.g. prime) would silently
        # degrade to a per-row grid — orders of magnitude slow. The CACHE
        # length (not the ragged per-seq `lengths`) is caller-chosen, so
        # insist it be tileable; masking handles everything shorter.
        raise ValueError(
            f"KV cache length {s} has no block tiling >= 32 "
            f"(requested num_splits={num_splits}, block_k={block_k}); "
            "allocate the cache with max_seq_len a multiple of 512"
        )
    return num_splits, block_k, s // (num_splits * block_k)


# VMEM spent on in-flight KV blocks: 2 tables x 2 pipeline buffers, out of
# the ~16 MB scoped-vmem limit — leave headroom for q, outputs, scratch, and
# the compiler. (Measured: 8.4 MB of KV buffers compiles, 16.7 MB OOMs.)
_KV_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_batch_block(b: int, hkv: int, d: int, block_k: int, itemsize: int) -> int:
    """Sequences per grid cell. Grid-cell fixed cost (~1 us of pipeline
    bookkeeping + VPU ramp per step) dominates the short-context decode
    regime — measured 56% of kernel time at B=16/Hkv=8/ctx~384 with one
    sequence per cell. Batch as many sequences as divide B and fit the
    VMEM budget."""
    for cand in (8, 4, 2):
        if b % cand == 0 and 4 * cand * hkv * block_k * d * itemsize <= _KV_VMEM_BUDGET:
            return cand
    return 1


def flash_decode_with_stats(
    q: jax.Array,  # (B, Hq, D)
    k_cache: jax.Array,  # (B, Hkv, S, D) or (L, B, Hkv, S, D) with `layer`
    v_cache: jax.Array,
    lengths: jax.Array,  # (B,) int32, valid KV positions (incl. current token)
    *,
    layer: jax.Array | int | None = None,
    sm_scale: float | None = None,
    num_splits: int = 4,
    block_k: int = 256,
    batch_block: int | None = None,  # sequences per grid cell; None = auto
    k_scales: jax.Array | None = None,  # (Hkv,) f32 when cache is quantized
    v_scales: jax.Array | None = None,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Split-KV decode returning per-SPLIT unnormalized partials.

    Returns ``(o_parts, m, l)`` with shapes ``(B, Hq, num_splits, D)`` /
    ``(B, Hq, num_splits)``; ``lse_combine_splits`` over the split axis
    yields the final output. This is the cross-chip-combinable form: a
    sharded KV cache produces the same triple per chip and merges over ICI
    (parallel/distributed_decode.py).

    Multi-layer mode: pass the WHOLE (L, B, Hkv, S, D) cache table plus a
    (traced) ``layer`` index — see the module docstring.
    """
    b, hq, d = q.shape
    if k_cache.ndim == 4:
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        layer = 0
    assert layer is not None, "layer index required for a (L, ...) cache table"
    _, _, hkv, s, _ = k_cache.shape
    assert hq % hkv == 0, (hq, hkv)
    g = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    quantized = k_cache.dtype in (jnp.int8, jnp.float8_e4m3fn)
    if quantized:
        assert k_scales is not None and v_scales is not None
    if interpret is None:
        interpret = _use_interpret()

    num_splits, block_k, blocks_per_split = _split_geometry(s, num_splits, block_k)
    if batch_block is None:
        batch_block = _pick_batch_block(b, hkv, d, block_k, k_cache.dtype.itemsize)
    assert b % batch_block == 0, (b, batch_block)
    nb = batch_block

    # Quantized: fold sm_scale and the per-KV-head K dequant scale into q
    # (one tiny VPU multiply). Non-quantized: scale the scores IN-KERNEL —
    # saves the whole pre-scale dispatch per call (~0.3 us, material at
    # short context).
    q4 = q.reshape(b, hkv, g, d)
    if quantized:
        scale = jnp.asarray(sm_scale, jnp.float32)
        scale = scale * k_scales.astype(jnp.float32)[None, :, None, None]
        q4 = (q4.astype(jnp.float32) * scale).astype(q.dtype)
        kscale = None
    else:
        kscale = float(sm_scale)
    lengths = lengths.astype(jnp.int32)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    grid = (b // nb, num_splits, blocks_per_split)
    kernel = functools.partial(
        _decode_kernel,
        block_k=block_k,
        blocks_per_split=blocks_per_split,
        batch_block=nb,
        scale=kscale,
    )

    def kv_index(gi, si, ki, lens, layer_ref):
        # Clamp to the last block holding valid data for ANY sequence of the
        # group: the pipeline skips re-fetching a block whose index didn't
        # change, so masked tail blocks cost zero HBM traffic. (Sorting the
        # batch by length keeps group maxima tight.)
        gmax = functools.reduce(
            jnp.maximum, [lens[gi * nb + j] for j in range(nb)]
        )
        last_valid = jnp.maximum((gmax + block_k - 1) // block_k - 1, 0)
        blk = jnp.minimum(si * blocks_per_split + ki, last_valid)
        return (layer_ref[0], gi, 0, blk, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (nb, hkv, g, d), lambda gi, si, ki, *_: (gi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, nb, hkv, block_k, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, hkv, block_k, d), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (nb, 1, hkv, g, d), lambda gi, si, ki, *_: (gi, si, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nb, 1, hkv, g, LANES), lambda gi, si, ki, *_: (gi, si, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nb, 1, hkv, g, LANES), lambda gi, si, ki, *_: (gi, si, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, hkv, g, LANES), jnp.float32),
            pltpu.VMEM((nb, hkv, g, LANES), jnp.float32),
            pltpu.VMEM((nb, hkv, g, d), jnp.float32),
        ],
    )

    o_parts, m_parts, l_parts = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, num_splits, hkv, g, d), jnp.float32),
            jax.ShapeDtypeStruct((b, num_splits, hkv, g, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, num_splits, hkv, g, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # allow double-buffered KV tiles beyond the default 16 MB scoped
            # budget (v5e has 128 MB physical VMEM) — big blocks cut the
            # idle-grid-step tax in the ragged short-context regime
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lengths, layer_arr, q4, k_cache, v_cache)

    # Fold the per-KV-head V dequant scale into the (unnormalized) partials —
    # linear, so it commutes with every later LSE merge.
    if quantized:
        o_parts = o_parts * v_scales.astype(jnp.float32)[None, None, :, None, None]

    # (B, splits, Hkv, G, ·) → (B, Hq, splits, ·)
    o_parts = o_parts.transpose(0, 2, 3, 1, 4).reshape(b, hq, num_splits, d)
    m_parts = m_parts[..., 0].transpose(0, 2, 3, 1).reshape(b, hq, num_splits)
    l_parts = l_parts[..., 0].transpose(0, 2, 3, 1).reshape(b, hq, num_splits)
    return o_parts, m_parts, l_parts


def lse_combine_splits(
    o_parts: jax.Array,  # (B, H, N, D) unnormalized
    m_parts: jax.Array,  # (B, H, N)
    l_parts: jax.Array,  # (B, H, N)
    dtype=None,
) -> jax.Array:
    """Merge split partials: the combine pass (flash_attn.cu:877-935), as a
    fused XLA epilogue in the same program rather than a second launch."""
    m_global = jnp.max(m_parts, axis=-1, keepdims=True)  # (B, H, 1)
    alpha = jnp.exp(m_parts - m_global)  # (B, H, N)
    l_global = jnp.sum(alpha * l_parts, axis=-1)  # (B, H)
    o = jnp.einsum("bhn,bhnd->bhd", alpha, o_parts)
    l_safe = jnp.where(l_global == 0.0, 1.0, l_global)
    o = o / l_safe[..., None]
    return o.astype(dtype) if dtype is not None else o


def _flash_decode_fused(
    q, k_cache, v_cache, lengths, *,
    layer, sm_scale, block_k, batch_block, k_scales, v_scales, interpret,
    qspan: int = 1,
    max_len_hint: int | None = None,
    window=None,  # int (static) or traced scalar Array (per-layer windows)
    sinks: int = 0,
    softcap: float | None = None,
) -> jax.Array:
    """Single-split decode with the normalize epilogue fused in-kernel.

    ``qspan > 1``: q is (B, Hq, qspan, D) — the verify mode (see
    :func:`flash_verify`).

    ``max_len_hint`` (static) caps the kv-block GRID at
    ``ceil(hint / block_k)`` steps instead of the cache's full
    ``S / block_k``: the cache is allocated at ``max_seq_len`` but a serving
    round's sequences only occupy a prefix, and every surplus grid step
    costs ~1 us of pipeline bookkeeping even when the index-map clamp
    dedupes its fetch. CONTRACT: every ``lengths[b] (+ qspan - 1)`` must be
    <= hint — rows past it are silently never attended. The engine derives
    the hint from host-known slot lengths per round (serving/engine.py)."""
    if qspan == 1:
        b, hq, d = q.shape
    else:
        b, hq, _, d = q.shape
    if k_cache.ndim == 4:
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        layer = 0
    assert layer is not None
    _, _, hkv, s, _ = k_cache.shape
    g = hq // hkv
    ge = g * qspan  # row dim per KV head: (G, qspan) flattened
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    quantized = k_cache.dtype in (jnp.int8, jnp.float8_e4m3fn)
    if interpret is None:
        interpret = _use_interpret()

    _, block_k, blocks = _split_geometry(s, 1, block_k)
    if max_len_hint is not None:
        covered = min(max_len_hint + qspan - 1, s)
        blocks = max(min(blocks, -(-covered // block_k)), 1)
    # NOTE: no static grid shrink for `window` — the walk starts at the
    # GROUP's first in-band block (_win_first = min over its sequences), and
    # with ragged lengths the union of per-sequence bands can span up to the
    # longest sequence, so the grid must still be able to reach last_valid.
    # Blocks past it dedupe/skip as usual; blocks below every band are
    # skipped by the shifted walk.
    if batch_block is None:
        batch_block = _pick_batch_block(b, hkv, d, block_k, k_cache.dtype.itemsize)
    assert b % batch_block == 0, (b, batch_block)
    nb = batch_block

    q4 = q.reshape(b, hkv, ge, d)
    if quantized:
        scale = jnp.asarray(sm_scale, jnp.float32)
        scale = scale * k_scales.astype(jnp.float32)[None, :, None, None]
        q4 = (q4.astype(jnp.float32) * scale).astype(q.dtype)
        kscale = None
    else:
        # non-quantized: score scaling happens in-kernel (see _attend_block)
        kscale = float(sm_scale)
    lengths = lengths.astype(jnp.int32)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    if sinks and window is None:
        raise ValueError("attention sinks require a sliding window")
    # Dynamic (traced) window: Gemma-2's alternating sliding/full layers
    # under one scan-over-layers pass a per-layer scalar instead of a
    # compile-time constant; it rides as a third scalar-prefetch operand.
    dyn_window = isinstance(window, jax.Array)
    if dyn_window and sinks:
        raise ValueError(
            "attention sinks need a STATIC window (sink block counts are "
            "compile-time); pass a python int window with sinks"
        )
    sink_blocks = -(-sinks // block_k) if (sinks and window is not None) else 0

    kernel = functools.partial(
        _decode_kernel_fused_dyn if dyn_window else _decode_kernel_fused,
        block_k=block_k,
        blocks_per_split=blocks,
        batch_block=nb,
        qspan=qspan,
        sink_blocks=sink_blocks,
        sinks=sinks,
        scale=kscale,
        softcap=softcap,
        **({} if dyn_window else {"window": window}),
    )

    def kv_index(gi, ki, lens, layer_ref, *maybe_win):
        lens_g = [lens[gi * nb + j] for j in range(nb)]
        gmax = functools.reduce(jnp.maximum, lens_g)
        # verify mode: the last query row attends qspan-1 rows past `lengths`
        last_valid = jnp.maximum((gmax + qspan - 1 + block_k - 1) // block_k - 1, 0)
        # sliding window: shift the walk to the group's first in-band block
        # (stays in lockstep with the kernel body's _win_first); sink
        # iterations (ki < sink_blocks) fetch blocks 0.. directly
        win = maybe_win[0][0] if maybe_win else window
        first = _win_first(lens_g, nb, qspan, win, block_k)
        blk = jnp.clip(first + ki - sink_blocks, 0, last_valid)
        if sink_blocks:
            blk = jnp.where(ki < sink_blocks, jnp.minimum(ki, last_valid), blk)
        return (layer_ref[0], gi, 0, blk, 0)

    prefetch = [lengths, layer_arr]
    if dyn_window:
        prefetch.append(window.astype(jnp.int32).reshape(1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(b // nb, sink_blocks + blocks),
        in_specs=[
            pl.BlockSpec(
                (nb, hkv, ge, d), lambda gi, ki, *_: (gi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, nb, hkv, block_k, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, hkv, block_k, d), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, hkv, ge, d), lambda gi, ki, *_: (gi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((nb, hkv, ge, LANES), jnp.float32),
            pltpu.VMEM((nb, hkv, ge, LANES), jnp.float32),
            pltpu.VMEM((nb, hkv, ge, d), jnp.float32),
        ],
    )

    o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, ge, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*prefetch, q4, k_cache, v_cache)

    if quantized:
        # V dequant scale is linear in the output — applied on the tiny
        # final tensor instead of inside the kernel.
        o = (o.astype(jnp.float32) * v_scales.astype(jnp.float32)[None, :, None, None]
             ).astype(q.dtype)
    if qspan == 1:
        return o.reshape(b, hq, d)
    return o.reshape(b, hq, qspan, d)


def flash_verify(
    q: jax.Array,  # (B, Hq, T, D) — T consecutive query tokens per sequence
    k_cache: jax.Array,  # (B, Hkv, S, D) or (L, B, Hkv, S, D) with `layer`
    v_cache: jax.Array,
    lengths: jax.Array,  # (B,) int32 — valid KV for query row 0 (incl. its row)
    *,
    layer: jax.Array | int | None = None,
    sm_scale: float | None = None,
    block_k: int = 256,
    batch_block: int | None = None,
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    interpret: bool | None = None,
    max_len_hint: int | None = None,
    window=None,
    sinks: int = 0,
    softcap: float | None = None,
) -> jax.Array:
    """Multi-query decode attention for speculative-decoding VERIFY steps.

    ``q[:, :, j]`` is the query at absolute position ``lengths[b] - 1 + j``
    (token 0 = the pending token, tokens 1.. = draft tokens whose K/V rows
    were just appended); row j attends KV positions ``< lengths[b] + j``
    (the staircase causal mask). Returns (B, Hq, T, D).

    Same memory behavior as :func:`flash_decode` — one KV stream over all
    heads per grid cell — so a T-token verify step costs roughly one decode
    step of HBM traffic: the basis of the speculative-decoding speedup
    (models/llama.spec_decode_multi). The reference has no speculative or
    multi-query path (SURVEY.md §2: one token per step, flash_attn.cu:554).
    """
    assert q.ndim == 4, q.shape
    return _flash_decode_fused(
        q, k_cache, v_cache, lengths,
        layer=layer, sm_scale=sm_scale, block_k=block_k,
        batch_block=batch_block, k_scales=k_scales, v_scales=v_scales,
        interpret=interpret, qspan=q.shape[2], max_len_hint=max_len_hint,
        window=window, sinks=sinks, softcap=softcap,
    )


def flash_decode(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    lengths: jax.Array,
    *,
    layer: jax.Array | int | None = None,
    sm_scale: float | None = None,
    num_splits: int = 4,
    block_k: int = 256,
    batch_block: int | None = None,
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    interpret: bool | None = None,
    max_len_hint: int | None = None,
    window=None,  # int (static) or traced scalar (Gemma-2 per-layer windows)
    sinks: int = 0,
    softcap: float | None = None,  # Gemma-2 attention logit softcapping
) -> jax.Array:
    """Decode attention: (B, Hq, D) query vs (B, Hkv, S, D) cache — or a
    whole (L, B, Hkv, S, D) table plus ``layer`` — → (B, Hq, D).

    ``sinks`` (static, with ``window``): StreamingLLM attention sinks — the
    first ``sinks`` cache positions stay attendable outside the window
    (extra prepended walk iterations cover their blocks).

    The public analog of the reference's ``mha_fwd_cuda`` attention core
    (flash_api.cpp:42-68) with GQA, ragged ``lengths``, quantized caches, and
    in-kernel layer-table indexing. ``num_splits=1`` takes the fused-epilogue
    kernel: no f32 partials or (m, l) stats ever reach HBM.

    ``max_len_hint`` (static, fused path only): caller-guaranteed upper
    bound on ``lengths`` — shrinks the kv grid to ``ceil(hint/block_k)``
    steps (see :func:`_flash_decode_fused`).
    """
    s = k_cache.shape[-2]
    eff_splits = _split_geometry(s, num_splits, block_k)[0]
    if window is not None and eff_splits != 1:
        raise ValueError(
            "sliding-window attention requires num_splits=1 (the fused "
            "kernel); splitting a windowed band across the cache buys nothing"
        )
    if softcap is not None and eff_splits != 1:
        raise ValueError(
            "attention softcapping requires num_splits=1 (the fused kernel); "
            "use num_splits=1 for Gemma-2-class models"
        )
    if sinks and window is None:
        raise ValueError("attention sinks require a sliding window")
    if eff_splits == 1:
        return _flash_decode_fused(
            q, k_cache, v_cache, lengths,
            layer=layer, sm_scale=sm_scale, block_k=block_k,
            batch_block=batch_block, k_scales=k_scales, v_scales=v_scales,
            interpret=interpret, max_len_hint=max_len_hint, window=window,
            sinks=sinks, softcap=softcap,
        )
    # the split path partitions the WHOLE cache across splits; the grid hint
    # only applies to the fused single-split serving path
    o_parts, m_parts, l_parts = flash_decode_with_stats(
        q,
        k_cache,
        v_cache,
        lengths,
        layer=layer,
        sm_scale=sm_scale,
        num_splits=num_splits,
        block_k=block_k,
        batch_block=batch_block,
        k_scales=k_scales,
        v_scales=v_scales,
        interpret=interpret,
    )
    return lse_combine_splits(o_parts, m_parts, l_parts, dtype=q.dtype)
