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


def _decode_kernel(
    # scalar-prefetch operands (PrefetchScalarGridSpec: also fed to index maps)
    lengths_ref,  # (B,) int32 — valid KV length per sequence
    layer_ref,  # (1,) int32 — which layer of the (L, ...) cache table
    # tensor operands
    q_ref,  # (1, Hkv, G, D) — pre-scaled by sm_scale (and K scale if quant)
    k_ref,  # (1, 1, Hkv, Bk, D) — layer-selected KV block, all heads
    v_ref,  # (1, 1, Hkv, Bk, D)
    # outputs
    o_ref,  # (1, 1, Hkv, G, D) f32 — UNNORMALIZED partial output
    m_ref,  # (1, 1, Hkv, G, LANES) f32
    l_ref,  # (1, 1, Hkv, G, LANES) f32
    # scratch
    m_s,  # (Hkv, G, LANES) f32
    l_s,  # (Hkv, G, LANES) f32
    acc_s,  # (Hkv, G, D) f32
    *,
    block_k: int,
    blocks_per_split: int,
):
    blk = pl.program_id(2)  # kv-block index inside this split
    split = pl.program_id(1)
    batch = pl.program_id(0)

    @pl.when(blk == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    length = lengths_ref[batch]
    block_start = (split * blocks_per_split + blk) * block_k

    @pl.when(block_start < length)
    def _attend():
        q = q_ref[0]  # (Hkv, G, D)
        k = k_ref[0, 0]  # (Hkv, Bk, D)
        v = v_ref[0, 0]
        # Quantized tiles upcast in VMEM registers (never materialized in HBM).
        if k.dtype != q.dtype:
            k = k.astype(q.dtype)
        if v.dtype != q.dtype:
            v = v.astype(q.dtype)

        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (Hkv, G, Bk)

        kv_pos = block_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(kv_pos < length, s, NEG_INF)

        m_prev = m_s[...]  # (Hkv, G, LANES), lanes equal
        m_curr = jnp.max(s, axis=2, keepdims=True)  # (Hkv, G, 1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[..., :1])  # (Hkv, G, Bk)
        l_s[...] = alpha * l_s[...] + jnp.sum(p, axis=2, keepdims=True)
        m_s[...] = m_next

        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (Hkv, G, D)
        acc_s[...] = acc_s[...] * alpha[..., :1] + pv

    @pl.when(blk == blocks_per_split - 1)
    def _emit():
        o_ref[0, 0] = acc_s[...]
        m_ref[0, 0] = m_s[...]
        l_ref[0, 0] = l_s[...]


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

    # Fold sm_scale (and the per-KV-head K dequant scale) into q: one tiny
    # VPU multiply instead of per-block work inside the kernel.
    q4 = q.reshape(b, hkv, g, d)
    scale = jnp.asarray(sm_scale, jnp.float32)
    if quantized:
        scale = scale * k_scales.astype(jnp.float32)[None, :, None, None]
    q4 = (q4.astype(jnp.float32) * scale).astype(q.dtype)
    lengths = lengths.astype(jnp.int32)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    grid = (b, num_splits, blocks_per_split)
    kernel = functools.partial(
        _decode_kernel,
        block_k=block_k,
        blocks_per_split=blocks_per_split,
    )

    def kv_index(bi, si, ki, lens, layer_ref):
        # Clamp to the last block holding valid data for sequence bi: the
        # pipeline skips re-fetching a block whose index didn't change, so
        # masked tail blocks cost zero HBM traffic.
        last_valid = jnp.maximum((lens[bi] + block_k - 1) // block_k - 1, 0)
        blk = jnp.minimum(si * blocks_per_split + ki, last_valid)
        return (layer_ref[0], bi, 0, blk, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, hkv, g, d), lambda bi, si, ki, *_: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, hkv, block_k, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hkv, block_k, d), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, hkv, g, d), lambda bi, si, ki, *_: (bi, si, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hkv, g, LANES), lambda bi, si, ki, *_: (bi, si, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hkv, g, LANES), lambda bi, si, ki, *_: (bi, si, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((hkv, g, LANES), jnp.float32),
            pltpu.VMEM((hkv, g, LANES), jnp.float32),
            pltpu.VMEM((hkv, g, d), jnp.float32),
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
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Decode attention: (B, Hq, D) query vs (B, Hkv, S, D) cache — or a
    whole (L, B, Hkv, S, D) table plus ``layer`` — → (B, Hq, D).

    The public analog of the reference's ``mha_fwd_cuda`` attention core
    (flash_api.cpp:42-68) with GQA, ragged ``lengths``, quantized caches, and
    in-kernel layer-table indexing.
    """
    o_parts, m_parts, l_parts = flash_decode_with_stats(
        q,
        k_cache,
        v_cache,
        lengths,
        layer=layer,
        sm_scale=sm_scale,
        num_splits=num_splits,
        block_k=block_k,
        k_scales=k_scales,
        v_scales=v_scales,
        interpret=interpret,
    )
    return lse_combine_splits(o_parts, m_parts, l_parts, dtype=q.dtype)
