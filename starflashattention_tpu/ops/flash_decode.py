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
* The per-(head) GEMVs become real MXU matmuls: with GQA, all ``G = Hq/Hkv``
  query heads that share a KV head are batched into one ``(G, D) @ (D, Bk)``
  dot, so the systolic array sees a matrix, not a vector.
* INT8 / FP8 KV dequant is fused: quantized K/V tiles are upcast in VMEM
  registers and the per-head scale is folded into the score scale / output
  write — no fp copy of the cache ever exists in HBM (BASELINE.json mandate).
* The decode and combine passes live in ONE jitted program with no
  host round-trip (the reference needs a full cudaDeviceSynchronize between
  its two launches, flash_attn.cu:986).

Layout: the kernel sees q as (B, Hkv, G, D) and the caches as
(B, Hkv, S, D); the public wrapper reshapes from the (B, Hq, D) API.
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
    # smem operands (full arrays — TPU requires rank-1 SMEM blocks unsliced)
    lengths_ref,  # (B,) int32 in SMEM — valid KV length per sequence
    kscale_ref,  # (Hkv,) f32 in SMEM — per-KV-head K scale
    vscale_ref,  # (Hkv,) f32 in SMEM — per-KV-head V scale
    # tensor operands
    q_ref,  # (1, 1, G, D)
    k_ref,  # (1, 1, Bk, D)
    v_ref,  # (1, 1, Bk, D)
    # outputs
    o_ref,  # (1, 1, 1, G, D) f32 — UNNORMALIZED partial output
    m_ref,  # (1, 1, 1, G, LANES) f32
    l_ref,  # (1, 1, 1, G, LANES) f32
    # scratch
    m_s,  # (G, LANES) f32
    l_s,  # (G, LANES) f32
    acc_s,  # (G, D) f32
    *,
    block_k: int,
    blocks_per_split: int,
    sm_scale: float,
    quantized: bool,
):
    blk = pl.program_id(3)  # kv-block index inside this split
    split = pl.program_id(2)
    head = pl.program_id(1)
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
        q = q_ref[0, 0]  # (G, D)
        k = k_ref[0, 0]  # (Bk, D)
        v = v_ref[0, 0]
        # Quantized tiles upcast in VMEM registers (never materialized in
        # HBM); the per-head scale folds into the scalar score scale below.
        if k.dtype != q.dtype:
            k = k.astype(q.dtype)
        if v.dtype != q.dtype:
            v = v.astype(q.dtype)

        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, Bk)
        scale = sm_scale * (kscale_ref[head] if quantized else 1.0)
        s = s * scale

        kv_pos = block_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_pos < length, s, NEG_INF)

        m_prev = m_s[...]  # (G, LANES), all lanes equal
        m_curr = jnp.max(s, axis=1, keepdims=True)  # (G, 1)
        m_next = jnp.maximum(m_prev, m_curr)  # (G, LANES)
        alpha = jnp.exp(m_prev - m_next)  # (G, LANES)
        p = jnp.exp(s - m_next[:, :1])  # (G, Bk)
        l_s[...] = alpha * l_s[...] + jnp.sum(p, axis=1, keepdims=True)
        m_s[...] = m_next

        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, D)
        acc_s[...] = acc_s[...] * alpha[:, :1] + pv

    @pl.when(blk == blocks_per_split - 1)
    def _emit():
        acc = acc_s[...]
        if quantized:
            acc = acc * vscale_ref[head]
        o_ref[0, 0, 0] = acc
        m_ref[0, 0, 0] = m_s[...]
        l_ref[0, 0, 0] = l_s[...]


def flash_decode_with_stats(
    q: jax.Array,  # (B, Hq, D)
    k_cache: jax.Array,  # (B, Hkv, S, D) — bf16/fp32 or int8/fp8
    v_cache: jax.Array,
    lengths: jax.Array,  # (B,) int32, valid KV positions (incl. current token)
    *,
    sm_scale: float | None = None,
    num_splits: int = 4,
    block_k: int = 256,
    k_scales: jax.Array | None = None,  # (Hkv,) f32 when cache is quantized
    v_scales: jax.Array | None = None,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Split-KV decode returning per-SPLIT unnormalized partials.

    Returns ``(o_parts, m, l)`` with shapes ``(B, Hq, num_splits, D)`` /
    ``(B, Hq, num_splits)``; ``lse_combine`` over the split axis yields the
    final output. This is the cross-chip-combinable form: a sharded KV cache
    produces the same triple per chip and merges over ICI
    (parallel/distributed_decode.py).
    """
    b, hq, d = q.shape
    _, hkv, s, _ = k_cache.shape
    assert hq % hkv == 0, (hq, hkv)
    g = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    quantized = k_cache.dtype in (jnp.int8, jnp.float8_e4m3fn)
    if quantized:
        assert k_scales is not None and v_scales is not None
    else:
        k_scales = jnp.ones((hkv,), jnp.float32)
        v_scales = jnp.ones((hkv,), jnp.float32)
    if interpret is None:
        interpret = _use_interpret()

    # Static split geometry: S must tile into num_splits * blocks_per_split
    # blocks of block_k. Shrink block_k / num_splits for small caches.
    block_k = min(block_k, s)
    while s % (num_splits * block_k) != 0:
        if block_k > 128 and s % ((num_splits * block_k) // 2) == 0 and block_k % 2 == 0:
            block_k //= 2
            continue
        if num_splits > 1:
            num_splits -= 1
            while s % (num_splits * block_k) != 0 and block_k > 1:
                block_k //= 2
            continue
        block_k //= 2
    blocks_per_split = s // (num_splits * block_k)

    q4 = q.reshape(b, hkv, g, d)
    lengths = lengths.astype(jnp.int32)

    grid = (b, hkv, num_splits, blocks_per_split)
    kernel = functools.partial(
        _decode_kernel,
        block_k=block_k,
        blocks_per_split=blocks_per_split,
        sm_scale=float(sm_scale),
        quantized=quantized,
    )

    o_parts, m_parts, l_parts = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, g, d), lambda bi, hi, si, ki: (bi, hi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, hi, si, ki: (bi, hi, si * blocks_per_split + ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, hi, si, ki: (bi, hi, si * blocks_per_split + ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, 1, g, d),
                lambda bi, hi, si, ki: (bi, hi, si, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, g, LANES),
                lambda bi, hi, si, ki: (bi, hi, si, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, g, LANES),
                lambda bi, hi, si, ki: (bi, hi, si, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, num_splits, g, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, num_splits, g, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, num_splits, g, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, LANES), jnp.float32),
            pltpu.VMEM((g, LANES), jnp.float32),
            pltpu.VMEM((g, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, k_scales.astype(jnp.float32), v_scales.astype(jnp.float32), q4, k_cache, v_cache)

    # (B, Hkv, splits, G, ·) → (B, Hq, splits, ·)
    o_parts = o_parts.transpose(0, 1, 3, 2, 4).reshape(b, hq, num_splits, d)
    m_parts = m_parts[..., 0].transpose(0, 1, 3, 2).reshape(b, hq, num_splits)
    l_parts = l_parts[..., 0].transpose(0, 1, 3, 2).reshape(b, hq, num_splits)
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
    sm_scale: float | None = None,
    num_splits: int = 4,
    block_k: int = 256,
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Decode attention: (B, Hq, D) query vs (B, Hkv, S, D) cache → (B, Hq, D).

    The public analog of the reference's ``mha_fwd_cuda`` attention core
    (flash_api.cpp:42-68) with GQA, ragged ``lengths``, and quantized caches.
    """
    o_parts, m_parts, l_parts = flash_decode_with_stats(
        q,
        k_cache,
        v_cache,
        lengths,
        sm_scale=sm_scale,
        num_splits=num_splits,
        block_k=block_k,
        k_scales=k_scales,
        v_scales=v_scales,
        interpret=interpret,
    )
    return lse_combine_splits(o_parts, m_parts, l_parts, dtype=q.dtype)
