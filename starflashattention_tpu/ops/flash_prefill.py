"""Causal flash-attention prefill Pallas kernel.

The reference has NO prefill kernel (SURVEY.md §2: decode-only); this is the
new capability mandated by BASELINE.json config 2 (multi-head causal prefill,
bf16, Llama-7B shapes) so the engine can serve TTFT, not just tokens/s.

Design: FlashAttention-2 forward re-expressed for the MXU, with the same
"all group heads per grid cell" batching that took the paged decode kernel
from 0.34x to 0.89x of roofline:

- grid (batch, KV head, q_block, kv_block) — one cell computes ALL G = Hq/Hkv
  query heads of its group against one KV tile, so each KV tile is fetched
  ONCE per q block instead of G times (at 7B GQA that's 4x less KV DMA) and
  the score matmul is (G*block_q, D) x (D, block_k) — MXU-sized instead of
  G small ones.
- interior tiles skip masking entirely: a tile fully below the causal
  diagonal and fully inside every sequence's valid length runs a mask-free
  fast path (no iota, no compares, no select — at block 512x512 the masked
  epilogue is pure VPU overhead on >90% of tiles).
- whole KV tiles above the diagonal are skipped before any matmul; running
  (m, l, acc) live in fp32 VMEM scratch across the kv_block loop.

GQA head mapping (q head h -> KV head h // G) matches ops/flash_decode.py.
Measured (v5e, B=1, Hq=32, Hkv=8, S=2048, D=128, bf16): per-q-head grid at
block 128x128 ran 2.66 ms/layer (0.07 of MXU peak); this design at the
512x1024 default runs ~0.35 ms (~0.5 of peak). Whole-model 7B TTFT at
seq 2048: 244.5 -> 187.0 ms, step MXU fraction 0.49 -> 0.64
(benchmarks/artifacts/results_round2.jsonl).
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


def _prefill_kernel(
    lengths_ref,  # (B,) int32 SMEM — full array, indexed by program_id
    q_off_ref,  # (B,) int32 SMEM — absolute position of q row 0 per sequence
    q_ref,  # (1, G, Bq, D)
    k_ref,  # (1, 1, Bk, D)
    v_ref,  # (1, 1, Bk, D)
    o_ref,  # (1, G, Bq, D)
    m_s,  # (G*Bq, LANES) f32
    l_s,  # (G*Bq, LANES) f32
    acc_s,  # (G*Bq, D) f32
    *,
    group: int,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    sm_scale: float,
    causal: bool,
):
    batch = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    length = lengths_ref[batch]
    offset = q_off_ref[batch]
    kv_start = ki * block_k
    q_row0 = offset + qi * block_q  # absolute position of this tile's row 0

    if causal:
        # Skip KV tiles entirely above the diagonal: the last q row of this
        # tile sits at absolute position q_row0 + block_q - 1.
        in_band = kv_start <= q_row0 + block_q - 1
    else:
        in_band = True
    should_run = jnp.logical_and(in_band, kv_start < length)
    # Interior tiles need no masking: every kv column is <= every q row
    # (fully below the diagonal) and < length.
    no_mask = kv_start + block_k <= length
    if causal:
        no_mask = jnp.logical_and(no_mask, kv_start + block_k - 1 <= q_row0)

    def _attend(masked: bool):
        q = q_ref[0].reshape(group * block_q, q_ref.shape[-1])
        k = k_ref[0, 0]  # (Bk, D)
        v = v_ref[0, 0]

        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # (G*Bq, Bk)

        if masked:
            col = kv_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            mask = col < length
            if causal:
                # row index repeats per head within the group
                row = q_row0 + jax.lax.rem(
                    jax.lax.broadcasted_iota(jnp.int32, s.shape, 0),
                    block_q,
                )
                mask = jnp.logical_and(mask, col <= row)
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_s[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_s[...] = alpha * l_s[...] + jnp.sum(p, axis=1, keepdims=True)
        m_s[...] = m_next

        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_s[...] = acc_s[...] * alpha[:, :1] + pv

    @pl.when(jnp.logical_and(should_run, no_mask))
    def _attend_fast():
        _attend(masked=False)

    @pl.when(jnp.logical_and(should_run, jnp.logical_not(no_mask)))
    def _attend_masked():
        _attend(masked=True)

    @pl.when(ki == num_kv_blocks - 1)
    def _emit():
        l = l_s[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o = (acc_s[...] / l_safe).astype(o_ref.dtype)
        o_ref[0] = o.reshape(group, block_q, o_ref.shape[-1])


def flash_prefill(
    q: jax.Array,  # (B, Hq, Sq, D)
    k: jax.Array,  # (B, Hkv, Skv, D)
    v: jax.Array,
    lengths: jax.Array | None = None,  # (B,) valid KV length
    *,
    causal: bool = True,
    q_offsets: jax.Array | None = None,  # (B,) absolute position of q[:, :, 0]
    sm_scale: float | None = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool | None = None,
) -> jax.Array:
    """Blockwise causal prefill attention → (B, Hq, Sq, D).

    ``q_offsets`` shifts each sequence's causal diagonal: queries are a chunk
    starting at that absolute position in the KV timeline (chunked prefill /
    multi-token decode against a cache). Q heads must be grouped by KV head
    (head h attends KV head ``h // (Hq//Hkv)``).
    """
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    assert hq % hkv == 0, (hq, hkv)
    g = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    if interpret is None:
        interpret = _use_interpret()
    if lengths is None:
        lengths = jnp.full((b,), skv, jnp.int32)
    lengths = jnp.minimum(lengths.astype(jnp.int32), skv)
    if q_offsets is None:
        q_offsets = jnp.zeros((b,), jnp.int32)
    q_offsets = q_offsets.astype(jnp.int32)

    # Pad sequence dims up to tile multiples; padded KV is masked by
    # `lengths`, padded Q rows are sliced off the output.
    block_q = min(block_q, max(sq, 8))
    block_k = min(block_k, max(skv, 128))
    sq_p = -(-sq // block_q) * block_q
    skv_p = -(-skv // block_k) * block_k
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))

    num_q_blocks = sq_p // block_q
    num_kv_blocks = skv_p // block_k
    grid = (b, hkv, num_q_blocks, num_kv_blocks)

    kernel = functools.partial(
        _prefill_kernel,
        group=g,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
        sm_scale=float(sm_scale),
        causal=causal,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, g, block_q, d),
                lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, g, block_q, d),
            lambda bi, hi, qi, ki: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * block_q, LANES), jnp.float32),
            pltpu.VMEM((g * block_q, LANES), jnp.float32),
            pltpu.VMEM((g * block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lengths, q_offsets, q, k, v)

    return out[:, :, :sq, :]
