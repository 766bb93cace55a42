"""Causal flash-attention prefill Pallas kernel.

The reference has NO prefill kernel (SURVEY.md §2: decode-only); this is the
new capability mandated by BASELINE.json config 2 (multi-head causal prefill,
bf16, Llama-7B shapes) so the engine can serve TTFT, not just tokens/s.

Design: classic FlashAttention-2 forward re-expressed for the MXU —
grid (batch, q_head, q_block, kv_block), 128-aligned tiles, running
(m, l, acc) in fp32 VMEM scratch, whole KV tiles above the causal diagonal
skipped before any matmul. GQA maps each q head to its KV head inside the
BlockSpec index maps, so no repeated KV is ever materialized (the reference
has no GQA at all, SURVEY.md §2.9j).
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
    q_ref,  # (1, 1, Bq, D)
    k_ref,  # (1, 1, Bk, D)
    v_ref,  # (1, 1, Bk, D)
    o_ref,  # (1, 1, Bq, D)
    m_s,  # (Bq, LANES) f32
    l_s,  # (Bq, LANES) f32
    acc_s,  # (Bq, D) f32
    *,
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

    if causal:
        # Skip KV tiles entirely above the diagonal: the last q row of this
        # tile sits at absolute position offset + (qi+1)*block_q - 1; run
        # only if some kv column <= it.
        in_band = kv_start <= offset + (qi + 1) * block_q - 1
    else:
        in_band = True
    should_run = jnp.logical_and(in_band, kv_start < length)

    @pl.when(should_run)
    def _attend():
        q = q_ref[0, 0]  # (Bq, D)
        k = k_ref[0, 0]  # (Bk, D)
        v = v_ref[0, 0]

        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # (Bq, Bk)

        col = kv_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = col < length
        if causal:
            row = offset + qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
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

    @pl.when(ki == num_kv_blocks - 1)
    def _emit():
        l = l_s[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_s[...] / l_safe).astype(o_ref.dtype)


def flash_prefill(
    q: jax.Array,  # (B, Hq, Sq, D)
    k: jax.Array,  # (B, Hkv, Skv, D)
    v: jax.Array,
    lengths: jax.Array | None = None,  # (B,) valid KV length
    *,
    causal: bool = True,
    q_offsets: jax.Array | None = None,  # (B,) absolute position of q[:, :, 0]
    sm_scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """Blockwise causal prefill attention → (B, Hq, Sq, D).

    ``q_offsets`` shifts each sequence's causal diagonal: queries are a chunk
    starting at that absolute position in the KV timeline (chunked prefill /
    multi-token decode against a cache).
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
    grid = (b, hq, num_q_blocks, num_kv_blocks)

    kernel = functools.partial(
        _prefill_kernel,
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
                (1, 1, block_q, d),
                lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, hi, qi, ki: (bi, hi // g, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, hi, qi, ki: (bi, hi // g, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d),
            lambda bi, hi, qi, ki: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, q_offsets, q, k, v)

    return out[:, :, :sq, :]
