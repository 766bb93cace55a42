"""Differentiable flash attention: FA2-style backward Pallas kernels.

The reference is inference-only (SURVEY.md: no training/backward anywhere);
this module goes beyond parity so the framework can TRAIN with the same
memory-efficient blockwise attention it serves with. Before this,
benchmarks/train_tiny.py used a plain-jnp attention whose (B, H, S, S) score
tensor materializes in HBM — O(S^2) bytes that cap trainable context length.

Math (FlashAttention-2 backward, arXiv:2307.08691 §3.2, re-derived for the
base-2 softmax convention of ops/flash_prefill.py):

    forward saved per row: o and lse2 = log2(sum_j 2^(s2_j)),  where
        s2 = (sm_scale * log2 e) * q . k     (q pre-scaled outside the MXU)
    backward recomputes p = 2^(s2 - lse2) = softmax(s_nat) tile by tile:
        delta = rowsum(do * o)                       (computed outside, f32)
        dv += p^T @ do
        dp  = do @ v^T
        ds  = p * (dp - delta)                       (d/d s_nat, unitless)
        dq += sm_scale * ds @ k
        dk += ln2 * ds^T @ q~          (q~ carries sm_scale*log2e, so the
                                        leftover constant is exactly ln 2)

Two kernels, each writing its gradient exactly once (TPU has no atomics —
the CUDA-style single-pass dq/dk/dv accumulation is replaced by two grids
whose inner "arbitrary" dimension owns the reduction in VMEM scratch):

  _dq_kernel   grid (B, Hkv, q_block, kv_block): dq accumulated over KV tiles
  _dkdv_kernel grid (B, Hkv, kv_block, q_block): dk, dv accumulated over Q
               tiles; the whole GQA group's rows share the cell, so the
               group-sum for dk/dv falls out of the same dot.

Causal/window/ragged-length skipping mirrors the forward: a tile with no
in-band (row, col) pair is skipped before any matmul; padded q rows are
harmless because the forward emits lse = +BIG for them (p == 0) and their
do is zero-padded.

The public entry is :func:`flash_attention` — a ``jax.custom_vjp`` around
:func:`ops.flash_prefill.flash_prefill` — a drop-in differentiable
attention for training loops (GQA, causal, ragged lengths, sliding window,
chunked q_offsets all supported).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_prefill import LOG2E, flash_prefill

LN2 = math.log(2.0)
NEG_BIG = -1e30


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rows_meta(q_ref, block_q: int):
    """Flatten the (1, G, Bq, D) q/do tiles head-major into (rows, D)."""
    _, g, bq, d = q_ref.shape
    rows = g * bq
    return rows, g, d


def _per_head(x, h: int, block_q: int):
    """Row slice of the flattened (rows, N) tile belonging to head h."""
    return x[h * block_q : (h + 1) * block_q]


def _tile_mask(rows, block_q, block_k, q_row0, kv_start, length, causal, window,
               sinks=0, sink_lo=0):
    """(rows, Bk) validity mask in the flattened head-major row layout."""
    col = kv_start + jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 1)
    mask = col < length
    if causal or window is not None:
        row = q_row0 + jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0), block_q
        )
        if causal:
            mask = jnp.logical_and(mask, col <= row)
        if window is not None:
            w_ok = col > row - window
            if sinks:
                # the sink boundary is ABSOLUTE: shift by the chunk's global
                # kv offset under ring CP (window/causal are relative)
                w_ok = jnp.logical_or(w_ok, col < sinks - sink_lo)
            mask = jnp.logical_and(mask, w_ok)
    return mask


def _pick_bwd_chains(g: int) -> int:
    """Row chains for MXU/VPU interleave (chain boundaries fall on whole
    heads). MEASURED OFF: unlike the forward (0.53->0.65 from 4 chains),
    2-chaining the backward REGRESSED on chip at 7B shapes — 1.56->1.66 ms
    at seq 2k, 17.2->18.2 ms at 8k (r4, bq=bk=1024). The backward already
    issues 3-4 dots per tile between VPU phases (s2, dp, then dk/dv or dq),
    so Mosaic has natural overlap material, and halving the dot M-dim just
    shortens the MXU pipe. Kept as a knob; 1 = single full-rows chain."""
    return 1


def _tile_dots(qm_c, k, v, do_c, softcap=None):
    """The two recompute matmuls for one chain slice: scores + dP.

    Without softcap, q is pre-scaled by sm_scale*LOG2E so the dot yields
    base-2 scores directly. With softcap (Gemma-2), q carries sm_scale ONLY:
    the dot yields natural scaled scores, the tanh cap applies, the result
    converts to base-2, and the tanh derivative (1 - (s_cap/cap)^2) rides
    along to chain-rule dS back to the raw scores."""
    s = jax.lax.dot_general(
        qm_c, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (crows, Bk): base-2 units, or natural units under softcap
    dp = jax.lax.dot_general(
        do_c, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if softcap is None:
        return s, dp, None
    t = jnp.tanh(s * (1.0 / softcap))
    return (softcap * LOG2E) * t, dp, 1.0 - t * t


def _tile_elem(s2, dp, lse_ref, delta_ref, mask, heads, block_q, head0,
               deriv=None):
    """VPU part for one chain: softmax recompute + dS. Returns (p, ds) f32.

    The per-row LSE/delta subtraction runs per HEAD on full-lane-width
    (block_q, Bk) row slices — the (Bq, G) side arrays are read as
    (block_q, 1) sublane columns, so no cross-lane relayout is ever needed
    (Mosaic can neither reshape a lane vector into sublanes nor concatenate
    slices with distinct lane offsets).
    """
    s2 = jnp.where(mask, s2, NEG_BIG)
    side = lse_ref[0, 0]  # (Bq, G) f32
    dside = delta_ref[0, 0]
    p_parts, ds_parts = [], []
    for h in range(heads):
        lse_h = side[:, head0 + h : head0 + h + 1]  # (Bq, 1) sublane column
        delta_h = dside[:, head0 + h : head0 + h + 1]
        p_h = jnp.exp2(_per_head(s2, h, block_q) - lse_h)
        ds_h = p_h * (_per_head(dp, h, block_q) - delta_h)
        if deriv is not None:
            # softcap chain rule back to the raw scores
            ds_h = ds_h * _per_head(deriv, h, block_q)
        ds_parts.append(ds_h)
        p_parts.append(p_h)
    if heads == 1:
        return p_parts[0], ds_parts[0]
    return jnp.concatenate(p_parts, axis=0), jnp.concatenate(ds_parts, axis=0)


def _in_band(q_row0, kv_start, block_q, block_k, length, causal, window,
             sinks=0, sink_lo=0):
    band = kv_start < length
    if causal:
        band = jnp.logical_and(band, kv_start <= q_row0 + block_q - 1)
    if window is not None:
        below_ok = kv_start + block_k - 1 >= q_row0 - (window - 1)
        if sinks:
            below_ok = jnp.logical_or(below_ok, kv_start < sinks - sink_lo)
        band = jnp.logical_and(band, below_ok)
    return band


def _dq_kernel(
    lengths_ref,  # (B,) SMEM
    q_off_ref,  # (B,) SMEM
    kv_off_ref,  # (1,) int32 SMEM — global position of kv column 0 (ring CP)
    q_ref,  # (1, G, Bq, D) pre-scaled by sm_scale*log2(e)
    k_ref,  # (1, 1, Bk, D)
    v_ref,  # (1, 1, Bk, D)
    do_ref,  # (1, G, Bq, D)
    lse_ref,  # (1, 1, Bq, G) f32, base-2 units
    delta_ref,  # (1, 1, Bq, G) f32
    dq_ref,  # (1, G, Bq, D) out
    dq_acc,  # (rows, D) f32 scratch
    *,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    causal: bool,
    window: int | None,
    sm_scale: float,
    sinks: int = 0,
    softcap: float | None = None,
):
    rows, g, d = _rows_meta(q_ref, block_q)
    batch = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    length = lengths_ref[batch]
    q_row0 = q_off_ref[batch] + qi * block_q
    kv_start = ki * block_k
    sink_lo = kv_off_ref[0]

    @pl.when(_in_band(q_row0, kv_start, block_q, block_k, length, causal,
                      window, sinks, sink_lo))
    def _accum():
        qm = q_ref[0].reshape(rows, d)
        do_rows = do_ref[0].reshape(rows, d)
        k = k_ref[0, 0]
        # MXU/VPU software pipeline over row chains (same trick as the
        # forward): chain c+1's recompute matmuls are issued before chain
        # c's exp2/mask VPU work so Mosaic can overlap the units.
        chains = _pick_bwd_chains(g)
        hpc = g // chains
        crows = rows // chains

        def dots(c):
            return _tile_dots(
                qm[c * crows : (c + 1) * crows], k, v_ref[0, 0],
                do_rows[c * crows : (c + 1) * crows], softcap=softcap,
            )

        mask = _tile_mask(
            crows, block_q, block_k, q_row0, kv_start, length, causal, window,
            sinks, sink_lo,
        )
        nxt = dots(0)
        for c in range(chains):
            s2, dp, deriv = nxt
            if c + 1 < chains:
                nxt = dots(c + 1)
            _, ds = _tile_elem(
                s2, dp, lse_ref, delta_ref, mask, hpc, block_q, c * hpc,
                deriv=deriv,
            )
            dq_acc[c * crows : (c + 1) * crows] += jax.lax.dot_general(
                ds.astype(k.dtype), k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(ki == num_kv_blocks - 1)
    def _emit():
        dq_ref[0] = (dq_acc[...] * sm_scale).astype(dq_ref.dtype).reshape(
            g, block_q, d
        )


def _dkdv_kernel(
    lengths_ref,
    q_off_ref,
    kv_off_ref,  # (1,) int32 SMEM — global position of kv column 0 (ring CP)
    q_ref,  # (1, G, Bq, D) pre-scaled
    k_ref,  # (1, 1, Bk, D)
    v_ref,  # (1, 1, Bk, D)
    do_ref,  # (1, G, Bq, D)
    lse_ref,  # (1, 1, Bq, G)
    delta_ref,  # (1, 1, Bq, G)
    dk_ref,  # (1, 1, Bk, D) out
    dv_ref,  # (1, 1, Bk, D) out
    dk_acc,  # (Bk, D) f32 scratch
    dv_acc,  # (Bk, D) f32 scratch
    *,
    block_q: int,
    block_k: int,
    num_q_blocks: int,
    causal: bool,
    window: int | None,
    sinks: int = 0,
    softcap: float | None = None,
):
    rows, g, d = _rows_meta(q_ref, block_q)
    batch = pl.program_id(0)
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    length = lengths_ref[batch]
    q_row0 = q_off_ref[batch] + qi * block_q
    kv_start = ki * block_k
    sink_lo = kv_off_ref[0]

    @pl.when(_in_band(q_row0, kv_start, block_q, block_k, length, causal,
                      window, sinks, sink_lo))
    def _accum():
        qm = q_ref[0].reshape(rows, d)
        do_rows = do_ref[0].reshape(rows, d)
        chains = _pick_bwd_chains(g)
        hpc = g // chains
        crows = rows // chains

        def dots(c):
            return _tile_dots(
                qm[c * crows : (c + 1) * crows], k_ref[0, 0], v_ref[0, 0],
                do_rows[c * crows : (c + 1) * crows], softcap=softcap,
            )

        mask = _tile_mask(
            crows, block_q, block_k, q_row0, kv_start, length, causal, window,
            sinks, sink_lo,
        )
        nxt = dots(0)
        for c in range(chains):
            s2, dp, deriv = nxt
            if c + 1 < chains:
                nxt = dots(c + 1)
            p, ds = _tile_elem(
                s2, dp, lse_ref, delta_ref, mask, hpc, block_q, c * hpc,
                deriv=deriv,
            )
            do_c = do_rows[c * crows : (c + 1) * crows]
            qm_c = qm[c * crows : (c + 1) * crows]
            # group-sum over the chain's q-heads happens inside the same
            # contraction (all its rows are in the dot)
            dv_acc[...] += jax.lax.dot_general(
                p.astype(do_c.dtype), do_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk_acc[...] += jax.lax.dot_general(
                ds.astype(qm_c.dtype), qm_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(qi == num_q_blocks - 1)
    def _emit():
        # qm carries sm_scale*LOG2E (undo the LOG2E with LN2) — except under
        # softcap, where qm carries sm_scale only
        dk_fac = 1.0 if softcap is not None else LN2
        dk_ref[0, 0] = (dk_acc[...] * dk_fac).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def flash_prefill_bwd(
    q: jax.Array,  # (B, Hq, Sq, D) UNSCALED
    k: jax.Array,  # (B, Hkv, Skv, D)
    v: jax.Array,
    o: jax.Array,  # (B, Hq, Sq, D) forward output
    lse: jax.Array,  # (B, Hq, Sq) f32, base-2 units (flash_prefill return_lse)
    do: jax.Array,  # (B, Hq, Sq, D) cotangent
    lengths: jax.Array,  # (B,) int32
    q_offsets: jax.Array,  # (B,) int32
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    window: int | None = None,
    sinks: int = 0,
    kv_offset: jax.Array | int = 0,  # global position of k[:, :, 0] (ring CP)
    block_q: int = 1024,  # r4 on-chip sweep winner (1024x1024, 2-6% over 512)
    block_k: int = 1024,
    interpret: bool | None = None,
    softcap: float | None = None,  # Gemma-2 attention logit softcapping
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """dq, dk, dv for flash_prefill via two Pallas passes (see module doc).

    ``softcap``: the forward's lse must come from a softcapped
    flash_prefill run; the recompute applies the same cap and chain-rules
    dS through the tanh derivative."""
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    g = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    if interpret is None:
        interpret = _use_interpret()
    lengths = jnp.minimum(lengths.astype(jnp.int32), skv)
    q_offsets = q_offsets.astype(jnp.int32)
    kv_off = jnp.asarray(kv_offset, jnp.int32).reshape(1)

    # delta_i = rowsum(do_i * o_i): tiny (one f32 per row); XLA fuses it into
    # the reads it already does. Padded rows are zero by construction.
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    # match the forward's pre-scale convention: sm_scale only under softcap
    q_fold = float(sm_scale) if softcap is not None else float(sm_scale) * LOG2E
    q = (q.astype(jnp.float32) * q_fold).astype(q.dtype)

    block_q = min(block_q, max(sq, 8))
    block_k = min(block_k, max(skv, 128))
    sq_p = -(-sq // block_q) * block_q
    skv_p = -(-skv // block_k) * block_k
    if sq_p != sq:
        pad = ((0, 0), (0, 0), (0, sq_p - sq), (0, 0))
        q = jnp.pad(q, pad)
        do = jnp.pad(do, pad)
        # +BIG lse on padded rows -> p == 0 (no NaNs from s2 - lse)
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_p - sq)), constant_values=3e38)
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq)))
    if skv_p != skv:
        pad = ((0, 0), (0, 0), (0, skv_p - skv), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    # (B, Hq, Sq_p) -> (B, Hkv, Sq_p, G): the kernels read per-head sublane
    # columns (lane dim = g), matching the forward's LSE store layout.
    def to_cols(x):
        return x.reshape(b, hkv, g, sq_p).transpose(0, 1, 3, 2)

    lse_c = to_cols(lse.astype(jnp.float32))
    delta_c = to_cols(delta)

    num_q_blocks = sq_p // block_q
    num_kv_blocks = skv_p // block_k
    rows = g * block_q

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    q_spec = lambda perm: pl.BlockSpec(  # noqa: E731
        (1, g, block_q, d), perm, memory_space=pltpu.VMEM
    )
    kv_spec = lambda perm: pl.BlockSpec(  # noqa: E731
        (1, 1, block_k, d), perm, memory_space=pltpu.VMEM
    )
    col_spec = lambda perm: pl.BlockSpec(  # noqa: E731
        (1, 1, block_q, g), perm, memory_space=pltpu.VMEM
    )

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel,
            block_q=block_q,
            block_k=block_k,
            num_kv_blocks=num_kv_blocks,
            causal=causal,
            window=window,
            sinks=sinks,
            sm_scale=float(sm_scale),
            softcap=softcap,
        ),
        grid=(b, hkv, num_q_blocks, num_kv_blocks),
        in_specs=[
            smem,
            smem,
            smem,
            q_spec(lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            kv_spec(lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            kv_spec(lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            q_spec(lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            col_spec(lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            col_spec(lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        ],
        out_specs=q_spec(lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((rows, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lengths, q_offsets, kv_off, q, k, v, do, lse_c, delta_c)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkdv_kernel,
            block_q=block_q,
            block_k=block_k,
            num_q_blocks=num_q_blocks,
            causal=causal,
            window=window,
            sinks=sinks,
            softcap=softcap,
        ),
        grid=(b, hkv, num_kv_blocks, num_q_blocks),
        in_specs=[
            smem,
            smem,
            smem,
            q_spec(lambda bi, hi, ki, qi: (bi, hi, qi, 0)),
            kv_spec(lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            kv_spec(lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            q_spec(lambda bi, hi, ki, qi: (bi, hi, qi, 0)),
            col_spec(lambda bi, hi, ki, qi: (bi, hi, qi, 0)),
            col_spec(lambda bi, hi, ki, qi: (bi, hi, qi, 0)),
        ],
        out_specs=[
            kv_spec(lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            kv_spec(lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, skv_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, hkv, skv_p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lengths, q_offsets, kv_off, q, k, v, do, lse_c, delta_c)

    return dq[:, :, :sq, :], dk[:, :, :skv, :], dv[:, :, :skv, :]


class _FAConfig(NamedTuple):
    causal: bool
    sm_scale: float | None
    window: int | None
    sinks: int
    block_q: int
    block_k: int
    bwd_block_q: int
    bwd_block_k: int
    interpret: bool | None
    softcap: float | None = None


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core(cfg: _FAConfig, q, k, v, lengths, q_offsets):
    return flash_prefill(
        q, k, v, lengths,
        causal=cfg.causal, q_offsets=q_offsets, sm_scale=cfg.sm_scale,
        block_q=cfg.block_q, block_k=cfg.block_k, window=cfg.window,
        sinks=cfg.sinks, interpret=cfg.interpret, softcap=cfg.softcap,
    )


def _flash_core_fwd(cfg: _FAConfig, q, k, v, lengths, q_offsets):
    o, lse = flash_prefill(
        q, k, v, lengths,
        causal=cfg.causal, q_offsets=q_offsets, sm_scale=cfg.sm_scale,
        block_q=cfg.block_q, block_k=cfg.block_k, window=cfg.window,
        sinks=cfg.sinks, interpret=cfg.interpret, return_lse=True,
        softcap=cfg.softcap,
    )
    return o, (q, k, v, lengths, q_offsets, o, lse)


def _flash_core_bwd(cfg: _FAConfig, res, do):
    q, k, v, lengths, q_offsets, o, lse = res
    dq, dk, dv = flash_prefill_bwd(
        q, k, v, o, lse, do, lengths, q_offsets,
        causal=cfg.causal, sm_scale=cfg.sm_scale, window=cfg.window,
        sinks=cfg.sinks, block_q=cfg.bwd_block_q, block_k=cfg.bwd_block_k,
        interpret=cfg.interpret, softcap=cfg.softcap,
    )
    # integer args carry float0 cotangents
    zl = np.zeros(lengths.shape, jax.dtypes.float0)
    zo = np.zeros(q_offsets.shape, jax.dtypes.float0)
    return dq, dk, dv, zl, zo


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jax.Array,  # (B, Hq, Sq, D)
    k: jax.Array,  # (B, Hkv, Skv, D)
    v: jax.Array,
    lengths: jax.Array | None = None,
    *,
    causal: bool = True,
    q_offsets: jax.Array | None = None,
    sm_scale: float | None = None,
    window: int | None = None,
    sinks: int = 0,  # StreamingLLM attention sinks (with window)
    block_q: int = 1024,
    block_k: int = 1024,
    bwd_block_q: int = 1024,
    bwd_block_k: int = 1024,
    interpret: bool | None = None,
    softcap: float | None = None,  # Gemma-2 attention logit softcapping
) -> jax.Array:
    """Differentiable flash attention (training entry point).

    Same semantics and forward kernel as :func:`flash_prefill`, plus a
    ``jax.custom_vjp`` backward built from Pallas kernels — O(S) memory in
    both directions (the forward stashes one f32 LSE per row; the backward
    recomputes score tiles instead of storing the (S, S) matrix).
    """
    b = q.shape[0]
    skv = k.shape[2]
    if lengths is None:
        lengths = jnp.full((b,), skv, jnp.int32)
    if q_offsets is None:
        q_offsets = jnp.zeros((b,), jnp.int32)
    cfg = _FAConfig(
        causal=causal,
        sm_scale=None if sm_scale is None else float(sm_scale),
        window=window,
        sinks=int(sinks),
        block_q=block_q,
        block_k=block_k,
        bwd_block_q=bwd_block_q,
        bwd_block_k=bwd_block_k,
        interpret=interpret,
        softcap=None if softcap is None else float(softcap),
    )
    return _flash_core(cfg, q, k, v, lengths.astype(jnp.int32), q_offsets)
