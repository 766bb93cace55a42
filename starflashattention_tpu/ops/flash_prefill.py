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
- MXU/VPU software pipelining: at D=128 each score element costs ~512 MXU
  FLOPs and ~10 VPU ops — near-equal time on v5e — so a kernel that
  serializes [QK -> softmax -> PV] per tile caps at ~0.5 of the MXU peak.
  The q rows are split into up to 4 independent online-softmax CHAINS (each
  with its own (m, l, acc) scratch) and the ops are issued
  [QK(0), QK(1), softmax(0), PV(0), QK(2), softmax(1), ...] so Mosaic can
  run chain c's softmax on the VPU while chain c+1's matmul occupies the
  MXU. Measured (benchmarks/exp_prefill.py, v5e, B=1 Hq=32 Hkv=8 D=128):
  0.53 -> 0.65 of MXU peak at seq 8192, 0.40 -> 0.44 at seq 2048.
- base-2 softmax: sm_scale * log2(e) is folded into q OUTSIDE the kernel and
  the online softmax runs in exp2/log2 units (the VPU's native
  transcendental; saves the per-element scale multiply). The LSE math is
  identical in any base.

GQA head mapping (q head h -> KV head h // G) matches ops/flash_decode.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
LOG2E = math.log2(math.e)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_chains(rows: int) -> int:
    """Independent softmax chains: enough to overlap VPU with MXU, but keep
    each chain's matmul >= 256 rows so the MXU stays well fed."""
    for c in (4, 2):
        if rows % c == 0 and rows // c >= 256:
            return c
    return 1


def _prefill_kernel(
    lengths_ref,  # (B,) int32 SMEM — full array, indexed by program_id
    q_off_ref,  # (B,) int32 SMEM — absolute position of q row 0 per sequence
    kv_off_ref,  # (1,) int32 SMEM — global position of kv column 0 (ring CP)
    win_ref,  # (1,) int32 SMEM — dynamic window (read iff dyn_window)
    q_ref,  # (1, G, Bq, D) — pre-scaled by sm_scale * log2(e)
    #       (by sm_scale ONLY when softcap is set — see qk())
    k_ref,  # (1, 1, Bk, D)
    v_ref,  # (1, 1, Bk, D)
    o_ref,  # (1, G, Bq, D)
    *rest,  # [lse_ref (1, G, Bq) if with_lse] + per chain: m (rows_c, LANES)
    #         f32, l (rows_c, LANES) f32, acc (rows_c, D) f32 — interleaved
    group: int,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    causal: bool,
    chains: int,
    window,  # static int | None; ignored when dyn_window (win_ref wins)
    dyn_window: bool = False,
    sinks: int = 0,
    with_lse: bool = False,
    softcap: float | None = None,
):
    if dyn_window:
        # Gemma-2 alternating layers: the per-layer window is a TRACED
        # scalar operand; every use below is vector arithmetic, so it
        # drops in where the static int went.
        window = win_ref[0]
    lse_ref, scratch = (rest[0], rest[1:]) if with_lse else (None, rest)
    m_ss = scratch[0::3]
    l_ss = scratch[1::3]
    acc_ss = scratch[2::3]
    batch = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    rows = group * block_q
    sub = rows // chains

    @pl.when(ki == 0)
    def _init():
        for c in range(chains):
            m_ss[c][...] = jnp.full_like(m_ss[c], NEG_INF)
            l_ss[c][...] = jnp.zeros_like(l_ss[c])
            acc_ss[c][...] = jnp.zeros_like(acc_ss[c])

    length = lengths_ref[batch]
    offset = q_off_ref[batch]
    # chunk-local -> global kv position shift (nonzero only under ring CP);
    # the window/causal clauses are translation-invariant (row - col), but
    # the sink boundary is ABSOLUTE, so it must shift with the chunk
    sink_lo = kv_off_ref[0]
    kv_start = ki * block_k
    q_row0 = offset + qi * block_q  # absolute position of this tile's row 0

    if causal:
        # Skip KV tiles entirely above the diagonal: the last q row of this
        # tile sits at absolute position q_row0 + block_q - 1.
        in_band = kv_start <= q_row0 + block_q - 1
    else:
        in_band = True
    if window is not None:
        # sliding window: skip tiles entirely BELOW the band — every column
        # of the tile precedes even the first q row's window start. With
        # attention sinks, tiles holding sink columns always run.
        below_ok = kv_start + block_k - 1 >= q_row0 - (window - 1)
        if sinks:
            below_ok = jnp.logical_or(below_ok, kv_start < sinks - sink_lo)
        in_band = jnp.logical_and(in_band, below_ok)
    should_run = jnp.logical_and(in_band, kv_start < length)
    # Interior tiles need no masking: every kv column is <= every q row
    # (fully below the diagonal) and < length.
    no_mask = kv_start + block_k <= length
    if causal:
        no_mask = jnp.logical_and(no_mask, kv_start + block_k - 1 <= q_row0)
    if window is not None:
        # ... and inside every row's window (or entirely inside the sinks)
        win_ok = kv_start >= q_row0 + block_q - 1 - (window - 1)
        if sinks:
            win_ok = jnp.logical_or(win_ok, kv_start + block_k <= sinks - sink_lo)
        no_mask = jnp.logical_and(no_mask, win_ok)

    def _attend(masked: bool):
        d = q_ref.shape[-1]
        q_all = q_ref[0].reshape(rows, d)
        k = k_ref[0, 0]  # (Bk, D)
        v = v_ref[0, 0]

        def qk(c):
            s = jax.lax.dot_general(
                q_all[c * sub:(c + 1) * sub],
                k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (sub, Bk) — already in log2 units (q pre-scaled)
            if softcap is not None:
                # q was pre-scaled by sm_scale ONLY in this mode: cap the
                # natural-units scores, then convert to the kernel's base-2
                # softmax units (Gemma-2 attn_logit_softcapping)
                s = (softcap * LOG2E) * jnp.tanh(s * (1.0 / softcap))
            if masked:
                col = kv_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                mask = col < length
                if causal or window is not None:
                    # row position inside the q block; the flattened row
                    # index is head-major so rem() recovers it for any chain
                    # split
                    row = q_row0 + jax.lax.rem(
                        c * sub
                        + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0),
                        block_q,
                    )
                    if causal:
                        mask = jnp.logical_and(mask, col <= row)
                    if window is not None:
                        w_ok = col > row - window
                        if sinks:
                            w_ok = jnp.logical_or(w_ok, col < sinks - sink_lo)
                        mask = jnp.logical_and(mask, w_ok)
                s = jnp.where(mask, s, NEG_INF)
            return s

        def softmax(s, c):
            m_prev = m_ss[c][...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            l_ss[c][...] = alpha * l_ss[c][...] + jnp.sum(p, axis=1, keepdims=True)
            m_ss[c][...] = m_next
            return p, alpha

        def pv(p, alpha, c):
            out = jax.lax.dot_general(
                p.astype(v.dtype),
                v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ss[c][...] = acc_ss[c][...] * alpha[:, :1] + out

        # software pipeline: issue chain c+1's QK before chain c's softmax
        # so the MXU (matmuls) and VPU (softmax) overlap across chains
        s_next = qk(0)
        for c in range(chains):
            s_cur = s_next
            if c + 1 < chains:
                s_next = qk(c + 1)
            p, a = softmax(s_cur, c)
            pv(p, a, c)

    @pl.when(jnp.logical_and(should_run, no_mask))
    def _attend_fast():
        _attend(masked=False)

    @pl.when(jnp.logical_and(should_run, jnp.logical_not(no_mask)))
    def _attend_masked():
        _attend(masked=True)

    @pl.when(ki == num_kv_blocks - 1)
    def _emit():
        # the wrapper guarantees sub % block_q == 0 (chain boundaries fall
        # on whole heads of the output tile)
        heads_per_chain = sub // block_q
        for c in range(chains):
            l = l_ss[c][:, :1]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o = (acc_ss[c][...] / l_safe).astype(o_ref.dtype)
            o_ref[0, pl.dslice(c * heads_per_chain, heads_per_chain)] = (
                o.reshape(heads_per_chain, block_q, o_ref.shape[-1])
            )
        if lse_ref is not None:
            for c in range(chains):
                l = l_ss[c][:, :1]
                m = m_ss[c][:, :1]
                # base-2 LSE of the (pre-scaled) scores; rows that saw no
                # valid KV (l == 0: padding, zero-length seqs) get +BIG so
                # the backward's exp2(s - lse) recompute yields exactly 0.
                lse = jnp.where(l > 0.0, m + jnp.log2(jnp.maximum(l, 1e-37)), 3e38)
                # per-head SUBLANE column stores into the (block_q, g) tile:
                # the scratch column vector never crosses into the lane dim
                # (a (sub,1)->(heads,block_q) reshape would be a relayout).
                for h in range(heads_per_chain):
                    head = c * heads_per_chain + h
                    lse_ref[0, 0, :, pl.dslice(head, 1)] = lse[
                        h * block_q : (h + 1) * block_q, :
                    ]


def flash_prefill(
    q: jax.Array,  # (B, Hq, Sq, D)
    k: jax.Array,  # (B, Hkv, Skv, D)
    v: jax.Array,
    lengths: jax.Array | None = None,  # (B,) valid KV length
    *,
    causal: bool = True,
    q_offsets: jax.Array | None = None,  # (B,) absolute position of q[:, :, 0]
    sm_scale: float | None = None,
    block_q: int = 1024,
    block_k: int = 1024,
    window=None,  # sliding window in rows: int, or traced scalar (Gemma-2)
    sinks: int = 0,  # StreamingLLM attention sinks (first-k positions)
    kv_offset: jax.Array | int = 0,  # global position of k[:, :, 0] (ring CP)
    chains: int | None = None,  # softmax-chain count override (None = auto)
    interpret: bool | None = None,
    return_lse: bool = False,  # also return per-row base-2 LSE (B, Hq, Sq)
    softcap: float | None = None,  # Gemma-2 attention logit softcapping
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """Blockwise causal prefill attention → (B, Hq, Sq, D).

    ``q_offsets`` shifts each sequence's causal diagonal: queries are a chunk
    starting at that absolute position in the KV timeline (chunked prefill /
    multi-token decode against a cache). Q heads must be grouped by KV head
    (head h attends KV head ``h // (Hq//Hkv)``).

    Default tiles are the r4 on-chip sweep winner (B=1 7B-GQA shapes,
    block_q=block_q=1024, 4 chains): 0.47 / 0.61 / 0.72 of the bf16 MXU
    peak at seq 2k/4k/8k. The measured ceiling at 2k is matmul-shape
    physics, not scheduling: a lone (2048,128)x(128,1024) QK-shaped dot
    runs at 0.62 of peak and a (2048,1024)x(1024,128) PV-shaped dot at
    0.43 (D=128 output starves the MXU pipe) even as plain XLA ops, and
    causal tiling at 2k adds ~1.5x band waste ((block_q+block_k)/seq).
    The chain interleave already recovers per-tile efficiency ~0.73 —
    ABOVE either raw dot — by filling PV drain bubbles with the next
    chain's QK. Alternatives measured and rejected on chip (r4): smaller
    tiles (0.24-0.36), KV-head-batched cells (0.18-0.49 — Mosaic lowers
    batched dots poorly in-kernel), multi-q-block cells (compile blowup),
    transposed-PV layout (0.34-0.43 raw).
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
    kv_off = jnp.asarray(kv_offset, jnp.int32).reshape(1)

    # Fold sm_scale and the base-2 conversion into q once (f32 mul, then back
    # to the compute dtype) — the kernel's softmax runs in exp2 units. With
    # softcap, fold sm_scale ONLY: the cap must see natural-units scores
    # (the kernel converts to base-2 after capping).
    q_fold = float(sm_scale) if softcap is not None else float(sm_scale) * LOG2E
    q = (q.astype(jnp.float32) * q_fold).astype(q.dtype)

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

    rows = g * block_q
    if chains is None:
        chains = _pick_chains(rows)
    # chain boundaries must fall on whole (head, block_q) rows for the
    # output writeback slices
    while chains > 1 and (rows // chains) % block_q:
        chains //= 2
    sub = rows // chains

    if sinks and window is None:
        raise ValueError("attention sinks require a sliding window")
    dyn_window = isinstance(window, jax.Array)
    if dyn_window and sinks:
        raise ValueError("attention sinks need a STATIC window")
    win_arr = (
        window.astype(jnp.int32).reshape(1) if dyn_window
        else jnp.zeros((1,), jnp.int32)
    )
    kernel = functools.partial(
        _prefill_kernel,
        group=g,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
        causal=causal,
        chains=chains,
        window=None if dyn_window else window,
        dyn_window=dyn_window,
        sinks=sinks,
        with_lse=return_lse,
        softcap=softcap,
    )

    scratch = []
    for _ in range(chains):
        scratch += [
            pltpu.VMEM((sub, LANES), jnp.float32),
            pltpu.VMEM((sub, LANES), jnp.float32),
            pltpu.VMEM((sub, d), jnp.float32),
        ]

    out_specs = pl.BlockSpec(
        (1, g, block_q, d),
        lambda bi, hi, qi, ki: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((b, hq, sq_p, d), q.dtype)
    if return_lse:
        # base-2 LSE of the PRE-SCALED scores, one f32 per (b, head, q row):
        # exactly what the backward's softmax recompute needs. Stored
        # (B, Hkv, Sq_p, G): the block's trailing dims are (block_q, g) — q
        # rows on sublanes (matching the kernel's per-head column vectors),
        # the small group dim on lanes covering its full array extent.
        out_specs = [
            out_specs,
            pl.BlockSpec(
                (1, 1, block_q, g),
                lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((b, hkv, sq_p, g), jnp.float32),
        ]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lengths, q_offsets, kv_off, win_arr, q, k, v)

    if return_lse:
        o, lse = out
        # (B, Hkv, Sq_p, G) -> (B, Hq, Sq); q head H = hkv * g + (H % g)
        lse = lse.transpose(0, 1, 3, 2).reshape(b, hq, sq_p)
        return o[:, :, :sq, :], lse[:, :, :sq]
    return out[:, :, :sq, :]
