"""Context-parallel ring attention: sequence-sharded prefill/training attention.

The reference scales sequence length only by splitting the KV of a SINGLE
query token across blocks (flash-decoding, flash_attn.cu:573-586); its prefill
story is nonexistent and its longest context is one device's memory. This
module is the prefill/training half of cross-chip sequence scaling (the decode
half is parallel/distributed_decode.py): Q, K and V are all sharded along the
sequence axis of a mesh, and the KV shards ROTATE around the ring of chips via
``jax.lax.ppermute`` while each chip's resident Q chunk attends every chunk
that passes by. Per-chunk partials are LSE-merged exactly like the reference's
combine kernel (flash_attn.cu:877-935), just across time steps instead of
across splits — the math is the associative flash merge, so the result is
bit-comparable to single-chip flash attention up to f32 merge rounding.

Communication is O(S/n · D) per step on the closed ICI ring (each chip talks
only to its neighbour) and overlaps with the attention compute of the chunk in
hand: the ppermute for step t+1 is issued before step t's kernel, and XLA's
async collectives hide it behind the Pallas call.

Both directions are implemented:

- forward: n ppermute steps of (k, v); running (m, l, acc) merge in f32.
- backward (``jax.custom_vjp``): the SAME ring, but (k, v, dk, dv) travel
  together; each chip adds its (q-chunk x kv-chunk) contribution into the
  travelling dk/dv accumulators using the Pallas backward kernels with the
  GLOBAL LSE (ops/flash_bwd.py), so after n hops every KV shard arrives home
  carrying its complete gradient. dq accumulates locally — no extra traffic.

Causal load balance: with contiguous chunks, chip i only does useful work for
chunks 0..i (a 2x average idle on the causal mask). ``make_ring_prefill``
therefore supports ``balanced=True`` — "zigzag" blocking, where chip i owns q
chunks i and 2n-1-i so every chip does an equal (n+1)/2n share of the causal
band. The permutation is applied/undone OUTSIDE the shard_map at the global
level (a static gather), so ring_attention itself stays oblivious.

Chunk-alignment contract: all chips hold equal-size chunks, so a KV chunk is
either entirely <= the local Q chunk's positions (plain causal / full tiles)
or entirely in its future — in which case the kernel's in-band precheck skips
every tile (flash_prefill's ``kv_start <= q_row0 + block_q - 1`` test with the
negative q_offset). Unequal chunking would break that invariant and is
rejected at trace time.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from starflashattention_tpu.ops.flash_prefill import flash_prefill
from starflashattention_tpu.ops.flash_bwd import flash_prefill_bwd

_BIG = 1e37  # flash_prefill marks empty rows' LSE with +3e38; treat >= _BIG as "no data"
_NEG = -0.7 * float(np.finfo(np.float32).max)


class _RingConfig(NamedTuple):
    axis_name: str
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


def _merge_chunk(acc, m, l, o_t, lse_t):
    """Fold one chunk's normalized output + base-2 LSE into the running
    (acc, m, l) triple — the associative flash merge (reference combine
    semantics, flash_attn.cu:897-925) keyed on log2 units."""
    lse_t = jnp.where(lse_t >= _BIG, _NEG, lse_t)  # empty rows contribute 0
    m_new = jnp.maximum(m, lse_t)
    # guard the all-empty case: m_new == _NEG would make both weights 2^0
    m_safe = jnp.where(m_new <= _NEG, 0.0, m_new)
    r = jnp.exp2(m - m_safe)[..., None]  # exp2(_NEG - m_safe) underflows to 0
    w = jnp.exp2(lse_t - m_safe)[..., None]
    acc = acc * r + o_t.astype(jnp.float32) * w
    l = l * r[..., 0] + w[..., 0]
    return acc, m_new, l


def _ring_forward(cfg: _RingConfig, q, k, v, lengths):
    """n-step KV rotation; returns (o normalized in q.dtype, global base-2 LSE).

    Step t: this chip holds the KV chunk owned by chip (idx - t) mod n, i.e.
    global start ((idx - t) mod n) * C. flash_prefill is called with the
    chunk-relative causal diagonal (q_offsets = my_start - chunk_start) and
    the global lengths clipped into the chunk — identical masking to a
    single-device call restricted to those columns.
    """
    axis = cfg.axis_name
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    b, hq, c_q, d = q.shape
    c_kv = k.shape[2]
    my_start = idx * c_q

    perm = [(i, (i + 1) % n) for i in range(n)]

    acc = jnp.zeros((b, hq, c_q, d), jnp.float32)
    m = jnp.full((b, hq, c_q), _NEG, jnp.float32)
    l = jnp.zeros((b, hq, c_q), jnp.float32)

    k_cur, v_cur = k, v
    for t in range(n):
        if t + 1 < n:
            # issue the rotation for the NEXT step before attending the chunk
            # in hand — no data dependence, so the collective overlaps the
            # Pallas call (BASELINE north-star: comm/compute overlap)
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        chunk_start = (jnp.remainder(idx - t, n)) * c_kv
        o_t, lse_t = flash_prefill(
            q, k_cur, v_cur,
            jnp.clip(lengths - chunk_start, 0, c_kv),
            causal=cfg.causal,
            q_offsets=jnp.full((b,), my_start - chunk_start, jnp.int32),
            sm_scale=cfg.sm_scale,
            window=cfg.window,
            sinks=cfg.sinks,
            kv_offset=chunk_start,
            block_q=cfg.block_q,
            block_k=cfg.block_k,
            interpret=cfg.interpret,
            return_lse=True,
            softcap=cfg.softcap,
        )
        acc, m, l = _merge_chunk(acc, m, l, o_t, lse_t)
        if t + 1 < n:
            k_cur, v_cur = k_nxt, v_nxt

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o = (acc / l_safe[..., None]).astype(q.dtype)
    # global base-2 LSE per row; rows that never saw valid KV keep the
    # +BIG convention the backward kernels expect (p == exp2(s - lse) == 0)
    lse = jnp.where(l > 0.0, m + jnp.log2(jnp.maximum(l, 1e-37)), 3e38)
    return o, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ring_core(cfg: _RingConfig, q, k, v, lengths):
    return _ring_forward(cfg, q, k, v, lengths)[0]


def _ring_core_fwd(cfg, q, k, v, lengths):
    o, lse = _ring_forward(cfg, q, k, v, lengths)
    return o, (q, k, v, lengths, o, lse)


def _ring_core_bwd(cfg, res, do):
    """Ring backward: (k, v, dk, dv) travel together around the SAME ring.

    Each hop, the resident chip adds its (local q block x travelling kv
    chunk) gradient contribution — computed by the Pallas backward kernels
    against the GLOBAL (o, lse, do) — into the travelling accumulators. After
    n hops every chunk is back home ((idx - n) mod n == idx) with its full
    dk/dv. dq needs no communication at all.
    """
    q, k, v, lengths, o, lse = res
    axis = cfg.axis_name
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    b = q.shape[0]
    c_q = q.shape[2]
    c_kv = k.shape[2]
    my_start = idx * c_q
    perm = [(i, (i + 1) % n) for i in range(n)]

    dq_acc = jnp.zeros(q.shape, jnp.float32)
    k_cur, v_cur = k, v
    dk_cur = jnp.zeros(k.shape, jnp.float32)
    dv_cur = jnp.zeros(v.shape, jnp.float32)

    for t in range(n):
        chunk_start = (jnp.remainder(idx - t, n)) * c_kv
        dq_t, dk_t, dv_t = flash_prefill_bwd(
            q, k_cur, v_cur, o, lse, do,
            jnp.clip(lengths - chunk_start, 0, c_kv),
            jnp.full((b,), my_start - chunk_start, jnp.int32),
            causal=cfg.causal,
            sm_scale=cfg.sm_scale,
            window=cfg.window,
            sinks=cfg.sinks,
            kv_offset=chunk_start,
            block_q=cfg.bwd_block_q,
            block_k=cfg.bwd_block_k,
            interpret=cfg.interpret,
            softcap=cfg.softcap,
        )
        dq_acc = dq_acc + dq_t.astype(jnp.float32)
        dk_cur = dk_cur + dk_t.astype(jnp.float32)
        dv_cur = dv_cur + dv_t.astype(jnp.float32)
        # rotate AFTER accumulating so the contribution rides with its chunk;
        # the final hop (t == n-1) brings every chunk home
        k_cur = jax.lax.ppermute(k_cur, axis, perm)
        v_cur = jax.lax.ppermute(v_cur, axis, perm)
        dk_cur = jax.lax.ppermute(dk_cur, axis, perm)
        dv_cur = jax.lax.ppermute(dv_cur, axis, perm)

    zl = np.zeros(lengths.shape, jax.dtypes.float0)
    return dq_acc.astype(q.dtype), dk_cur.astype(k.dtype), dv_cur.astype(v.dtype), zl


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


def ring_attention(
    q: jax.Array,  # (B, Hq, S/n, D) — this chip's query chunk
    k: jax.Array,  # (B, Hkv, S/n, D) — this chip's resident KV chunk
    v: jax.Array,
    lengths: jax.Array | None = None,  # (B,) GLOBAL valid lengths (replicated)
    *,
    axis_name: str,
    causal: bool = True,
    sm_scale: float | None = None,
    window: int | None = None,
    sinks: int = 0,
    block_q: int = 1024,
    block_k: int = 1024,
    bwd_block_q: int = 1024,
    bwd_block_k: int = 1024,
    interpret: bool | None = None,
    softcap: float | None = None,  # Gemma-2 attention logit softcapping
) -> jax.Array:
    """Differentiable ring attention over ``axis_name`` — call inside
    ``shard_map`` with Q/K/V sequence-sharded. Chip i owns positions
    ``[i*C, (i+1)*C)`` of the global sequence (contiguous layout; see
    :func:`make_ring_prefill` for the zigzag-balanced global wrapper).

    Semantically identical to ``flash_attention`` on the gathered arrays;
    GQA, ragged ``lengths``, causal and sliding-``window`` masks all behave
    as if computed on one device.
    """
    if q.shape[2] != k.shape[2]:
        raise ValueError(
            "ring_attention requires equally-chunked Q and KV (got "
            f"q chunk {q.shape[2]}, kv chunk {k.shape[2]}): the future-chunk "
            "skip relies on aligned chunks"
        )
    b = q.shape[0]
    cfg = _RingConfig(
        axis_name=axis_name,
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
    if lengths is None:
        # full sequences: S_global = n * C (n is static inside shard_map)
        lengths = jnp.full((b,), jax.lax.axis_size(axis_name) * k.shape[2], jnp.int32)
    return _ring_core(cfg, q, k, v, lengths.astype(jnp.int32))


def zigzag_permutation(seq_len: int, n: int, chunk: int | None = None) -> np.ndarray:
    """Position permutation for balanced causal ring attention.

    Splits the sequence into 2n blocks and assigns blocks (i, 2n-1-i) to chip
    i, so each chip's causal workload is the same (n+1)/2n share. Returns
    ``perm`` with ``x_balanced = x[..., perm, :]``; invert with
    ``np.argsort(perm)``.
    """
    if seq_len % (2 * n):
        raise ValueError(f"seq_len {seq_len} not divisible by 2n={2*n}")
    blk = seq_len // (2 * n)
    order = []
    for i in range(n):
        order.append(np.arange(i * blk, (i + 1) * blk))
        j = 2 * n - 1 - i
        order.append(np.arange(j * blk, (j + 1) * blk))
    return np.concatenate(order)


def _zigzag_ring(q, k, v, lengths, *, axis_name, n, **kw):
    """Per-chip body for balanced ring attention: the chip's chunk is the
    CONCATENATION of global blocks i and 2n-1-i (already permuted into place
    by the wrapper). Ring attention's alignment contract needs equal aligned
    chunks, so we run the ring at HALF-chunk granularity by treating the two
    blocks as separate q streams against the same rotating KV — every
    (q half-block, kv half-block) pair is either fully-causal or
    fully-skipped, exactly as in the contiguous layout.
    """
    idx = jax.lax.axis_index(axis_name)
    c = q.shape[2] // 2  # half-chunk = one global block
    b = q.shape[0]
    q_lo, q_hi = q[:, :, :c], q[:, :, c:]
    k_lo, k_hi = k[:, :, :c], k[:, :, c:]
    v_lo, v_hi = v[:, :, :c], v[:, :, c:]

    lo_start = idx * c
    hi_start = (2 * n - 1 - idx) * c

    perm = [(i, (i + 1) % n) for i in range(n)]
    causal = kw.get("causal", True)
    sm_scale = kw.get("sm_scale", None)
    window = kw.get("window", None)
    sinks = kw.get("sinks", 0)
    softcap = kw.get("softcap", None)
    interpret = kw.get("interpret", None)
    block_q = kw.get("block_q", 1024)
    block_k = kw.get("block_k", 1024)

    d = q.shape[3]
    hq = q.shape[1]
    state = []
    for _ in range(2):  # one merge state per local q block
        state.append(
            (
                jnp.zeros((b, hq, c, d), jnp.float32),
                jnp.full((b, hq, c), _NEG, jnp.float32),
                jnp.zeros((b, hq, c), jnp.float32),
            )
        )

    k_cur, v_cur = k, v
    for t in range(n):
        if t + 1 < n:
            k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        chunk_owner = jnp.remainder(idx - t, n)
        kv_lo_start = chunk_owner * c
        kv_hi_start = (2 * n - 1 - chunk_owner) * c
        for qi, (q_blk, q_start) in enumerate(((q_lo, lo_start), (q_hi, hi_start))):
            for kv_blk_pair, kv_start in (
                ((k_cur[:, :, :c], v_cur[:, :, :c]), kv_lo_start),
                ((k_cur[:, :, c:], v_cur[:, :, c:]), kv_hi_start),
            ):
                kb, vb = kv_blk_pair
                o_t, lse_t = flash_prefill(
                    q_blk, kb, vb,
                    jnp.clip(lengths - kv_start, 0, c),
                    causal=causal,
                    q_offsets=jnp.full((b,), q_start - kv_start, jnp.int32),
                    sm_scale=sm_scale,
                    window=window,
                    sinks=sinks,
                    softcap=softcap,
                    kv_offset=kv_start,
                    block_q=block_q,
                    block_k=block_k,
                    interpret=interpret,
                    return_lse=True,
                )
                acc, m, l = state[qi]
                state[qi] = _merge_chunk(acc, m, l, o_t, lse_t)
        if t + 1 < n:
            k_cur, v_cur = k_nxt, v_nxt

    outs = []
    for acc, m, l in state:
        l_safe = jnp.where(l == 0.0, 1.0, l)
        outs.append((acc / l_safe[..., None]).astype(q.dtype))
    return jnp.concatenate(outs, axis=2)


def make_ring_prefill(
    mesh: Mesh,
    *,
    seq_axis: str = "model",
    causal: bool = True,
    sm_scale: float | None = None,
    window: int | None = None,
    sinks: int = 0,
    balanced: bool = False,
    block_q: int = 1024,
    block_k: int = 1024,
    differentiable: bool = False,
):
    """Build ``fn(q, k, v, lengths) -> o`` over GLOBAL (B, H, S, D) arrays
    with the sequence dim sharded on ``seq_axis`` — the cross-chip prefill
    counterpart of :func:`parallel.distributed_decode.make_seq_sharded_decode`.

    ``balanced=True`` applies the zigzag block permutation outside the
    shard_map so the causal workload is even across the ring (contiguous
    chunking leaves chip 0 ~2x idle). The permutation is undone on the
    output; K/V layouts are permuted identically so the caller never sees it.

    ``differentiable=True`` returns the custom-vjp ring (contiguous layout
    only for now) for use under ``jax.grad`` — the training entry point.
    """
    n = mesh.shape[seq_axis]
    kw = dict(
        causal=causal, sm_scale=sm_scale, window=window, sinks=sinks,
        block_q=block_q, block_k=block_k,
    )

    if balanced and differentiable:
        raise NotImplementedError(
            "balanced zigzag layout is forward-only; use balanced=False for "
            "training (the bwd ring uses the contiguous layout)"
        )

    spec = P(None, None, seq_axis, None)

    if not balanced:
        def body(q, k, v, lengths):
            return ring_attention(
                q, k, v, lengths, axis_name=seq_axis, **kw
            )

        sharded = jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec, spec, spec, P()),
            out_specs=spec, check_vma=False,
        )
        return jax.jit(sharded)

    def body(q, k, v, lengths):
        return _zigzag_ring(q, k, v, lengths, axis_name=seq_axis, n=n, **kw)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec, check_vma=False,
    )
    sharded = jax.jit(sharded)

    def fn(q, k, v, lengths):
        s = q.shape[2]
        perm = zigzag_permutation(s, n)
        inv = np.argsort(perm)
        o = sharded(q[:, :, perm], k[:, :, perm], v[:, :, perm], lengths)
        return o[:, :, inv]

    return fn
