"""Ulysses-style sequence parallelism: all-to-all head/sequence exchange.

The second context-parallel strategy next to ring attention
(parallel/ring.py), after DeepSpeed-Ulysses: instead of rotating KV chunks
around the ring (n ppermute hops, O(S/n·D) each), ONE all-to-all per tensor
re-shards [sequence-sharded, all heads] -> [head-sharded, full sequence],
the attention kernel runs entirely locally on its H/n heads (no
communication inside the softmax), and one all-to-all brings the output
back to sequence sharding.

Trade-offs vs the ring (why both exist):

- Ulysses: 4 all-to-alls total (q, k, v, o), each O(B·H·S·D / n²) per link
  — cheaper than the ring's n·O(S/n·D) KV traffic when the fabric has good
  all-to-all bandwidth, and the kernel sees the FULL sequence (no per-chunk
  launch overhead — the ring's measured short-chunk tax at n=8,
  `ring_chunk_overhead_*`).
- Ring: parallelism is unbounded (any n), memory stays O(S/n) for K/V too,
  and only neighbour links are used. Ulysses caps n at the KV-head count
  (GQA: Hkv must divide n... n must divide Hkv) and each chip holds the
  full-sequence K/V of its head slice.

GQA alignment: splitting the Hq axis into n chunks keeps every query head
with its KV head — chunk i holds q heads [i·Hq/n, (i+1)·Hq/n) and kv heads
[i·Hkv/n, (i+1)·Hkv/n), and Hq/n / (Hq/Hkv) = Hkv/n, so the in-chunk
head->group mapping is exactly the single-chip one. Requires n | Hkv.

Differentiable for free: ``jax.lax.all_to_all`` transposes to another
all-to-all and the local kernel is the ``flash_attention`` custom_vjp, so
``jax.grad`` through a shard_map'd Ulysses attention is exact (asserted in
tests/test_ulysses.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from starflashattention_tpu.ops.flash_bwd import flash_attention
from starflashattention_tpu.ops.flash_prefill import flash_prefill


def _check_heads(hq: int, hkv: int, n: int) -> None:
    if hkv % n:
        raise ValueError(
            f"Ulysses needs the axis size ({n}) to divide num_kv_heads "
            f"({hkv}) — use ring attention (parallel/ring.py) beyond that"
        )
    assert hq % hkv == 0


def ulysses_attention(
    q: jax.Array,  # (B, Hq, S/n, D) — this chip's sequence chunk, ALL heads
    k: jax.Array,  # (B, Hkv, S/n, D)
    v: jax.Array,
    lengths: jax.Array | None = None,  # (B,) GLOBAL valid lengths
    *,
    axis_name: str,
    causal: bool = True,
    sm_scale: float | None = None,
    window: int | None = None,
    sinks: int = 0,
    differentiable: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Sequence-parallel attention via head/sequence all-to-all — call
    inside ``shard_map`` with Q/K/V sequence-sharded (same layout the ring
    takes). Returns the (B, Hq, S/n, D) output chunk.

    ``differentiable=True`` routes the local kernel through the
    ``flash_attention`` custom_vjp (training); the all-to-alls differentiate
    by transposition either way.
    """
    n = jax.lax.axis_size(axis_name)
    b, hq, c, d = q.shape
    hkv = k.shape[1]
    _check_heads(hq, hkv, n)
    if lengths is None:
        lengths = jnp.full((b,), n * c, jnp.int32)

    def fwd_a2a(x):
        # [seq-sharded, all heads] -> [head-sharded, full seq]
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True
        )

    q2, k2, v2 = fwd_a2a(q), fwd_a2a(k), fwd_a2a(v)
    fn = flash_attention if differentiable else flash_prefill
    o2 = fn(
        q2, k2, v2, lengths,
        causal=causal, sm_scale=sm_scale, window=window, sinks=sinks,
        interpret=interpret,
    )
    # back: [head-sharded, full seq] -> [seq-sharded, all heads]
    return jax.lax.all_to_all(
        o2, axis_name, split_axis=2, concat_axis=1, tiled=True
    )


def make_ulysses_prefill(
    mesh: Mesh,
    *,
    seq_axis: str = "model",
    causal: bool = True,
    sm_scale: float | None = None,
    window: int | None = None,
    sinks: int = 0,
):
    """Build ``fn(q, k, v, lengths) -> o`` over GLOBAL (B, H, S, D) arrays
    with the sequence dim sharded on ``seq_axis`` — drop-in alternative to
    :func:`parallel.ring.make_ring_prefill` on all-to-all-friendly meshes."""
    spec = P(None, None, seq_axis, None)

    def body(q, k, v, lengths):
        return ulysses_attention(
            q, k, v, lengths, axis_name=seq_axis,
            causal=causal, sm_scale=sm_scale, window=window, sinks=sinks,
        )

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec, check_vma=False,
    )
    return jax.jit(sharded)
