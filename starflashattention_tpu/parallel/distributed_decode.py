"""Cross-chip split-KV flash decode: sequence-sharded KV + collective merge.

The reference's headline idea — split the KV sequence across parallel workers
and LSE-merge the partials (flash_attn.cu grid dim y + flash_combine_kernel,
:877-935) — generalized ACROSS chips: each chip holds a contiguous KV-sequence
shard, runs the local split-KV kernel (which emits unnormalized (o, m, l)
exactly in the cross-chip-combinable form), and the merge is a pmax + two
psums of tiny (B, H[, D]) tensors over ICI, instead of a second kernel launch.

This is how a context longer than one chip's HBM decodes: sequence scaling by
sharding, communication O(D) per (batch, head) — not O(S).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from starflashattention_tpu.ops.flash_decode import flash_decode_with_stats, lse_combine_splits


def merge_partials_across_chips(
    o_local: jax.Array,  # (B, Hq, D) unnormalized local partial
    m_local: jax.Array,  # (B, Hq)
    l_local: jax.Array,  # (B, Hq)
    axis_name: str,
    out_dtype=None,
) -> jax.Array:
    """LSE-merge partial attention results across the ``axis_name`` chips —
    the distributed flash_combine (SURVEY.md §2 row 2.2, TPU-equivalent
    column).

    TWO collectives, not three: the payload is latency-bound (a few KB per
    (batch, head)), so ``l`` rides as an extra lane of the ``o`` psum —
    pmax(m) then one psum of the packed (B, Hq, D+1) tensor. Measured on the
    8-device mesh this removes a third of the merge's collective launches
    (benchmarks/collective_cost.py)."""
    m_global = jax.lax.pmax(m_local, axis_name)  # (B, Hq)
    alpha = jnp.exp(m_local - m_global)
    packed = jnp.concatenate(
        [alpha[..., None] * o_local, (alpha * l_local)[..., None]], axis=-1
    )  # (B, Hq, D+1)
    packed = jax.lax.psum(packed, axis_name)
    o_global, l_global = packed[..., :-1], packed[..., -1]
    l_safe = jnp.where(l_global == 0.0, 1.0, l_global)
    o = o_global / l_safe[..., None]
    return o.astype(out_dtype) if out_dtype is not None else o


def _local_decode(
    q, k_shard, v_shard, lengths, shard_start, *, axis_name, num_splits, block_k,
    k_scales=None, v_scales=None,
):
    """Per-chip body: attend the local KV shard with lengths clipped to it,
    then merge partials over the sequence axis."""
    s_shard = k_shard.shape[2]
    # Valid positions inside THIS shard: global length minus the shard's
    # start, clipped to [0, s_shard]. A shard fully beyond a sequence's
    # length contributes (m=-inf-like, l=0) and drops out of the merge.
    local_len = jnp.clip(lengths - shard_start, 0, s_shard)
    o, m, l = flash_decode_with_stats(
        q, k_shard, v_shard, local_len,
        num_splits=num_splits, block_k=block_k,
        k_scales=k_scales, v_scales=v_scales,
    )
    o, m, l = lse_reduce_local(o, m, l)
    return merge_partials_across_chips(o, m, l, axis_name, out_dtype=q.dtype)


def lse_reduce_local(o_parts, m_parts, l_parts):
    """Collapse the intra-chip split axis to one (o, m, l) triple per
    (batch, head) before the cross-chip merge."""
    m_local = jnp.max(m_parts, axis=-1)  # (B, H)
    alpha = jnp.exp(m_parts - m_local[..., None])
    l_local = jnp.sum(alpha * l_parts, axis=-1)
    o_local = jnp.einsum("bhn,bhnd->bhd", alpha, o_parts)
    return o_local, m_local, l_local


def make_seq_sharded_decode(
    mesh: Mesh,
    *,
    seq_axis: str = "model",
    num_splits: int = 4,
    block_k: int = 256,
    quantized: bool = False,
    head_chunks: int = 1,
):
    """Build ``fn(q, k_cache, v_cache, lengths[, k_scales, v_scales]) -> o``
    with the KV cache sequence-sharded over ``seq_axis`` and q replicated.

    k_cache/v_cache: (B, Hkv, S_total, D) global; each chip sees
    S_total / axis_size contiguous positions.

    ``head_chunks > 1`` = collective/compute OVERLAP (BASELINE north-star:
    "collectives overlapped with attention compute"): the KV heads are
    processed in ``head_chunks`` independent slices, so chunk i's merge
    collective is in flight while chunk i+1's attention kernel runs — the
    psums and the Pallas calls have no data dependence, and XLA's async
    collectives + latency-hiding scheduler interleave them on TPU. Chunking
    does not change the math (heads are independent); it only shortens the
    exposed (non-overlapped) communication to roughly one chunk's merge.
    """
    n_shards = mesh.shape[seq_axis]

    def body(q, k_shard, v_shard, lengths, k_scales=None, v_scales=None):
        idx = jax.lax.axis_index(seq_axis)
        s_shard = k_shard.shape[2]
        shard_start = idx * s_shard
        hkv = k_shard.shape[1]
        g = q.shape[1] // hkv
        if head_chunks == 1 or hkv % head_chunks:
            return _local_decode(
                q, k_shard, v_shard, lengths, shard_start,
                axis_name=seq_axis, num_splits=num_splits, block_k=block_k,
                k_scales=k_scales, v_scales=v_scales,
            )
        per = hkv // head_chunks
        outs = []
        for c in range(head_chunks):
            kv_sl = slice(c * per, (c + 1) * per)
            q_sl = slice(c * per * g, (c + 1) * per * g)
            outs.append(
                _local_decode(
                    q[:, q_sl], k_shard[:, kv_sl], v_shard[:, kv_sl],
                    lengths, shard_start,
                    axis_name=seq_axis, num_splits=num_splits, block_k=block_k,
                    k_scales=None if k_scales is None else k_scales[kv_sl],
                    v_scales=None if v_scales is None else v_scales[kv_sl],
                )
            )
        return jnp.concatenate(outs, axis=1)

    if quantized:
        in_specs = (P(), P(None, None, seq_axis, None), P(None, None, seq_axis, None), P(), P(), P())
        fn = body
    else:
        in_specs = (P(), P(None, None, seq_axis, None), P(None, None, seq_axis, None), P())
        fn = lambda q, k, v, lengths: body(q, k, v, lengths)

    sharded = jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
    )
    return jax.jit(sharded)
