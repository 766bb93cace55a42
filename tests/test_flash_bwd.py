"""Differentiable flash attention (ops/flash_bwd) vs jnp autodiff reference.

The reference repo has no backward at all (SURVEY.md: no training); the spec
here is jax.grad of the plain-jnp attention math — the same golden-twin
strategy the forward kernels use (tests/test_flash_prefill.py), extended
through autodiff.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.ops.flash_bwd import flash_attention
from starflashattention_tpu.ops.flash_prefill import flash_prefill


def ref_attn(q, k, v, lengths, causal=True, window=None, q_offsets=None):
    B, Hq, Sq, D = q.shape
    Hkv, Skv = k.shape[1], k.shape[2]
    g = Hq // Hkv
    kq = jnp.repeat(k, g, 1)
    vq = jnp.repeat(v, g, 1)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q, kq) / math.sqrt(D)
    col = jnp.arange(Skv)[None, None, None, :]
    row = jnp.arange(Sq)[None, None, :, None]
    if q_offsets is not None:
        row = row + q_offsets[:, None, None, None]
    mask = col < lengths[:, None, None, None]
    if causal:
        mask = mask & (col <= row)
    if window is not None:
        mask = mask & (col > row - window)
    sc = jnp.where(mask, sc, -1e30)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1), vq)


def grads(fn, *args):
    return jax.grad(fn, argnums=(0, 1, 2))(*args)


def assert_close(got, want, tol=2e-5):
    for a, b, n in zip(got, want, ["dq", "dk", "dv"]):
        denom = float(jnp.abs(b).max()) + 1e-9
        err = float(jnp.abs(a - b).max()) / denom
        assert err < tol, (n, err)


@pytest.mark.parametrize(
    "B,Hq,Hkv,S,D,causal,window",
    [
        (2, 4, 2, 48, 32, True, None),
        (1, 2, 2, 33, 32, False, None),  # non-divisible seq -> padding path
        (2, 8, 2, 64, 32, True, 16),  # sliding window
        (2, 4, 1, 40, 32, True, None),  # MQA
    ],
)
def test_grads_match_reference(rng, B, Hq, Hkv, S, D, causal, window):
    q = jnp.asarray(rng.standard_normal((B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    lengths = jnp.asarray([S, max(1, S - 13)][:B], jnp.int32)
    W = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
    # loss reads only valid rows (rows past a sequence's length are
    # unspecified for both implementations)
    rowmask = (jnp.arange(S)[None, :] < lengths[:, None])[:, None, :, None]

    def loss_flash(q, k, v):
        o = flash_attention(
            q, k, v, lengths, causal=causal, window=window,
            block_q=16, block_k=16, bwd_block_q=16, bwd_block_k=16,
        )
        return jnp.sum(jnp.where(rowmask, o, 0.0) * W)

    def loss_ref(q, k, v):
        o = ref_attn(q, k, v, lengths, causal=causal, window=window)
        return jnp.sum(jnp.where(rowmask, o, 0.0) * W)

    assert_close(grads(loss_flash, q, k, v), grads(loss_ref, q, k, v))


def test_grads_chunked_q_offsets(rng):
    """Chunked-prefill training: q is a chunk at an absolute offset in the
    KV timeline (the causal diagonal shifts by q_offsets)."""
    B, Hq, Hkv, Sq, Skv, D = 2, 4, 2, 16, 64, 32
    q = jnp.asarray(rng.standard_normal((B, Hq, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, Skv, D)), jnp.float32)
    offs = jnp.asarray([10, 32], jnp.int32)
    lengths = offs + Sq
    W = jnp.asarray(rng.standard_normal((D,)), jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention(
            q, k, v, lengths, q_offsets=offs,
            block_q=16, block_k=16, bwd_block_q=16, bwd_block_k=16,
        )
        return jnp.sum(o * W)

    def loss_ref(q, k, v):
        return jnp.sum(ref_attn(q, k, v, lengths, q_offsets=offs) * W)

    assert_close(grads(loss_flash, q, k, v), grads(loss_ref, q, k, v))


def test_forward_value_unchanged(rng):
    """flash_attention's primal equals flash_prefill exactly (same kernel)."""
    B, Hq, Hkv, S, D = 2, 4, 2, 48, 32
    q = jnp.asarray(rng.standard_normal((B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    lengths = jnp.asarray([S, 20], jnp.int32)
    a = flash_attention(q, k, v, lengths, block_q=16, block_k=16)
    b = flash_prefill(q, k, v, lengths, block_q=16, block_k=16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_lse_matches_reference(rng):
    B, Hq, Hkv, S, D = 2, 4, 2, 48, 32
    g = Hq // Hkv
    q = jnp.asarray(rng.standard_normal((B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    lengths = jnp.asarray([S, 20], jnp.int32)
    _, lse = flash_prefill(q, k, v, lengths, return_lse=True, block_q=16, block_k=16)
    kq = jnp.repeat(k, g, 1)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q, kq) / math.sqrt(D) * math.log2(math.e)
    pos = jnp.arange(S)
    mask = (pos[None, :] <= pos[:, None])[None, None] & (
        pos[None, None, None, :] < lengths[:, None, None, None]
    )
    sc = jnp.where(mask, sc, -jnp.inf)
    m = sc.max(-1)
    want = jnp.log2(jnp.sum(jnp.exp2(sc - m[..., None]), -1)) + m
    valid = mask.any(-1)
    err = jnp.where(valid, jnp.abs(lse - want), 0.0)
    assert float(err.max()) < 1e-5
    # rows with no valid KV must carry +BIG (backward recompute -> p == 0)
    assert bool((jnp.where(~valid, lse, 3e38) > 1e38).all())


def test_train_step_lowers_loss(rng):
    """One SGD step through flash_attention decreases a small regression
    loss — the end-to-end 'can I train with this' smoke test."""
    B, Hq, Hkv, S, D = 2, 4, 2, 32, 32
    q0 = jnp.asarray(0.1 * rng.standard_normal((B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((B, Hq, S, D)), jnp.float32)

    def loss(q):
        o = flash_attention(q, k, v, block_q=16, block_k=16,
                            bwd_block_q=16, bwd_block_k=16)
        return jnp.mean((o - tgt) ** 2)

    l0, g0 = jax.value_and_grad(loss)(q0)
    l1 = loss(q0 - 0.5 * g0)
    assert float(l1) < float(l0)
