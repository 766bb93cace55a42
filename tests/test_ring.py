"""Context-parallel ring attention (parallel/ring.py) vs single-device flash.

The ring result must equal flash_prefill on the gathered arrays up to f32
LSE-merge rounding — causal, GQA, ragged lengths, sliding window, zigzag
load-balanced layout, and gradients (the custom-vjp ring backward vs
jax.grad of the single-device flash_attention custom_vjp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.ops.flash_bwd import flash_attention
from starflashattention_tpu.ops.flash_prefill import flash_prefill
from starflashattention_tpu.parallel import make_mesh
from starflashattention_tpu.parallel.ring import (
    make_ring_prefill,
    ring_attention,
    zigzag_permutation,
)
from jax.sharding import PartitionSpec as P

B, HQ, HKV, S, D = 2, 4, 2, 256, 64


def _inputs(rng, s=S):
    q = jnp.asarray(rng.standard_normal((B, HQ, s, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, HKV, s, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, HKV, s, D)), jnp.float32)
    lengths = jnp.asarray([s, s // 2 + 11], jnp.int32)
    return q, k, v, lengths


def _valid_err(o, ref, lengths, s):
    mask = (jnp.arange(s)[None, :] < lengths[:, None])[:, None, :, None]
    return float(jnp.max(jnp.abs(jnp.where(mask, o - ref, 0.0))))


@pytest.fixture
def mesh4():
    return make_mesh({"seq": 4}, devices=jax.devices()[:4])


def test_ring_matches_flash_causal_ragged(mesh4, rng):
    q, k, v, lengths = _inputs(rng)
    ref = flash_prefill(q, k, v, lengths, causal=True)
    fn = make_ring_prefill(mesh4, seq_axis="seq")
    o = fn(q, k, v, lengths)
    assert _valid_err(o, ref, lengths, S) < 2e-6


def test_ring_noncausal(mesh4, rng):
    q, k, v, lengths = _inputs(rng)
    ref = flash_prefill(q, k, v, lengths, causal=False)
    fn = make_ring_prefill(mesh4, seq_axis="seq", causal=False)
    o = fn(q, k, v, lengths)
    assert _valid_err(o, ref, lengths, S) < 2e-6


def test_ring_sliding_window(mesh4, rng):
    q, k, v, lengths = _inputs(rng)
    ref = flash_prefill(q, k, v, lengths, causal=True, window=96)
    fn = make_ring_prefill(mesh4, seq_axis="seq", window=96)
    o = fn(q, k, v, lengths)
    assert _valid_err(o, ref, lengths, S) < 2e-6


def test_ring_zigzag_balanced(mesh4, rng):
    q, k, v, lengths = _inputs(rng)
    ref = flash_prefill(q, k, v, lengths, causal=True)
    fn = make_ring_prefill(mesh4, seq_axis="seq", balanced=True)
    o = fn(q, k, v, lengths)
    assert _valid_err(o, ref, lengths, S) < 2e-6


def test_zigzag_permutation_inverts():
    perm = zigzag_permutation(S, 4)
    assert sorted(perm.tolist()) == list(range(S))
    inv = np.argsort(perm)
    assert np.array_equal(perm[inv], np.arange(S))
    with pytest.raises(ValueError):
        zigzag_permutation(100, 4)  # not divisible by 2n


def test_ring_grad_matches_single_device(mesh4, rng):
    q, k, v, lengths = _inputs(rng)
    w = jnp.asarray(rng.standard_normal((B, HQ, S, D)), jnp.float32)
    spec = P(None, None, "seq", None)

    def ring_loss(q, k, v):
        def body(q, k, v, lengths, w):
            o = ring_attention(q, k, v, lengths, axis_name="seq")
            return jax.lax.psum(jnp.sum(o * w), "seq")

        f = jax.shard_map(
            body, mesh=mesh4,
            in_specs=(spec, spec, spec, P(), spec),
            out_specs=P(), check_vma=False,
        )
        return f(q, k, v, lengths, w)

    def ref_loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, lengths, causal=True) * w)

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5


def test_ring_rejects_unequal_chunks(mesh4, rng):
    # q chunk 32 vs kv chunk 64 breaks the aligned-chunk skip contract
    q = jnp.zeros((1, 2, 32, D), jnp.float32)
    k = jnp.zeros((1, 2, 64, D), jnp.float32)
    with pytest.raises(ValueError, match="equally-chunked"):
        ring_attention(q, k, k, axis_name="seq")


def test_ring_balanced_differentiable_unsupported(mesh4):
    with pytest.raises(NotImplementedError):
        make_ring_prefill(mesh4, seq_axis="seq", balanced=True, differentiable=True)
