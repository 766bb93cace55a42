"""Ulysses sequence parallelism (parallel/ulysses.py) vs single-device flash.

The all-to-all head/sequence exchange must be exactly equivalent to the
single-chip kernel: forward (causal / ragged / window+sinks), gradients
(through the flash_attention custom_vjp and the transposed all-to-alls),
and agreement with ring attention on the same inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from starflashattention_tpu.ops.flash_bwd import flash_attention
from starflashattention_tpu.ops.flash_prefill import flash_prefill
from starflashattention_tpu.parallel import make_mesh
from starflashattention_tpu.parallel.ring import make_ring_prefill
from starflashattention_tpu.parallel.ulysses import (
    make_ulysses_prefill,
    ulysses_attention,
)

B, HQ, HKV, S, D = 2, 8, 4, 256, 32


def _inputs(rng):
    q = jnp.asarray(rng.standard_normal((B, HQ, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    lengths = jnp.asarray([S, S // 2 + 11], jnp.int32)
    return q, k, v, lengths


def _valid_err(o, ref, lengths):
    mask = (jnp.arange(S)[None, :] < lengths[:, None])[:, None, :, None]
    return float(jnp.max(jnp.abs(jnp.where(mask, o - ref, 0.0))))


@pytest.fixture
def mesh4():
    return make_mesh({"seq": 4}, devices=jax.devices()[:4])


def test_ulysses_matches_flash(mesh4, rng):
    q, k, v, lengths = _inputs(rng)
    ref = flash_prefill(q, k, v, lengths, causal=True)
    o = make_ulysses_prefill(mesh4, seq_axis="seq")(q, k, v, lengths)
    assert _valid_err(o, ref, lengths) < 2e-6


def test_ulysses_window_sinks(mesh4, rng):
    q, k, v, lengths = _inputs(rng)
    ref = flash_prefill(q, k, v, lengths, causal=True, window=96, sinks=16)
    fn = make_ulysses_prefill(mesh4, seq_axis="seq", window=96, sinks=16)
    o = fn(q, k, v, lengths)
    assert _valid_err(o, ref, lengths) < 2e-6


def test_ulysses_agrees_with_ring(mesh4, rng):
    q, k, v, lengths = _inputs(rng)
    o_u = make_ulysses_prefill(mesh4, seq_axis="seq")(q, k, v, lengths)
    o_r = make_ring_prefill(mesh4, seq_axis="seq")(q, k, v, lengths)
    assert _valid_err(o_u, o_r, lengths) < 2e-6


def test_ulysses_grads_match_single_device(mesh4, rng):
    q, k, v, lengths = _inputs(rng)
    w = jnp.asarray(rng.standard_normal((B, HQ, S, D)), jnp.float32)
    spec = P(None, None, "seq", None)

    def u_loss(q, k, v):
        def body(q, k, v, lengths, w):
            o = ulysses_attention(
                q, k, v, lengths, axis_name="seq", differentiable=True
            )
            return jax.lax.psum(jnp.sum(o * w), "seq")

        f = jax.shard_map(
            body, mesh=mesh4,
            in_specs=(spec, spec, spec, P(), spec),
            out_specs=P(), check_vma=False,
        )
        return f(q, k, v, lengths, w)

    def ref_loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, lengths, causal=True) * w)

    gu = jax.grad(u_loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gu, gr):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5


def test_ulysses_rejects_too_many_shards(rng):
    # n=8 cannot divide Hkv=4 — the actionable error points at the ring
    mesh = make_mesh({"seq": 8})
    q = jnp.zeros((1, 8, 64, D), jnp.float32)
    k = jnp.zeros((1, 4, 64, D), jnp.float32)
    fn = make_ulysses_prefill(mesh, seq_axis="seq")
    with pytest.raises(ValueError, match="ring attention"):
        fn(q, k, k, jnp.full((1,), 512, jnp.int32))
