"""ops/fused_mlp.py vs the two-matmul quantized reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.core import quant
from starflashattention_tpu.ops.fused_mlp import fused_mlp


def assert_close(got, want):
    """f32 accumulation order differs between the blocked kernel and the
    single-matmul reference; scale the absolute tolerance to the output
    magnitude (fixed atol fails on near-zero entries with ~1e-6 relative
    cancellation noise)."""
    got, want = np.asarray(got), np.asarray(want)
    scale = float(np.abs(want).max())
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5 * max(scale, 1.0))


def reference_mlp(x, w1, s1, w2, s2):
    gu = (x @ w1.astype(jnp.float32)) * s1
    inter = gu.shape[-1] // 2
    act = (jax.nn.silu(gu[:, :inter]) * gu[:, inter:]).astype(x.dtype)
    return (act @ w2.astype(jnp.float32)) * s2


@pytest.mark.parametrize("h,inter,b", [(64, 128, 4), (256, 384, 8), (128, 128, 2)])
def test_fused_mlp_matches_reference(rng, h, inter, b):
    x = jnp.asarray(rng.standard_normal((b, h)), jnp.float32)
    w1f = jnp.asarray(rng.standard_normal((h, 2 * inter)), jnp.float32)
    w2f = jnp.asarray(rng.standard_normal((inter, h)), jnp.float32)
    q1 = quant.quantize_weight(w1f, "int8")
    q2 = quant.quantize_weight(w2f, "int8")

    got = fused_mlp(x, q1["w"], q1["scale"], q2["w"], q2["scale"])
    want = reference_mlp(x, q1["w"], q1["scale"], q2["w"], q2["scale"])
    assert_close(got, want)


def test_fused_mlp_stacked_layers(rng):
    h, inter, b, L = 64, 128, 4, 3
    x = jnp.asarray(rng.standard_normal((b, h)), jnp.float32)
    w1s, w2s = [], []
    for l in range(L):
        w1s.append(quant.quantize_weight(
            jnp.asarray(rng.standard_normal((h, 2 * inter)), jnp.float32), "int8"))
        w2s.append(quant.quantize_weight(
            jnp.asarray(rng.standard_normal((inter, h)), jnp.float32), "int8"))
    w1 = jnp.stack([q["w"] for q in w1s])
    s1 = jnp.stack([q["scale"] for q in w1s])
    w2 = jnp.stack([q["w"] for q in w2s])
    s2 = jnp.stack([q["scale"] for q in w2s])

    for l in range(L):
        got = fused_mlp(x, w1, s1, w2, s2, layer=jnp.asarray(l))
        want = reference_mlp(x, w1s[l]["w"], w1s[l]["scale"], w2s[l]["w"], w2s[l]["scale"])
        assert_close(got, want)


def test_fused_mlp_block_geometry(rng):
    """Non-default block sizes tile correctly (ragged-free divisors only)."""
    h, inter, b = 256, 256, 4
    x = jnp.asarray(rng.standard_normal((b, h)), jnp.float32)
    q1 = quant.quantize_weight(
        jnp.asarray(rng.standard_normal((h, 2 * inter)), jnp.float32), "int8")
    q2 = quant.quantize_weight(
        jnp.asarray(rng.standard_normal((inter, h)), jnp.float32), "int8")
    want = reference_mlp(x, q1["w"], q1["scale"], q2["w"], q2["scale"])
    for bh, bo in [(128, 128), (256, 256), (128, 256)]:
        got = fused_mlp(
            x, q1["w"], q1["scale"], q2["w"], q2["scale"], block_h=bh, block_o=bo
        )
        assert_close(got, want)
