"""flash_prefill Pallas kernel vs the core reference spec (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.core.reference import prefill_reference
from starflashattention_tpu.ops.flash_prefill import flash_prefill


def make_inputs(rng, b=2, hq=4, hkv=2, sq=128, skv=128, d=64, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((b, hq, sq, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, hkv, skv, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, hkv, skv, d)), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
def test_vs_reference(rng, causal):
    q, k, v = make_inputs(rng)
    o = flash_prefill(q, k, v, causal=causal, block_q=64, block_k=64)
    ref = prefill_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_config1_baseline_shape(rng):
    """BASELINE.json config 1: single-head fp32, seq=128, head_dim=64."""
    q, k, v = make_inputs(rng, b=1, hq=1, hkv=1, sq=128, skv=128, d=64)
    o = flash_prefill(q, k, v, causal=False)
    ref = prefill_reference(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ragged_lengths(rng):
    q, k, v = make_inputs(rng, b=3, skv=256, sq=256)
    lengths = jnp.asarray([5, 200, 256], jnp.int32)
    o = flash_prefill(q, k, v, lengths, causal=True, block_q=128, block_k=128)
    ref = prefill_reference(q, k, v, lengths=lengths, causal=True)
    # Rows at positions >= length attend to the full valid prefix in both
    # implementations; compare everything.
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_non_multiple_seq(rng):
    q, k, v = make_inputs(rng, sq=100, skv=200)
    o = flash_prefill(q, k, v, causal=True, block_q=64, block_k=64)
    ref = prefill_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_gqa_bf16(rng):
    q, k, v = make_inputs(rng, hq=8, hkv=2, dtype=jnp.bfloat16)
    o = flash_prefill(q, k, v, causal=True)
    ref = prefill_reference(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
    )
