"""flash_decode Pallas kernel vs the core reference spec (interpret mode, CPU).

Covers the reference's de-facto checks upgraded to assertions (SURVEY.md §4):
all-ones smoke, randomized vs golden, ragged lengths, GQA, split counts, and
the quantized-cache paths with the scheme's error bounds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.core import quant
from starflashattention_tpu.core.reference import decode_reference
from starflashattention_tpu.ops.flash_decode import (
    flash_decode,
    flash_decode_with_stats,
    lse_combine_splits,
)


def make_inputs(rng, b=2, hq=8, hkv=4, s=256, d=64, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((b, hq, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), dtype)
    lengths = jnp.asarray(rng.integers(1, s + 1, size=(b,)), jnp.int32)
    return q, k, v, lengths


def test_all_ones_smoke():
    """softmax of constant scores → mean of V = 1.0 (testFlashDecoder.cc:63-78)."""
    b, h, s, d = 2, 4, 128, 64
    q = jnp.ones((b, h, d), jnp.float32)
    k = jnp.ones((b, h, s, d), jnp.float32)
    v = jnp.ones((b, h, s, d), jnp.float32)
    lengths = jnp.full((b,), s, jnp.int32)
    o = flash_decode(q, k, v, lengths, num_splits=2)
    np.testing.assert_allclose(np.asarray(o), 1.0, atol=1e-5)


@pytest.mark.parametrize("num_splits", [1, 2, 4])
@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2), (32, 8)])
def test_vs_reference(rng, num_splits, hq, hkv):
    q, k, v, lengths = make_inputs(rng, hq=hq, hkv=hkv)
    o = flash_decode(q, k, v, lengths, num_splits=num_splits, block_k=64)
    ref = decode_reference(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ragged_lengths_extreme(rng):
    b, s = 4, 256
    q, k, v, _ = make_inputs(rng, b=b, s=s)
    lengths = jnp.asarray([1, 7, 129, 256], jnp.int32)
    o = flash_decode(q, k, v, lengths, num_splits=4, block_k=64)
    ref = decode_reference(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_bf16(rng):
    q, k, v, lengths = make_inputs(rng, dtype=jnp.bfloat16)
    o = flash_decode(q, k, v, lengths, num_splits=2, block_k=128)
    ref = decode_reference(q, k, v, lengths)
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )


def test_stats_match_reference_split_math(rng):
    """Per-split partials must merge exactly like core.lse_combine."""
    q, k, v, lengths = make_inputs(rng)
    o_parts, m, l = flash_decode_with_stats(q, k, v, lengths, num_splits=4, block_k=64)
    o = lse_combine_splits(o_parts, m, l)
    ref = decode_reference(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_odd_seq_non_divisible(rng):
    """Non-block-multiple cache sizes (ref bench uses 511/1023/…)."""
    q, k, v, lengths = make_inputs(rng, s=192)  # 192 = 3 * 64
    o = flash_decode(q, k, v, lengths, num_splits=4, block_k=128)
    ref = decode_reference(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("mode", ["int8", "fp8"])
def test_quantized_cache(rng, mode):
    q, k, v, lengths = make_inputs(rng, s=256, d=64)
    qk = quant.quantize(k, mode, head_axis=1)
    qv = quant.quantize(v, mode, head_axis=1)
    o = flash_decode(
        q,
        qk.values,
        qv.values,
        lengths,
        num_splits=2,
        block_k=128,
        k_scales=qk.scales,
        v_scales=qv.scales,
    )
    # Oracle: dequantized full-softmax reference — isolates kernel error from
    # quantization error.
    ref = decode_reference(
        q, quant.dequantize(qk, head_axis=1), quant.dequantize(qv, head_axis=1), lengths
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-4, rtol=2e-4)
    # And quantization error vs the fp reference stays within scheme bounds.
    fp = decode_reference(q, k, v, lengths)
    err = np.max(np.abs(np.asarray(o) - np.asarray(fp)))
    assert err < 0.25, err


def test_jit_and_grad_free_path(rng):
    q, k, v, lengths = make_inputs(rng)
    f = jax.jit(lambda *a: flash_decode(*a, num_splits=2, block_k=64))
    o = f(q, k, v, lengths)
    ref = decode_reference(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_max_len_hint_matches_full_grid():
    """flash_decode with a max_len_hint bounding lengths is bit-identical to
    the full-grid program (the hint only removes grid steps the index-map
    clamp already dedupes)."""
    import numpy as np
    from starflashattention_tpu.ops.flash_decode import flash_decode

    rng = np.random.default_rng(0)
    b, hq, hkv, s, d = 4, 8, 2, 512, 16
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    lengths = jnp.asarray([100, 63, 1, 128], jnp.int32)
    full = flash_decode(q, k, v, lengths, num_splits=1, block_k=64)
    hinted = flash_decode(
        q, k, v, lengths, num_splits=1, block_k=64, max_len_hint=128
    )
    assert (np.asarray(full) == np.asarray(hinted)).all()


def test_decode_multi_hint_and_inactive_mask():
    """decode_multi with max_len_hint matches the unhinted program even when
    an INACTIVE slot carries a stale length far beyond the hint (its
    attention lengths are masked to zero; its outputs are unused)."""
    import numpy as np
    from starflashattention_tpu.cache import contiguous
    from starflashattention_tpu.models import llama
    from starflashattention_tpu.runtime.params import ModelConfig

    cfg = ModelConfig.tiny(dtype="float32", num_splits=1, max_seq_len=256)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    cos, sin = llama.rope_tables(cfg)
    b = 4

    def mk_cache():
        c = contiguous.init_cache(
            cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len,
            cfg.head_dim, dtype=jnp.float32,
        )
        # slot 2 is INACTIVE with a stale near-full length
        return contiguous.advance(c, jnp.asarray([40, 10, 250, 7], jnp.int32))

    tok = jnp.asarray([3, 5, 7, 9], jnp.int32)
    active = jnp.asarray([True, True, False, True])
    out_full = llama.decode_multi(
        params, mk_cache(), tok, cos, sin, active, cfg, 4
    )
    out_hint = llama.decode_multi(
        params, mk_cache(), tok, cos, sin, active, cfg, 4, max_len_hint=64
    )
    # active rows bit-match; the stale inactive row's tokens are unused
    act = np.asarray(active)
    assert (np.asarray(out_full[0])[act] == np.asarray(out_hint[0])[act]).all()
    assert (np.asarray(out_full[1])[act] == np.asarray(out_hint[1])[act]).all()
