"""Paged flash-decode kernel vs dense reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.cache import paged
from starflashattention_tpu.core import quant
from starflashattention_tpu.core.reference import decode_reference
from starflashattention_tpu.ops.paged_decode import paged_flash_decode


def build_paged(rng, b=2, hkv=2, d=32, page_size=16, pages_per_seq=8, lengths=None):
    """Random paged cache with a shuffled page table + its dense equivalent."""
    num_pages = b * pages_per_seq + 1
    perm = rng.permutation(num_pages - 1) + 1  # exclude null page 0
    pt = perm[: b * pages_per_seq].reshape(b, pages_per_seq).astype(np.int32)
    k_pages = rng.standard_normal((hkv, num_pages, page_size, d)).astype(np.float32)
    v_pages = rng.standard_normal((hkv, num_pages, page_size, d)).astype(np.float32)
    if lengths is None:
        lengths = rng.integers(1, pages_per_seq * page_size + 1, size=(b,))
    lengths = np.asarray(lengths, np.int32)
    # dense view
    dense_k = k_pages[:, pt].transpose(1, 0, 2, 3, 4).reshape(b, hkv, -1, d)
    dense_v = v_pages[:, pt].transpose(1, 0, 2, 3, 4).reshape(b, hkv, -1, d)
    return (
        jnp.asarray(k_pages),
        jnp.asarray(v_pages),
        jnp.asarray(pt),
        jnp.asarray(lengths),
        jnp.asarray(dense_k),
        jnp.asarray(dense_v),
    )


@pytest.mark.parametrize("ppcb", [1, 2, 4])
def test_vs_dense_reference(rng, ppcb):
    k_pages, v_pages, pt, lengths, dense_k, dense_v = build_paged(rng)
    hq = 4
    q = jnp.asarray(rng.standard_normal((2, hq, 32)), jnp.float32)
    o = paged_flash_decode(q, k_pages, v_pages, pt, lengths, pages_per_compute_block=ppcb)
    ref = decode_reference(q, dense_k, dense_v, lengths)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ragged_extremes(rng):
    k_pages, v_pages, pt, lengths, dense_k, dense_v = build_paged(
        rng, b=3, lengths=[1, 17, 128]
    )
    q = jnp.asarray(rng.standard_normal((3, 2, 32)), jnp.float32)
    o = paged_flash_decode(q, k_pages, v_pages, pt, lengths, pages_per_compute_block=2)
    ref = decode_reference(q, dense_k, dense_v, lengths)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_gqa(rng):
    k_pages, v_pages, pt, lengths, dense_k, dense_v = build_paged(rng, hkv=2)
    q = jnp.asarray(rng.standard_normal((2, 8, 32)), jnp.float32)  # G=4
    o = paged_flash_decode(q, k_pages, v_pages, pt, lengths, pages_per_compute_block=2)
    ref = decode_reference(q, dense_k, dense_v, lengths)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_stacked_layer_mode(rng):
    """(L, Hkv, P, ps, D) pool + traced layer index must match slicing the
    layer out (the kernel selects the DMA source in-kernel)."""
    import jax

    layers = [build_paged(rng) for _ in range(3)]
    k_stack = jnp.stack([l[0] for l in layers])
    v_stack = jnp.stack([l[1] for l in layers])
    q = jnp.asarray(rng.standard_normal((2, 4, 32)), jnp.float32)

    @jax.jit
    def run(lidx, k_stack, v_stack, pt, lengths):
        return paged_flash_decode(
            q, k_stack, v_stack, pt, lengths, layer=lidx, pages_per_compute_block=2
        )

    for li in range(3):
        _, _, pt, lengths, dense_k, dense_v = layers[li]
        o = run(jnp.asarray(li), k_stack, v_stack, pt, lengths)
        ref = decode_reference(q, dense_k, dense_v, lengths)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_zero_length_rows(rng):
    """Zero-length slots (natural in continuous batching) must yield a zero
    output AND not corrupt their neighbors' prefetch chains (the cell still
    executes one fully-masked block to keep the double-buffer DMA sequence
    intact)."""
    k_pages, v_pages, pt, lengths, dense_k, dense_v = build_paged(
        rng, b=3, lengths=[40, 0, 55]
    )
    q = jnp.asarray(rng.standard_normal((3, 4, 32)), jnp.float32)
    o = paged_flash_decode(q, k_pages, v_pages, pt, lengths, pages_per_compute_block=2)
    assert np.all(np.isfinite(np.asarray(o)))
    np.testing.assert_array_equal(np.asarray(o[1]), 0.0)
    ref = decode_reference(q, dense_k, dense_v, lengths)
    # rows 0 and 2 must be untouched by row 1's empty cell
    np.testing.assert_allclose(np.asarray(o[0]), np.asarray(ref[0]), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(o[2]), np.asarray(ref[2]), atol=2e-5, rtol=2e-5)


def test_all_zero_lengths(rng):
    k_pages, v_pages, pt, lengths, *_ = build_paged(rng, b=2, lengths=[0, 0])
    q = jnp.asarray(rng.standard_normal((2, 4, 32)), jnp.float32)
    o = paged_flash_decode(q, k_pages, v_pages, pt, lengths, pages_per_compute_block=2)
    np.testing.assert_array_equal(np.asarray(o), 0.0)


@pytest.mark.parametrize("mode", ["int8", "fp8"])
def test_quantized_pages(rng, mode):
    k_pages, v_pages, pt, lengths, dense_k, dense_v = build_paged(rng)
    qk = quant.quantize(k_pages, mode, head_axis=0)
    qv = quant.quantize(v_pages, mode, head_axis=0)
    q = jnp.asarray(rng.standard_normal((2, 4, 32)), jnp.float32)
    o = paged_flash_decode(
        q, qk.values, qv.values, pt, lengths,
        pages_per_compute_block=2, k_scales=qk.scales, v_scales=qv.scales,
    )
    # Oracle: densify the DEQUANTIZED pages through the same page table.
    dk = np.asarray(quant.dequantize(qk, head_axis=0))
    dv = np.asarray(quant.dequantize(qv, head_axis=0))
    pt_np = np.asarray(pt)
    dense_dk = dk[:, pt_np].transpose(1, 0, 2, 3, 4).reshape(2, 2, -1, 32)
    dense_dv = dv[:, pt_np].transpose(1, 0, 2, 3, 4).reshape(2, 2, -1, 32)
    ref = decode_reference(q, jnp.asarray(dense_dk), jnp.asarray(dense_dv), lengths)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=3e-4, rtol=3e-4)


def test_sliding_window_matches_reference(rng):
    """Windowed paged decode == dense reference with the same band; the
    shifted walk must hold under ragged lengths spanning the band edge."""
    w = 40
    k_pages, v_pages, pt, lengths, dense_k, dense_v = build_paged(
        rng, b=4, lengths=[1, 39, 41, 128]
    )
    q = jnp.asarray(rng.standard_normal((4, 4, 32)), jnp.float32)
    o = paged_flash_decode(
        q, k_pages, v_pages, pt, lengths, pages_per_compute_block=2, window=w
    )
    ref = decode_reference(q, dense_k, dense_v, lengths, sliding_window=w)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_sliding_window_never_reads_below_band(rng):
    """Null out (reclaim) every page table entry strictly below the walk's
    start block: the output must be bit-identical — the rolling-buffer
    engine's freeing contract (serving/engine.PagedEngine._reclaim_window)."""
    w = 40
    page_size, ppcb = 16, 2
    bk = page_size * ppcb
    k_pages, v_pages, pt, lengths, *_ = build_paged(
        rng, b=3, page_size=page_size, lengths=[80, 97, 128]
    )
    q = jnp.asarray(rng.standard_normal((3, 4, 32)), jnp.float32)
    o_full = paged_flash_decode(
        q, k_pages, v_pages, pt, lengths, pages_per_compute_block=ppcb, window=w
    )
    pt_nulled = np.asarray(pt).copy()
    for b in range(3):
        start_blk = max(int(lengths[b]) - w, 0) // bk
        pt_nulled[b, : start_blk * ppcb] = 0  # reclaimed pages -> null
    o_reclaimed = paged_flash_decode(
        q, k_pages, v_pages, jnp.asarray(pt_nulled), lengths,
        pages_per_compute_block=ppcb, window=w,
    )
    np.testing.assert_array_equal(np.asarray(o_full), np.asarray(o_reclaimed))


def test_sliding_window_quantized_pages(rng):
    w = 48
    k_pages, v_pages, pt, lengths, dense_k, dense_v = build_paged(
        rng, lengths=[70, 128]
    )
    qk = quant.quantize(k_pages, "int8", head_axis=0)
    qv = quant.quantize(v_pages, "int8", head_axis=0)
    q = jnp.asarray(rng.standard_normal((2, 4, 32)), jnp.float32)
    o = paged_flash_decode(
        q, qk.values, qv.values, pt, lengths, pages_per_compute_block=2,
        k_scales=qk.scales, v_scales=qv.scales, window=w,
    )
    dk = np.asarray(quant.dequantize(qk, head_axis=0))
    dv = np.asarray(quant.dequantize(qv, head_axis=0))
    pt_np = np.asarray(pt)
    dense_dk = dk[:, pt_np].transpose(1, 0, 2, 3, 4).reshape(2, 2, -1, 32)
    dense_dv = dv[:, pt_np].transpose(1, 0, 2, 3, 4).reshape(2, 2, -1, 32)
    ref = decode_reference(
        q, jnp.asarray(dense_dk), jnp.asarray(dense_dv), lengths, sliding_window=w
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=3e-4, rtol=3e-4)
