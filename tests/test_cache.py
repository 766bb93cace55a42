"""Cache managers: contiguous append paths and paged pool scatter/gather."""

import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.cache import contiguous, paged
from starflashattention_tpu.core import quant


def test_contiguous_append_decode(rng):
    cache = contiguous.init_cache(2, 3, 4, 64, 32, dtype=jnp.float32)
    cache = contiguous.advance(cache, jnp.asarray([0, 5, 63], jnp.int32))
    k_new = jnp.asarray(rng.standard_normal((3, 4, 32)), jnp.float32)
    v_new = -k_new
    cache = contiguous.append_decode(cache, 1, k_new, v_new)
    k1 = np.asarray(cache.k[1])
    np.testing.assert_allclose(k1[0, :, 0], np.asarray(k_new)[0])
    np.testing.assert_allclose(k1[1, :, 5], np.asarray(k_new)[1])
    np.testing.assert_allclose(k1[2, :, 63], np.asarray(k_new)[2])
    assert np.all(np.asarray(cache.k[0]) == 0)  # other layer untouched
    np.testing.assert_allclose(np.asarray(cache.v[1])[1, :, 5], -np.asarray(k_new)[1])


def test_contiguous_append_prefill(rng):
    cache = contiguous.init_cache(1, 2, 2, 64, 16, dtype=jnp.float32)
    cache = contiguous.advance(cache, jnp.asarray([0, 10], jnp.int32))
    chunk = jnp.asarray(rng.standard_normal((2, 2, 8, 16)), jnp.float32)
    cache = contiguous.append_prefill(cache, 0, chunk, chunk)
    k0 = np.asarray(cache.k[0])
    np.testing.assert_allclose(k0[0, :, 0:8], np.asarray(chunk)[0])
    np.testing.assert_allclose(k0[1, :, 10:18], np.asarray(chunk)[1])


def test_contiguous_quantized_append(rng):
    cache = contiguous.init_cache(1, 1, 2, 16, 8, quant_mode="int8", calibration_scale=4.0)
    k_new = jnp.asarray(rng.uniform(-3, 3, (1, 2, 8)), jnp.float32)
    cache = contiguous.append_decode(cache, 0, k_new, k_new)
    deq = np.asarray(cache.k[0][:, :, 0], np.float32) * np.asarray(cache.k_scales[0])[None, :, None]
    np.testing.assert_allclose(deq, np.asarray(k_new), atol=4.0 / 127 + 1e-6)


def test_allocator():
    alloc = paged.PageAllocator(8)
    a = alloc.alloc(3)
    assert len(set(a)) == 3 and 0 not in a
    assert alloc.free_pages == 4
    alloc.free(a)
    assert alloc.free_pages == 7
    with pytest.raises(MemoryError):
        alloc.alloc(100)


def test_paged_append_and_gather(rng):
    ps = 8
    cache = paged.init_paged_cache(
        1, 2, 2, 16, num_pages=10, page_size=ps, pages_per_seq=4, dtype=jnp.float32
    )
    # seq 0 uses pages [3, 5], seq 1 uses [7, 2]
    pt = jnp.asarray([[3, 5, 0, 0], [7, 2, 0, 0]], jnp.int32)
    cache = paged.PagedKVCache(
        cache.k_pages, cache.v_pages, pt, jnp.asarray([ps + 2, 3], jnp.int32)
    )
    k_new = jnp.asarray(rng.standard_normal((2, 2, 16)), jnp.float32)
    cache = paged.append_decode_paged(cache, 0, k_new, -k_new)
    # seq 0 pos 10 → logical page 1 (phys 5), slot 2; seq 1 pos 3 → page 7 slot 3
    np.testing.assert_allclose(np.asarray(cache.k_pages)[0, :, 5, 2], np.asarray(k_new)[0])
    np.testing.assert_allclose(np.asarray(cache.k_pages)[0, :, 7, 3], np.asarray(k_new)[1])
    dense_k, dense_v = paged.gather_layer(cache, 0)
    np.testing.assert_allclose(np.asarray(dense_k)[0, :, 10], np.asarray(k_new)[0])
    np.testing.assert_allclose(np.asarray(dense_v)[1, :, 3], -np.asarray(k_new)[1])


def test_paged_prefill_chunk(rng):
    ps = 8
    cache = paged.init_paged_cache(
        1, 2, 1, 4, num_pages=6, page_size=ps, pages_per_seq=3, dtype=jnp.float32
    )
    pt = jnp.asarray([[1, 2, 3], [4, 5, 0]], jnp.int32)
    cache = paged.PagedKVCache(cache.k_pages, cache.v_pages, pt, jnp.zeros((2,), jnp.int32))
    chunk = jnp.asarray(rng.standard_normal((2, 1, 12, 4)), jnp.float32)
    new_lengths = jnp.asarray([12, 5], jnp.int32)
    cache = paged.append_prefill_paged(cache, 0, chunk, chunk, jnp.zeros((2,), jnp.int32), new_lengths)
    dense_k, _ = paged.gather_layer(cache, 0)
    np.testing.assert_allclose(np.asarray(dense_k)[0, :, :12], np.asarray(chunk)[0])
    np.testing.assert_allclose(np.asarray(dense_k)[1, :, :5], np.asarray(chunk)[1, :, :5])
    # tokens beyond new_lengths[1] must be dropped, not scattered
    assert np.all(np.asarray(dense_k)[1, :, 5:] == 0)
