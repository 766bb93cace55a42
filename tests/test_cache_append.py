"""ops/cache_append.py: in-place row append vs functional update.

The TPU-native form of the reference's in-kernel cache append
(/root/reference/src/flash_attn.cu:691-701): an aliased-table Pallas DMA that
writes only the new (Hkv, D) rows instead of round-tripping whole layers.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.ops.cache_append import append_rows


@pytest.mark.parametrize("layer", [0, 2])
def test_append_rows_matches_functional(rng, layer):
    L, B, Hkv, S, D = 3, 4, 2, 16, 8
    table = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.float32)
    new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    pos = jnp.asarray([0, 5, 15, 7], jnp.int32)
    out = np.asarray(append_rows(table, new, layer, pos))
    ref = np.asarray(table).copy()
    for b in range(B):
        ref[layer, b, :, int(pos[b]), :] = np.asarray(new)[b]
    np.testing.assert_array_equal(out, ref)


def test_append_rows_traced_layer_and_bf16(rng):
    L, B, Hkv, S, D = 2, 2, 1, 8, 8
    table = jnp.zeros((L, B, Hkv, S, D), jnp.bfloat16)
    new = jnp.ones((B, Hkv, D), jnp.bfloat16)
    pos = jnp.asarray([3, 0], jnp.int32)
    out = append_rows(table, new, jnp.asarray(1), pos)
    ref = np.zeros((L, B, Hkv, S, D), np.float32)
    ref[1, 0, :, 3, :] = 1.0
    ref[1, 1, :, 0, :] = 1.0
    np.testing.assert_array_equal(np.asarray(out, np.float32), ref)


def test_append_rows_paged_kv(rng):
    """Paged windowed-RMW append: writes land in the physical page named by
    the page table, all other pages untouched."""
    from starflashattention_tpu.ops.cache_append import append_rows_paged_kv

    L, Hkv, P, ps, D = 2, 2, 12, 8, 8
    B, pages_per_seq = 3, 4
    k_pages = jnp.asarray(rng.standard_normal((L, Hkv, P, ps, D)), jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((L, Hkv, P, ps, D)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    page_table = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq].reshape(B, pages_per_seq), jnp.int32
    )
    pos = jnp.asarray([0, 9, 31], jnp.int32)  # page 0 row 0, page 1 row 1, page 3 row 7

    k_out, v_out = append_rows_paged_kv(
        k_pages, v_pages, k_new, v_new, 1, page_table, pos
    )
    k_ref = np.asarray(k_pages).copy()
    v_ref = np.asarray(v_pages).copy()
    for b in range(B):
        phys = int(page_table[b, int(pos[b]) // ps])
        k_ref[1, :, phys, int(pos[b]) % ps, :] = np.asarray(k_new)[b]
        v_ref[1, :, phys, int(pos[b]) % ps, :] = np.asarray(v_new)[b]
    np.testing.assert_array_equal(np.asarray(k_out), k_ref)
    np.testing.assert_array_equal(np.asarray(v_out), v_ref)
