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
