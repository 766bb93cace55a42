"""In-place KV-cache row append (Pallas, aliased table).

The reference appends the current token's K/V to the cache inside its decode
kernel (/root/reference/src/flash_attn.cu:691-701). The XLA-functional
alternatives both move far too many bytes on TPU: a batched scatter copies
the whole table, and slicing one layer out/in (`table[l]` → update →
`dynamic_update_index_in_dim`) moves the full layer per step (~134 MB/layer
at 7B shapes — measured ~40% of the decode step). This kernel writes ONLY
the B new (Hkv, D) rows: the table stays in HBM (`memory_space=ANY`),
``input_output_aliases`` pins the output to the input buffer so nothing is
copied, and one async DMA per sequence stores the row at its write position.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _append_kernel(
    # scalar prefetch
    layer_ref,  # (1,) int32
    pos_ref,  # (B,) int32 — write position per sequence
    # inputs
    new_ref,  # (B, Hkv, D) VMEM
    table_hbm,  # (L, B, Hkv, S*D) ANY — aliased to the output
    # output (aliased)
    out_hbm,  # same ref as table_hbm
    # scratch
    sem,
    *,
    batch_size: int,
    head_dim: int,
):
    # The (S, D) tail is collapsed to S*D so each row write is a D-wide,
    # D-aligned slice of the MINOR dim — a size-1 slice of a tiled S dim is
    # not DMA-able (Mosaic requires 8-aligned slices of the sublane dim).
    lidx = layer_ref[0]
    copies = []
    for b in range(batch_size):
        copies.append(
            pltpu.make_async_copy(
                new_ref.at[b],  # (Hkv, D)
                out_hbm.at[lidx, b, :, pl.ds(pos_ref[b] * head_dim, head_dim)],
                sem,
            )
        )
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


def append_rows(
    table: jax.Array,  # (L, B, Hkv, S, D)
    new: jax.Array,  # (B, Hkv, D), same dtype as table
    layer: jax.Array | int,
    pos: jax.Array,  # (B,) int32
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """``table[layer, b, :, pos[b], :] = new[b]`` for every b — in place.

    Returns the updated table; under jit the output buffer IS the input
    buffer (no table copy), so thread the result exactly like the
    functional update it replaces.
    """
    l, b, hkv, s, d = table.shape
    assert new.shape == (b, hkv, d), (new.shape, table.shape)
    assert new.dtype == table.dtype, (new.dtype, table.dtype)
    if interpret is None:
        interpret = _use_interpret()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        functools.partial(_append_kernel, batch_size=b, head_dim=d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((l, b, hkv, s * d), table.dtype),
        # operand index counts scalar-prefetch args: (layer, pos, new, table)
        input_output_aliases={3: 0},
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        pos.astype(jnp.int32),
        new,
        # collapsing the two minor dims is layout-preserving (no copy)
        table.reshape(l, b, hkv, s * d),
    )
    return out.reshape(l, b, hkv, s, d)
