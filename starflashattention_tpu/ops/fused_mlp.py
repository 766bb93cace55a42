"""Fused SwiGLU MLP Pallas kernel for INT8/FP8 weights.

One kernel streams BOTH MLP weights back-to-back: phase 1 accumulates the
(B, 2I) gate|up projection over H blocks of ``w1`` and applies silu(gate)·up
into a VMEM activation scratch; phase 2 produces the (B, H) output one
H-block at a time, each block a single full-contraction dot of the resident
activation against an (I, block) slab of ``w2`` — a single 1-D grid whose
steps switch phase.

Measured OUTCOME (TPU v5e, 7B decode shapes B=16): the fused kernel reaches
0.94 of the HBM roofline (bh=512, bo=2048) — but two back-to-back
quant_matmul calls measure 0.98 in the same chain: consecutive Pallas calls
ramp far cheaper than expected and the (B, I) activation round-trip is only
~1.4 MB. The fusion is therefore NOT wired into models/llama; it is kept as
a correct, tested alternative (useful where the intermediate is large
relative to the weights, e.g. long-sequence MLPs).

Phase plumbing: ``w2``'s index map returns slab 0 during all of phase 1 —
the Pallas pipeline dedupes the unchanged index, so w2's first slab is
resident exactly when phase 2 starts, with no wasted fetches (and ``w1``
clamps to its last block during phase 2, likewise never re-fetched). The
output block's buffer holds garbage until its phase-2 step writes it; a
block is only flushed to HBM after its index advances, by which point it
has been written.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fused_mlp_kernel(
    layer_ref,  # (1,) int32 scalar prefetch
    x_ref,  # (B, block_h)
    w1_ref,  # (1, block_h, 2I)
    s1_ref,  # (1, 1, 2I)
    w2_ref,  # (1, I, block_o)
    s2_ref,  # (1, 1, block_o)
    o_ref,  # (B, block_o) f32
    gu_acc,  # (B, 2I) f32 scratch
    act_s,  # (B, I) act-dtype scratch
    *,
    n_h: int,
    n_o: int,
    inter: int,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        gu_acc[...] = jnp.zeros_like(gu_acc)

    @pl.when(i < n_h)
    def _zero_out():
        # Deterministic content for the out block buffer during phase 1
        # (its real value lands in phase 2; interpret mode flushes every
        # step, so an unwritten buffer must not hold garbage).
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(i < n_h)
    def _phase1():
        x = x_ref[...]
        w = w1_ref[0].astype(x.dtype)
        gu_acc[...] += jax.lax.dot_general(
            x, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == n_h - 1)
    def _activate():
        gu = gu_acc[...] * s1_ref[0]  # dequant (B, 2I)
        gate, up = gu[:, :inter], gu[:, inter:]
        act_s[...] = (jax.nn.silu(gate) * up).astype(act_s.dtype)

    @pl.when(i >= n_h)
    def _phase2():
        act = act_s[...]
        w = w2_ref[0].astype(act.dtype)
        o_ref[...] = (
            jax.lax.dot_general(
                act, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * s2_ref[0]
        )


def _largest_divisor(dim: int, cap: int, quantum: int = 128) -> int:
    for d in range(min(cap, dim) - min(cap, dim) % quantum, quantum - 1, -quantum):
        if dim % d == 0:
            return d
    return dim  # dim < quantum: single block


def fused_mlp(
    x: jax.Array,  # (B, H) activations (bf16/f32)
    w1: jax.Array,  # (H, 2I) or (L, H, 2I) int8/fp8 — [gate | up] columns
    s1: jax.Array,  # (2I,) or (L, 2I) f32 per-output-channel scales
    w2: jax.Array,  # (I, H) or (L, I, H)
    s2: jax.Array,  # (H,) or (L, H)
    *,
    layer: jax.Array | int | None = None,
    block_h: int = 512,
    block_o: int = 1024,
    interpret: bool | None = None,
) -> jax.Array:
    """``silu/gate MLP: act(x @ dequant(w1[layer])) @ dequant(w2[layer])``
    → (B, H) f32, one kernel. The quantized analog of models/llama._swiglu."""
    b, h = x.shape
    if w1.ndim == 2:
        w1, s1 = w1[None], s1[None]
        w2, s2 = w2[None], s2[None]
        layer = 0
    assert layer is not None, "layer index required for stacked (L, ...) weights"
    L, _, two_i = w1.shape
    inter = two_i // 2
    assert w2.shape[1:] == (inter, h), (w2.shape, inter, h)
    if interpret is None:
        interpret = _use_interpret()

    block_h = _largest_divisor(h, block_h)
    block_o = _largest_divisor(h, block_o)
    n_h = h // block_h
    n_o = h // block_o
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_h + n_o,),
        in_specs=[
            pl.BlockSpec(
                (b, block_h),
                lambda i, lr: (0, jnp.minimum(i, n_h - 1)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_h, two_i),
                lambda i, lr: (lr[0], jnp.minimum(i, n_h - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, two_i), lambda i, lr: (lr[0], 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, inter, block_o),
                lambda i, lr: (lr[0], 0, jnp.clip(i - n_h, 0, n_o - 1)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_o),
                lambda i, lr: (lr[0], 0, jnp.clip(i - n_h, 0, n_o - 1)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, block_o),
            lambda i, lr: (0, jnp.clip(i - n_h, 0, n_o - 1)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((b, two_i), jnp.float32),
            pltpu.VMEM((b, inter), x.dtype),
        ],
    )

    return pl.pallas_call(
        functools.partial(_fused_mlp_kernel, n_h=n_h, n_o=n_o, inter=inter),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        layer_arr,
        x,
        w1,
        s1.reshape(L, 1, two_i).astype(jnp.float32),
        w2,
        s2.reshape(L, 1, h).astype(jnp.float32),
    )
