"""EXPERIMENT: bitcast-based int4 unpack vs the int32-convert unpack.

The production int4 kernel (ops/quant_matmul.quant_matmul_int4) unpacks by
converting the packed int8 block to int32 (a 4:1 sublane relayout) then
shift/and/sub. This probe packs with BOTH nibbles biased +8 and a pack-time
row permutation such that pltpu.bitcast(int8->int32) yields, per byte lane
k, a CONTIGUOUS logical row range - extraction is then pure lane ops
(shift/and/sub per nibble) with no relayout, at the cost of 8 narrower
(K=half/4) MXU dots per group instead of 2 (K=half).

Run on chip: python benchmarks/exp/int4_bitcast_probe.py

OUTCOME (v5e, 2026-08-20): REJECTED. The relayout saving is more than eaten
by the 4x narrower MXU dots (contraction 32 instead of 128):
  gate_up (4096x22016): convert 73.7 us (612 GB/s) vs bitcast 92.4 (488) = 0.80x
  (4096x11008):         convert 38.1 us (592 GB/s) vs bitcast 41.6 (542) = 0.92x
The production kernel keeps the int32-convert unpack. (Known limitation of
this probe: it mis-handles odd group counts - G=43 with gpb=2 - which is
fine for a rejected experiment; do not reuse mm_v2 as-is.)
"""
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from starflashattention_tpu.utils.profiling import time_scanned


def pack_v2(w, group=256):
    """All-nibbles-biased, bitcast-ordered packing. Returns (packed, scale)."""
    h, o = w.shape
    G, half = h // group, group // 2
    q = half // 4
    wg = w.astype(jnp.float32).reshape(G, group, o)
    absmax = jnp.max(jnp.abs(wg), axis=-2)
    scale = jnp.where(absmax == 0.0, 1.0, absmax / 7.0)
    qv = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7).astype(jnp.int32)
    lo, hi = qv[:, :half], qv[:, half:]
    # byte[4s+k] = (lo[k*q+s]+8) | ((hi[k*q+s]+8) << 4)
    m = np.arange(half)
    perm = 4 * (m % q) + (m // q)  # logical row m -> packed row perm[m]
    inv = np.empty_like(perm); inv[perm] = m
    lo_p, hi_p = lo[:, inv, :], hi[:, inv, :]
    packed = ((lo_p + 8) | ((hi_p + 8) << 4)).astype(jnp.int8)
    return packed.reshape(G * half, o), scale


def kern_v2(layer_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_g, gpb, half):
    gi = pl.program_id(2)

    @pl.when(gi == 0)
    def _i():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    p = w_ref[0]
    group, q = 2 * half, half // 4
    ssum = None
    for j in range(gpb):
        w32 = pltpu.bitcast(p[j * half:(j + 1) * half], jnp.int32)  # (q*? ,bo)
        d = None
        for k in range(4):
            lo = (((w32 >> (8 * k)) & 15) - 8).astype(x.dtype)
            hi = (((w32 >> (8 * k + 4)) & 15) - 8).astype(x.dtype)
            xl = x[:, j * group + k * q: j * group + (k + 1) * q]
            xh = x[:, j * group + half + k * q: j * group + half + (k + 1) * q]
            dd = jax.lax.dot_general(xl, lo, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dd += jax.lax.dot_general(xh, hi, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            d = dd if d is None else d + dd
        d = d * s_ref[0, pl.ds(gi * gpb + j, 1), :]
        ssum = d if ssum is None else ssum + d
    acc_ref[...] += ssum

    @pl.when(gi == n_g - 1)
    def _e():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def mm_v2(x, packed, scale, bo, gpb=2, group=256):
    b, h = x.shape
    hp, o = packed.shape
    G = scale.shape[-2]
    half = group // 2
    n_g = G // gpb
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, pl.cdiv(o, bo), n_g),
        in_specs=[
            pl.BlockSpec((b, gpb * group), lambda bi, oi, gi, lr: (bi, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpb * half, bo),
                         lambda bi, oi, gi, lr: (lr[0], gi, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, bo), lambda bi, oi, gi, lr: (lr[0], 0, oi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, bo), lambda bi, oi, gi, lr: (bi, oi),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, bo), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(kern_v2, n_g=n_g, gpb=gpb, half=half),
        grid_spec=gs, out_shape=jax.ShapeDtypeStruct((b, o), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024),
    )(jnp.zeros((1,), jnp.int32), x, packed[None], scale[None])


def main():
    from starflashattention_tpu.core import quant
    from starflashattention_tpu.ops.quant_matmul import quant_matmul_int4

    kx = jax.random.PRNGKey(2)
    for (h, o_dim, bo) in [(4096, 22016, 11008), (4096, 11008, 11008),
                           (11008, 4096, 4096)]:
        kw = jax.random.fold_in(kx, h)
        w = jax.random.normal(kw, (h, o_dim), jnp.bfloat16) * 0.02
        x = jax.random.normal(kx, (16, h), jnp.bfloat16)
        packed, scale = pack_v2(w)
        # correctness vs an equivalent dequant (rebuild from the packed form)
        d0 = quant.quantize_weight_int4(w)  # same scales, same int values
        ref = jnp.asarray(x, jnp.float32) @ quant.dequantize_weight_int4(d0)
        got = jax.jit(lambda x: mm_v2(x, packed, scale, bo))(x)
        rel = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref))) / float(
            jnp.max(jnp.abs(ref)))
        assert rel < 2e-2, (h, o_dim, rel)

        def sv2(x):
            y = mm_v2(x, packed, scale, bo)
            k = min(h, o_dim)
            return x + jnp.pad(y[:, :k] * jnp.bfloat16(1e-3),
                               ((0, 0), (0, h - k)))

        def sv1(x, ww, ss):
            y = quant_matmul_int4(x, ww, ss, out_dtype=jnp.bfloat16)
            k = min(h, o_dim)
            return x + jnp.pad(y[:, :k] * jnp.bfloat16(1e-3),
                               ((0, 0), (0, h - k)))

        p2, _ = time_scanned(sv2, x, iters=32, repeats=3)
        p1, _ = time_scanned(sv1, x, d0["w"], d0["scale"], iters=32, repeats=3)
        gb = h * o_dim / 2 / 1e9
        print(f"({h}x{o_dim}): convert-unpack {p1*1e6:6.1f}us ({gb/p1:.0f} GB/s)"
              f" | bitcast-unpack {p2*1e6:6.1f}us ({gb/p2:.0f} GB/s)"
              f" | {p1/p2:.2f}x", flush=True)


if __name__ == "__main__":
    main()
