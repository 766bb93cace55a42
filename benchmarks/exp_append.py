"""Cache-append variant experiments (real TPU).

The shipped windowed-RMW append (ops/cache_append.append_rows_kv) measures
~54 us/layer at B=16/Hkv=8 — 0.10 of roofline for its 4.2 MB of window
traffic, i.e. latency-bound: 2 tables x 16 sequences = 32 reads + 32 writes
of (Hkv, 32, D) windows whose Hkv dim strides S*D, so each "window" DMA is 8
scattered 8 KB bursts.

Variants:
  a0  shipped append_rows_kv
  a1  per-(table, seq, head) contiguous window copies (256 DMAs of 8 KB,
      zero striding) — tests whether stride handling is the tax
  a2  window=8 rows (quarter the bytes, same DMA count)
  a3  XLA windowed RMW: vmapped dynamic_slice -> blend -> vmapped
      dynamic_update_slice on the donated table (no Pallas)
  a4  one strided DMA per table over the COMMON window when all sequences
      share it (uniform-decode fast path; ragged falls back to a0)

Usage: python benchmarks/exp_append.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from starflashattention_tpu.ops.cache_append import append_rows_kv
from starflashattention_tpu.utils.profiling import _force, _timed, _tunnel_rtt

L, B, HKV, S, D = 32, 16, 8, 1024, 128
WINDOW = 32


def _mk_kernel(mode: str, window: int):
    def kernel(layer_ref, pos_ref, k_new_ref, v_new_ref, k_hbm, v_hbm,
               k_out, v_out, k_win, v_win, sem):
        lidx = layer_ref[0]
        outs = (k_out, v_out)
        wins = (k_win, v_win)
        news = (k_new_ref, v_new_ref)

        def copies(direction):
            cs = []
            for t in range(2):
                if mode == "per_head":
                    for b in range(B):
                        start = pl.multiple_of(
                            (pos_ref[b] // window) * window, window)
                        for h in range(HKV):
                            hbm = outs[t].at[lidx, b, h, pl.ds(start, window), :]
                            vmem = wins[t].at[b, h]
                            cs.append(
                                pltpu.make_async_copy(hbm, vmem, sem)
                                if direction == "read"
                                else pltpu.make_async_copy(vmem, hbm, sem)
                            )
                elif mode == "common":
                    start = pl.multiple_of(
                        (pos_ref[0] // window) * window, window)
                    hbm = outs[t].at[lidx, :, :, pl.ds(start, window), :]
                    vmem = wins[t]
                    cs.append(
                        pltpu.make_async_copy(hbm, vmem, sem)
                        if direction == "read"
                        else pltpu.make_async_copy(vmem, hbm, sem)
                    )
                else:  # per_seq (shipped structure)
                    for b in range(B):
                        start = pl.multiple_of(
                            (pos_ref[b] // window) * window, window)
                        hbm = outs[t].at[lidx, b, :, pl.ds(start, window), :]
                        vmem = wins[t].at[b]
                        cs.append(
                            pltpu.make_async_copy(hbm, vmem, sem)
                            if direction == "read"
                            else pltpu.make_async_copy(vmem, hbm, sem)
                        )
            return cs

        rs = copies("read")
        for c in rs:
            c.start()
        for c in rs:
            c.wait()
        for t in range(2):
            for b in range(B):
                slab = wins[t][b]  # (Hkv, W, D)
                sel = (jax.lax.broadcasted_iota(jnp.int32, slab.shape, 1)
                       == pos_ref[b] % window)
                wins[t][b] = jnp.where(sel, news[t][b][:, None, :], slab)
        ws = copies("write")
        for c in ws:
            c.start()
        for c in ws:
            c.wait()

    return kernel


def _pallas_variant(mode: str, window: int):
    kernel = _mk_kernel(mode, window)

    @jax.jit
    def run(k, v, kn, vn, pos):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, HKV, window, D), k.dtype),
                pltpu.VMEM((B, HKV, window, D), k.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(k.shape, k.dtype),
                jax.ShapeDtypeStruct(v.shape, v.dtype),
            ],
            input_output_aliases={4: 0, 5: 1},
        )(jnp.zeros((1,), jnp.int32), pos, kn, vn, k, v)

    return run


@jax.jit
def _xla_variant(k, v, kn, vn, pos):
    # windowed RMW in plain XLA on the donated tables
    start = (pos // WINDOW) * WINDOW  # (B,)

    def upd(table, new):
        def one(tb, st, p, row):
            win = jax.lax.dynamic_slice(tb, (0, st, 0), (HKV, WINDOW, D))
            sel = (jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
                   == p - st)
            win = jnp.where(sel, row[:, None, :], win)
            return jax.lax.dynamic_update_slice(tb, win, (0, st, 0))

        return jax.vmap(one)(table[0], start, pos, new)[None]

    return upd(k[0:1, :, :, :, :].reshape(1, B, HKV, S, D), kn).reshape(k[0:1].shape), v


def bench(name, fn, k, v, kn, vn, pos, iters=1024):
    @jax.jit
    def chain(k, v, kn, vn, pos):
        def body(c, _):
            k, v = c
            k, v = fn(k, v, kn, vn, pos) if name != "a0" else append_rows_kv(
                k, v, kn, vn, 0, pos)
            return (k, v), None
        (k, v), _ = jax.lax.scan(body, (k, v), None, length=iters)
        return k, v

    out = chain(k, v, kn, vn, pos)
    _force(out)
    t = min(_timed(lambda: _force(chain(k, v, kn, vn, pos))) for _ in range(3))
    per = (t - _tunnel_rtt()) / iters
    gb = 4 * B * HKV * WINDOW * D * 2 / 1e9
    print(f"{name:28s} {per*1e6:8.1f} us/layer  {gb*1e9/per/1e9:6.1f} GB/s")
    return per


def main() -> None:
    dtype = jnp.bfloat16
    kk, kv2, kn_, vn_ = jax.random.split(jax.random.PRNGKey(0), 4)
    k = jax.random.normal(kk, (L, B, HKV, S, D), dtype)
    v = jax.random.normal(kv2, (L, B, HKV, S, D), dtype)
    kn = jax.random.normal(kn_, (B, HKV, D), dtype)
    vn = jax.random.normal(vn_, (B, HKV, D), dtype)
    pos_uniform = jnp.full((B,), 500, jnp.int32)
    pos_ragged = jnp.asarray(
        np.r_[np.full(B // 2, 250), np.full(B // 2, 500)], jnp.int32)
    jax.block_until_ready((k, v, kn, vn))

    # correctness probe for every variant (single call, vs reference blend)
    def check(fn, pos):
        k0 = jnp.zeros((2, B, HKV, S, D), dtype)
        v0 = jnp.zeros_like(k0)
        ko, vo = fn(k0, v0, kn, vn, pos)
        ref = np.zeros((2, B, HKV, S, D), np.float32)
        pn = np.asarray(pos)
        for b in range(B):
            ref[0, b, :, pn[b], :] = np.asarray(kn[b], np.float32)
        refv = np.zeros_like(ref)
        for b in range(B):
            refv[0, b, :, pn[b], :] = np.asarray(vn[b], np.float32)
        ok = bool(jnp.allclose(ko[0].astype(jnp.float32), jnp.asarray(ref[0])))
        okv = bool(jnp.allclose(vo[0].astype(jnp.float32), jnp.asarray(refv[0])))
        return ok and okv

    for tag, pos in (("uniform", pos_uniform), ("ragged", pos_ragged)):
        print(f"== {tag} positions ==")
        bench("a0", None, k, v, kn, vn, pos)
        for mode in ("per_seq", "per_head"):
            for w in (8, 16, 32):
                fn = _pallas_variant(mode, w)
                ok = check(fn, pos)
                name = f"{mode}_w{w}" + ("" if ok else "_WRONG")
                bench(name, lambda k, v, kn, vn, pos, fn=fn: fn(k, v, kn, vn, pos),
                      k, v, kn, vn, pos)
        print()


if __name__ == "__main__":
    main()
