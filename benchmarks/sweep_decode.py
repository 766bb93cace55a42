"""Sweep flash_decode (num_splits, block_k, batch_block) at the headline
bench shapes (stacked 32-layer table, ragged 256/512 lengths, B=16, Hkv=8).

The trace (benchmarks/trace_ops.py) shows the kernel at 48.7 us/layer vs
~31 us of pure DMA — the gap is idle grid steps over clamped tail blocks
plus per-group pipeline ramp. This measures which geometry minimizes it.

Usage: python benchmarks/sweep_decode.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.ops.flash_decode import flash_decode
from starflashattention_tpu.utils.profiling import time_scanned

B, HQ, HKV, D, S, L = 16, 32, 8, 128, 1024, 32
HBM_BW = 819e9

CONFIGS = [
    (1, 64, 8),   # current autotuned winner
    (1, 64, 16),
    (1, 128, 8),
    (1, 128, 4),
    (1, 128, 16),
    (1, 256, 8),
    (1, 32, 8),
    (2, 64, 8),
    (2, 128, 8),
]


def main() -> None:
    dtype = jnp.bfloat16
    # Generate ON DEVICE: a (L,B,Hkv,S,D) host-numpy array is ~4 GB of f64
    # that then crawls through the remote tunnel (measured: minutes).
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, HQ, D), dtype)
    k = jax.random.normal(kk, (L, B, HKV, S, D), dtype) * jnp.asarray(0.1, dtype)
    v = jax.random.normal(kv, (L, B, HKV, S, D), dtype) * jnp.asarray(0.1, dtype)
    jax.block_until_ready((q, k, v))
    lens = np.full((B,), S // 2, np.int32)
    lens[: B // 2] = S // 4
    lengths = jnp.asarray(lens + 1, jnp.int32)
    mean_len = float(np.mean(lens)) + 1
    gbytes = 2 * B * HKV * mean_len * D * 2 / 1e9

    for ns, bk, bb in CONFIGS:
        try:
            def step(qq, k, v, lengths, ns=ns, bk=bk, bb=bb):
                o = flash_decode(
                    qq, k, v, lengths, layer=0,
                    num_splits=ns, block_k=bk, batch_block=bb,
                )
                return qq + o.astype(qq.dtype) * jnp.asarray(1e-3, qq.dtype)

            per, _ = time_scanned(step, q, k, v, lengths, iters=512, repeats=3)
            frac = gbytes * 1e9 / per / HBM_BW
            print(f"ns={ns} bk={bk:4d} bb={bb:2d}: {per*1e6:7.2f} us  {frac:5.2f} roofline")
        except Exception as e:
            print(f"ns={ns} bk={bk:4d} bb={bb:2d}: FAILED {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
