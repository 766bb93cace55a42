"""Sweep quant_matmul (block_h, block_o) at the 7B decode shapes.

w_down (H=11008) currently tiles block_h=256 (largest 128-multiple divisor
<= 512), i.e. 43 fine-grained accumulation steps — 0.83 of roofline in situ
vs 0.94-1.00 for the other projections. Bigger exact divisors exist (5504).

Usage: python benchmarks/sweep_qmm.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from starflashattention_tpu.ops.quant_matmul import quant_matmul
from starflashattention_tpu.utils.profiling import time_scanned

B, L = 16, 1
HBM_BW = 819e9

SHAPES = {
    "wqkv": (4096, 6144),
    "wo": (4096, 4096),
    "w_gate_up": (4096, 22016),
    "w_down": (11008, 4096),
}

BLOCKS = [(512, 2048), (1024, 2048), (2048, 2048), (4096, 2048),
          (5504, 2048), (5504, 4096), (1024, 4096), (2048, 4096),
          (512, 4096), (11008, 2048)]


def main() -> None:
    for name, (h, o) in SHAPES.items():
        kq, kw = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(kq, (B, h), jnp.bfloat16)
        w = jax.random.randint(kw, (L, h, o), -127, 127, jnp.int8)
        scale = jnp.full((L, o), 0.01, jnp.float32)
        gb = h * o / 1e9
        print(f"-- {name} ({h}x{o}, {gb*1e3:.0f} MB)")
        for bh, bo in BLOCKS:
            if bh > h:
                continue
            try:
                def step(s, x, w, scale, bh=bh, bo=bo):
                    out = quant_matmul(x + s, w, scale, layer=0, block_h=bh, block_o=bo)
                    return out[0, 0].astype(jnp.bfloat16) * 0

                per, _ = time_scanned(step, x[0, 0] * 0, x, w, scale, iters=256, repeats=3)
                frac = gb * 1e9 / per / HBM_BW
                print(f"  bh={bh:5d} bo={bo:4d}: {per*1e6:7.2f} us  {frac:5.2f} roofline", flush=True)
            except Exception as e:
                print(f"  bh={bh:5d} bo={bo:4d}: FAILED {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
