"""Round-5 prefill tile-shape experiment: asymmetric (block_q, block_k).

Insight from the r4 ceiling study: causal OVER-COMPUTE is set by block_q
(every row in a q block computes all kv columns up to the block's LAST
row's diagonal → computed/useful = (S + block_q)/S at matched tiles),
while per-tile MXU efficiency is set by block_k (the QK dot's N dim).
The r4 sweep only tried SYMMETRIC smaller tiles (256/512 both dims, which
collapses per-tile efficiency); a small block_q with a big block_k was
never measured. At seq 2048 the predicted ceiling for (512, 1024) is
(2048/2560 waste ratio) x (~0.71 per-tile) ≈ 0.57 of MXU peak vs the
0.474 shipped default.

Usage: python benchmarks/exp/exp_prefill_tiles_r5.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from starflashattention_tpu.ops.flash_prefill import flash_prefill
from starflashattention_tpu.utils.profiling import time_scanned

V5E_BF16 = 394.5e12 / 2


def main():
    assert jax.default_backend() == "tpu"
    b, hq, hkv, d = 1, 32, 8, 128
    out = []
    for sq in (2048, 4096):
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (b, hq, sq, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, hkv, sq, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, hkv, sq, d), jnp.bfloat16)
        lengths = jnp.full((b,), sq, jnp.int32)
        for bq, bk in ((1024, 1024), (512, 1024), (256, 1024),
                       (512, 512), (128, 1024), (256, 2048)):
            def step(q, k, v, lengths, bq=bq, bk=bk):
                o = flash_prefill(q, k, v, lengths=lengths, causal=True,
                                  block_q=bq, block_k=bk)
                return q + o.astype(q.dtype) * jnp.bfloat16(1e-3)

            per, _ = time_scanned(step, q, k, v, lengths, iters=32, repeats=8)
            flops = 4.0 * b * hq * sq * (sq / 2) * d
            line = {"exp": f"prefill_tiles_seq{sq}_bq{bq}_bk{bk}",
                    "ms": round(per * 1e3, 4),
                    "mxu_frac": round(flops / per / V5E_BF16, 3)}
            print(json.dumps(line), flush=True)
            out.append(line)
    art = Path(__file__).resolve().parents[1] / "artifacts" / "results_round5.jsonl"
    with open(art, "a") as f:
        for line in out:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
