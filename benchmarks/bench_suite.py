"""Benchmark suite: the reference's sweep + BASELINE.json's five configs.

Mirrors the reference harness (examples/cpp/testFlashDecoder.cc:138-150:
B=2, H=32, D=128, (max_seq, seq) ∈ {512/511 … 8192/8191}, warmup + timed
iters) on the decode kernel, then runs the BASELINE.json config ladder.
Prints one JSON line per config. Run on the real chip:

    python benchmarks/bench_suite.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.core import quant
from starflashattention_tpu.ops.flash_decode import flash_decode
from starflashattention_tpu.utils.profiling import roofline_fraction, time_marginal

V5E_BW = 819e9


def _emit(name: str, ms: float, extra: dict):
    print(json.dumps({"bench": name, "ms": round(ms * 1e3, 4), **extra}), flush=True)


def decode_kernel_sweep(quick: bool = False):
    """Reference sweep: decode kernel at B=2, Hq=32, D=128 over seq lengths.

    The reference is MHA (no GQA, SURVEY.md §2.9j) — Hkv=32 matches it; a
    GQA column (Hkv=8) shows the grouped-query win.
    """
    cases = [(512, 511), (1024, 1023), (2048, 2047), (4096, 4096), (8192, 6143), (8192, 8191)]
    if quick:
        cases = cases[:2]
    b, hq, d = 2, 32, 128
    rng = np.random.default_rng(0)
    for hkv in (32, 8):
        for max_seq, seq in cases:
            k = jnp.asarray(rng.standard_normal((b, hkv, max_seq, d)), jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((b, hkv, max_seq, d)), jnp.bfloat16)
            lengths = jnp.full((b,), seq, jnp.int32)

            @jax.jit
            def step(q, k=k, v=v, lengths=lengths):
                o = flash_decode(q, k, v, lengths, num_splits=4, block_k=256)
                # tiny feedback keeps the chain data-dependent without
                # letting the compiler drop the kernel
                return q + o.astype(q.dtype) * jnp.bfloat16(1e-3)

            q0 = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
            per, _ = time_marginal(lambda q: step(q), q0)
            bytes_touched = 2 * b * hkv * seq * d * 2
            _emit(
                f"decode_kernel_hkv{hkv}_seq{seq}",
                per,
                {
                    "GBps": round(bytes_touched / per / 1e9, 1),
                    "roofline_frac": round(roofline_fraction(bytes_touched, per), 3),
                },
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    decode_kernel_sweep(quick=args.quick)


if __name__ == "__main__":
    main()
