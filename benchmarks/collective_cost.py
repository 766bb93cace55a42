"""Measure the cross-chip split-KV merge's communication cost + overlap.

BASELINE's north star asks for "all-gather / reduce-scatter collectives
overlapped with attention compute". This script quantifies the merge:

  local   — each chip attends its KV shard, NO cross-chip merge (lower bound)
  merged  — + pmax/psum LSE merge (the shipped path, 2 collectives)
  chunk2/4 — heads processed in chunks so chunk i's merge overlaps chunk
             i+1's attention kernel (parallel/distributed_decode.py)

Prints per-variant time and the exposed communication fraction
(merged − local) / merged. Runs on the virtual 8-device CPU mesh anywhere
(functional structure; CPU has no ICI so overlap gains only appear on real
multi-chip TPU — the numbers still bound the collective count cost) and on a
real TPU slice unchanged.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 python benchmarks/collective_cost.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import os

import jax

# The axon TPU plugin overrides the JAX_PLATFORMS env var, and the backend
# must be forced BEFORE first use — asking for a virtual device count means
# the caller wants the CPU mesh (a single real chip cannot host collectives).
if "--xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from starflashattention_tpu.ops.flash_decode import flash_decode_with_stats
from starflashattention_tpu.parallel import make_mesh
from starflashattention_tpu.parallel.distributed_decode import (
    lse_reduce_local,
    make_seq_sharded_decode,
)

B, HQ, HKV, D = 8, 32, 8, 128
S_PER_SHARD = 1024
NUM_SPLITS, BLOCK_K = 2, 256


def timeit(fn, *args, iters=30) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main() -> None:
    n_dev = len(jax.devices())
    mesh = make_mesh({"seq": n_dev})
    s_total = S_PER_SHARD * n_dev
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, HKV, s_total, D)) * 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, HKV, s_total, D)) * 0.1, jnp.float32)
    lengths = jnp.asarray(
        rng.integers(s_total // 2, s_total, size=(B,)), jnp.int32
    )

    # Lower bound: per-chip attention, NO merge (partials stay sharded).
    def local_only(q, k_shard, v_shard, lengths):
        idx = jax.lax.axis_index("seq")
        local_len = jnp.clip(lengths - idx * S_PER_SHARD, 0, S_PER_SHARD)
        o, m, l = flash_decode_with_stats(
            q, k_shard, v_shard, local_len, num_splits=NUM_SPLITS, block_k=BLOCK_K
        )
        return lse_reduce_local(o, m, l)

    spec_kv = P(None, None, "seq", None)
    local_fn = jax.jit(
        jax.shard_map(
            local_only, mesh=mesh,
            in_specs=(P(), spec_kv, spec_kv, P()),
            out_specs=(P("seq"), P("seq"), P("seq")),  # partials left sharded
            check_vma=False,
        )
    )

    variants = {"local_no_merge": lambda: timeit(local_fn, q, k, v, lengths)}
    for name, chunks in (("merged", 1), ("merged_chunk2", 2), ("merged_chunk4", 4)):
        fn = make_seq_sharded_decode(
            mesh, seq_axis="seq", num_splits=NUM_SPLITS, block_k=BLOCK_K,
            head_chunks=chunks,
        )
        variants[name] = lambda fn=fn: timeit(fn, q, k, v, lengths)

    results = {name: run() for name, run in variants.items()}
    t_local = results["local_no_merge"]
    report = {
        "n_devices": n_dev,
        "backend": jax.default_backend(),
        "shape": {"B": B, "Hq": HQ, "Hkv": HKV, "D": D, "S_total": s_total},
        "times_ms": {k: round(v * 1e3, 3) for k, v in results.items()},
        "exposed_comm_fraction": {
            k: round(max(v - t_local, 0.0) / v, 4)
            for k, v in results.items()
            if k != "local_no_merge"
        },
    }
    print(json.dumps(report))
    out = Path(__file__).parent / "artifacts" / "collective_cost.json"
    out.write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
