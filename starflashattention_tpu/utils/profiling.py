"""Profiling + timing helpers.

TPU analog of the reference's NVTX instrumentation
(/root/reference/examples/cpp/testFlashDecoder.cc:99-106 nvtxRangePushA/Pop;
ncu artifacts at the repo root): ``trace()`` captures an xplane/TensorBoard
trace via jax.profiler, and ``time_marginal`` implements the honest timing
protocol for this environment — the remote-execution tunnel makes
``block_until_ready`` dispatch-only and adds ~25-30 ms per host readback, so
wall-clocking one call measures the tunnel, not the chip. We instead chain
n_short and n_long iterations (data-dependent) and report the marginal
per-iteration time.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "benchmarks/artifacts/trace"):
    """jax.profiler trace capture (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _force(x) -> None:
    """Force execution through the tunnel: tiny host readback."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def time_marginal(
    step: Callable,
    state,
    *,
    n_short: int = 4,
    n_long: int = 24,
) -> tuple[float, object]:
    """Marginal per-iteration seconds of ``state = step(state)``.

    ``step`` must be data-dependent iteration-to-iteration (so the chain
    cannot be parallelized away). Returns (seconds_per_iter, final_state).
    """
    state = step(state)  # compile + warm
    _force(state)

    t0 = time.time()
    for _ in range(n_short):
        state = step(state)
    _force(state)
    t_short = time.time() - t0

    t0 = time.time()
    for _ in range(n_long):
        state = step(state)
    _force(state)
    t_long = time.time() - t0

    return (t_long - t_short) / (n_long - n_short), state


def roofline_fraction(bytes_touched: float, seconds: float, peak_bw: float = 819e9) -> float:
    """Fraction of HBM roofline achieved (v5e default 819 GB/s)."""
    return bytes_touched / seconds / peak_bw
