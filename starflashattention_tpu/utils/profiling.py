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
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
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


_rtt_cache: dict[str, float] = {}


def _tunnel_rtt() -> float:
    """Min round-trip of a trivial dispatch+readback (amortization baseline).

    64 probes, not 8: time_scanned subtracts this FLOOR from a min over
    many chain repeats — if the chain's min gets luckier tunnel draws than
    the baseline's, the subtraction overshoots and per-step time reads LOW
    (the r5 invariant caught decode_kernel_hkv8_seq511 at an impossible
    1.086 of the HBM roofline from exactly this). More probes push the
    baseline to the true floor, making the estimate honest-or-conservative.
    """
    key = jax.default_backend()
    if key not in _rtt_cache:
        one = jnp.zeros((8,), jnp.float32)
        f = jax.jit(lambda x: x + 1.0)
        _force(f(one))
        _rtt_cache[key] = min(
            _timed(lambda: _force(f(one))) for _ in range(64)
        )
    return _rtt_cache[key]


def _timed(thunk) -> float:
    t0 = time.time()
    thunk()
    return time.time() - t0


def time_scanned(
    fn: Callable,
    carry,
    *consts,
    iters: int = 256,
    repeats: int = 5,
    min_window_s: float | None = None,
    donate_carry: bool = False,
) -> tuple[float, object]:
    """Per-iteration seconds of ``carry = fn(carry, *consts)`` — the honest
    protocol for sub-dispatch-floor kernels.

    ``time_marginal`` chains jitted calls from Python, so anything faster
    than the per-call dispatch floor (~0.1 ms through the tunnel) measures
    the host, not the chip. Here the whole chain is ONE program — a
    ``lax.scan`` of ``fn`` — so dispatch and readback RTT amortize over
    ``iters``; the residual RTT is subtracted using a measured no-op
    round-trip, and min-of-``repeats`` rejects tunnel jitter. Large arrays
    must be passed via ``*consts`` (program operands), never closed over
    (jit constants ship to the remote compiler wholesale).

    If the measured window is shorter than ``min_window_s``, the chain is
    recompiled longer once (scan compile time is O(1) in ``iters``).

    ``donate_carry=True`` donates the carry into the chain and threads each
    run's output in as the next run's carry. Without it, a carry that the
    chain updates in place (e.g. a KV cache) is COPIED wholesale at chain
    start — wrong bytes charged, and a near-HBM-sized carry OOMs outright.
    The caller's ``carry`` is consumed, and state advances across repeats
    (size the carry so iters × (repeats+1) steps stay in capacity).
    """

    def build(n):
        @functools.partial(jax.jit, donate_argnums=(0,) if donate_carry else ())
        def run(carry, *consts):
            def body(c, _):
                return fn(c, *consts), None
            c, _ = jax.lax.scan(body, carry, None, length=n)
            return c
        return run

    def timed_run(run, carry):
        if donate_carry:
            times = []
            for _ in range(repeats):
                t0 = time.time()
                carry = run(carry, *consts)
                _force(carry)
                times.append(time.time() - t0)
            return min(times), carry
        t = min(_timed(lambda: _force(run(carry, *consts))) for _ in range(repeats))
        return t, carry

    rtt = _tunnel_rtt()
    # The subtracted RTT is itself noisy (±~30% call to call); a window of
    # only a few RTTs turns that noise into a many-% per-step error — the
    # round-5 invariant caught paged_decode reading 1.03 of the HBM roofline
    # from an 81 ms window. Default (None) = >= 10 RTTs; an explicit value
    # is always honored (autotune candidate sweeps trade precision for time
    # and pass min_window_s=0.04 deliberately).
    if min_window_s is None:
        min_window_s = max(0.08, 10 * rtt)
    run = build(iters)
    out = run(carry, *consts)
    _force(out)  # compile + warm
    if donate_carry:
        carry = out  # original buffer was donated into the warm run
    t, out = timed_run(run, carry)
    if donate_carry:
        carry = out
    if t - rtt < min_window_s and iters < 32768 and not donate_carry:
        # cap 32768 (was 4096): a ~5 us micro-kernel needs ~16k chained steps
        # before the window dwarfs the ~27 ms tunnel RTT; scan compile time
        # is O(1) in length (rolled loop). Never auto-extend a donated-carry
        # chain: the caller sized its state (e.g. cache capacity) for
        # exactly iters x repeats steps.
        iters = min(32768, max(iters * 2, int(iters * min_window_s / max(t - rtt, 1e-4))))
        run = build(iters)
        out = run(carry, *consts)
        _force(out)
        if donate_carry:
            carry = out
        t, out = timed_run(run, carry)
    return max(t - rtt, 1e-9) / iters, out


def roofline_fraction(bytes_touched: float, seconds: float, peak_bw: float = 819e9) -> float:
    """Fraction of HBM roofline achieved (v5e default 819 GB/s)."""
    return bytes_touched / seconds / peak_bw
