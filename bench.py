"""Canonical benchmark: 7B-GQA decode tokens/s/chip on real TPU.

Prints TWO JSON lines on TPU (one on the CPU fallback):
  1. the serving-frontier config — INT4 weights (nibble-packed, grouped
     scales, g128 default) + INT8 KV cache — the repo's best measured
     tokens/s, informational line;
  2. LAST, the canonical north-star line {"metric", "value", "unit",
     "vs_baseline"} — weight-only INT8 (+ int8 lm_head), bf16 KV. The
     driver parses the tail line, so the canonical metric stays the one
     tracked across rounds.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` reports
achieved effective HBM bandwidth as a fraction of the BASELINE.json target
(85% of the per-chip roofline): vs_baseline = achieved_BW / (0.85 * roofline).
>1.0 means the bandwidth target is beaten. Decode at these shapes is
weight+cache-read bound, so effective BW = bytes_touched_per_step / step_time.

Timing protocol (utils/profiling.time_scanned): N decode steps chained in ONE
XLA program (a lax.scan of the step), so per-call dispatch and the axon
tunnel's ~25-30 ms readback amortize over N — wall-clocking individual calls
through the tunnel measures host dispatch gaps, not the chip.

Byte accounting is conservative (real traffic only): weights actually
streamed per step (the embedding table is a B-row gather, NOT a full read),
the valid KV prefix read, the windowed append write, and the logits write.

Robustness contract (round 4): the run is budgeted by SFA_BENCH_DEADLINE_S
(default 240 s), a watchdog thread emits the best-so-far JSON line(s) and
exits 0 if the tunnel stalls, repeats stop early as the deadline nears, and
the donated carry is re-armed by resetting lengths instead of re-initializing
the 2.1 GB cache per repeat. The canonical JSON line ALWAYS prints, and
always LAST.
"""

from __future__ import annotations

import dataclasses
import functools
import gc
import json
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np

# v5e per-chip HBM bandwidth roofline (bytes/s)
HBM_ROOFLINE = 819e9
TARGET_FRACTION = 0.85

# --- always-emit guard -------------------------------------------------------
# Round 3's driver run of this file timed out (BENCH_r03.json rc=124) and
# captured NOTHING. The reference's harness always prints its timing block
# (examples/cpp/testFlashDecoder.cc:95-129); ours must too. A watchdog THREAD
# (not SIGALRM — a readback blocked inside the tunnel's C extension never
# returns to the Python signal handler) emits the best-so-far result at the
# deadline and hard-exits 0, so the driver parses a number on even the worst
# tunnel day. Between repeats the main loop also checks the deadline and
# stops early rather than racing the watchdog.
_DEADLINE_S = float(os.environ.get("SFA_BENCH_DEADLINE_S", "240"))
_EMIT_LOCK = threading.Lock()
_STATE: dict = {"emitted": False, "payload": None, "extra_payload": None}


def _payload(tokens_per_s: float, vs_baseline: float) -> dict:
    return {
        "metric": "decode_tokens_per_s_per_chip_7b_gqa_int8w",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(vs_baseline, 3),
    }


def _extra_payload(tokens_per_s: float, vs_baseline: float) -> dict:
    return {
        "metric": "decode_tokens_per_s_per_chip_7b_gqa_int4w_int8kv",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(vs_baseline, 3),
    }


def _emit_all() -> None:
    """Print the informational int4 line (if measured), then the canonical
    int8 line LAST (the driver parses the tail line). Exactly once."""
    with _EMIT_LOCK:
        if _STATE["emitted"]:
            return
        _STATE["emitted"] = True
        if _STATE["extra_payload"] is not None:
            print(json.dumps(_STATE["extra_payload"]), flush=True)
        print(json.dumps(_STATE["payload"] or _payload(0.0, 0.0)), flush=True)


def _watchdog() -> None:
    # Nothing completed -> a parseable failure line beats a silent timeout.
    _emit_all()
    os._exit(0)


def _bytes_per_step(params, cache, mean_len: float, batch: int, vocab: int) -> float:
    """HBM bytes a decode step must move (counted honestly, see module doc)."""
    l, b, hkv, _, d = cache.k.shape
    itemsize = cache.k.dtype.itemsize
    embed_table = params["embed"].size * params["embed"].dtype.itemsize
    weights = (
        sum(p.size * p.dtype.itemsize for p in jax.tree.leaves(params)) - embed_table
    )
    embed_rows = batch * params["embed"].shape[1] * params["embed"].dtype.itemsize
    kv_read = 2 * l * b * hkv * mean_len * d * itemsize
    # windowed-RMW append (ops/cache_append): read+write a 32-row window, K+V
    append = 4 * l * b * hkv * 32 * d * itemsize
    logits_write = batch * vocab * 4
    return weights + embed_rows + kv_read + append + logits_write


def _run_chain(weight_mode: str, kv_mode: str, record, *, t_start, time_mod,
               reps: int = 4, reserve_s: float = 5.0):
    """Build the 7B decode chain for one quant config, run up to ``reps``
    timed repeats, calling ``record(per_step_seconds, bytes_step, batch)``
    after each (per-step = (best wall − RTT)/iters). Frees params/cache
    before returning."""
    from starflashattention_tpu.cache import contiguous
    from starflashattention_tpu.models import llama
    from starflashattention_tpu.runtime.autotune import DecodeAutotuner, DecodeConfig
    from starflashattention_tpu.runtime.params import ModelConfig
    from starflashattention_tpu.utils.profiling import _force, _tunnel_rtt

    batch, ctx = 16, 1024
    iters = 192  # 512 + 192 stays inside the 1024-slot cache

    # Kernel knobs come from the MEMOIZED on-device autotune cache
    # (runtime/autotune.py; regenerated by benchmarks/autotune_headline.py on
    # the target device — the closed-loop replacement for the reference's
    # "tuned for 3090" constants, flash_attn.cu:1024). The bench runs under a
    # hard deadline, so a cache miss falls back to the last committed winner
    # instead of re-measuring here.
    tuner = DecodeAutotuner(
        cache_path="benchmarks/artifacts/autotune_cache.json")
    kv_dtype = jnp.int8 if kv_mode == "int8" else jnp.bfloat16
    pick = tuner.peek_decode(batch, 32, 8, ctx, 128, kv_dtype) or DecodeConfig(
        num_splits=1, block_k=64, batch_block=16)
    cfg = ModelConfig.llama_7b_gqa(
        max_seq_len=1024, num_splits=pick.num_splits, block_k=pick.block_k,
        batch_block=pick.batch_block,
        **({"quant_mode": "int8"} if kv_mode == "int8" else {}),
    )
    if weight_mode == "int4":
        group = tuner.peek_int4_group(4096, 4096)
    else:
        group = None

    params = llama.init_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16, quantize=weight_mode,
        int4_group=group)
    # Weight-only quant with fused in-kernel dequant (ops/quant_matmul.py),
    # INCLUDING the lm_head (the step's largest single dense stream, 262 MB
    # bf16; accuracy asserted by benchmarks/quant_accuracy.py).
    params = llama.quantize_model_weights(
        params, weight_mode, consume=True, lm_head=True, int4_group=group)
    cache = contiguous.init_cache(
        cfg.num_layers, batch, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.bfloat16,
        **({"quant_mode": "int8"} if kv_mode == "int8" else {}),
    )
    # Mid-context working point: every sequence at ctx/2 — the reference's
    # own benchmark convention (uniform seq_len per run, examples/cpp/
    # testFlashDecoder.cc:141-149). Ragged robustness is covered by tests
    # and the serving benches; kernel knobs (batch_block=16) are the
    # measured winner for uniform lengths (benchmarks/sweep_decode.py).
    lens = np.full((batch,), ctx // 2, np.int64)
    cache = contiguous.advance(cache, jnp.asarray(lens, jnp.int32))
    cos, sin = llama.rope_tables(cfg)
    tok = jnp.zeros((batch,), jnp.int32)

    # Static bound on lengths over the whole chain (start + iters appends):
    # the serving engine derives the same per-round hint from host-known
    # slot lengths (Engine._round_len_hint), so the benched program is the
    # served program.
    hint = int(lens.max()) + iters + 1
    hint = None if hint >= cfg.max_seq_len else hint

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(carry, params, cos, sin):
        def body(c, _):
            cache, tok = c
            logits, cache = llama._decode_core(
                params, cache, tok, cos, sin, cfg, max_len_hint=hint
            )
            return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), None
        c, _ = jax.lax.scan(body, carry, None, length=iters)
        return c

    start_lengths = cache.lengths + 0  # live copy to re-arm the reused carry

    def rearm(carry):
        # The chain appends in place (aliased, donated cache), so after a
        # run the lengths have advanced by `iters`. Re-arm by resetting ONLY
        # the (B,)-int32 lengths — the K/V buffers are reused as-is (stale
        # rows past `lengths` are never read; the kernel's index-map clamp
        # skips them). A fresh init_cache per repeat (the round-3 protocol)
        # cost ~5x 2.1 GB of HBM writes and was the main reason the bench
        # could outlive the driver's budget on a slow tunnel day.
        c, _tok = carry
        return dataclasses.replace(c, lengths=start_lengths + 0), _tok

    rtt = _tunnel_rtt()
    mean_len = float(np.mean(lens)) + iters / 2  # lengths advance along the chain
    bytes_step = _bytes_per_step(params, cache, mean_len, batch, cfg.vocab_size)

    carry = (cache, tok)
    carry = run(carry, params, cos, sin)  # compile + warm
    _force(carry)
    times: list[float] = []
    for rep in range(reps):
        carry = rearm(carry)
        jax.block_until_ready(carry[0].lengths)
        t0 = time_mod.time()
        carry = run(carry, params, cos, sin)
        _force(carry)
        times.append(time_mod.time() - t0)
        record((min(times) - rtt) / iters, bytes_step, batch)
        # one repeat takes ~2 s on chip; stop if another might cross the line
        if time_mod.time() - t_start > _DEADLINE_S - 2 * times[-1] - reserve_s:
            break
    del carry, params, cache
    gc.collect()


def main() -> None:
    import time as _time

    t_start = _time.time()
    timer = threading.Timer(_DEADLINE_S, _watchdog)
    timer.daemon = True
    timer.start()

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:  # CPU smoke fallback so the line always prints
        from starflashattention_tpu.cache import contiguous
        from starflashattention_tpu.models import llama
        from starflashattention_tpu.runtime.params import ModelConfig

        cfg = ModelConfig.tiny(dtype="float32")
        batch, ctx, iters = 2, 64, 6
        params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        cache = contiguous.init_cache(
            cfg.num_layers, batch, cfg.num_kv_heads, cfg.max_seq_len,
            cfg.head_dim, dtype=jnp.float32)
        cos, sin = llama.rope_tables(cfg)
        tok = jnp.zeros((batch,), jnp.int32)
        t0 = _time.time()
        for _ in range(iters):
            logits, cache = llama.decode_step(params, cache, tok, cos, sin, cfg)
        jax.block_until_ready(logits)
        _STATE["payload"] = _payload(batch * iters / (_time.time() - t0), 0.0)
        timer.cancel()
        _emit_all()
        return

    # 1) canonical north-star chain FIRST (weight-only INT8, bf16 KV) — the
    #    watchdog then always has the canonical line to emit
    def record_int8(per_step, bytes_step, batch):
        vs = (bytes_step / per_step) / (TARGET_FRACTION * HBM_ROOFLINE)
        _STATE["payload"] = _payload(batch / per_step, vs)

    _run_chain("int8", "none", record_int8, t_start=t_start, time_mod=_time)

    # 2) serving frontier: INT4 weights (g128 grouped) + INT8 KV — both
    #    dominant byte streams shrunk; the repo's best measured tokens/s
    #    (bench_suite model7b_int4w_int8kv_headline). Skipped if the deadline
    #    is near (compile ~30 s + repeats); the canonical line still prints.
    def record_int4(per_step, bytes_step, batch):
        vs = (bytes_step / per_step) / (TARGET_FRACTION * HBM_ROOFLINE)
        _STATE["extra_payload"] = _extra_payload(batch / per_step, vs)

    if _time.time() - t_start < _DEADLINE_S - 75:
        try:
            _run_chain("int4", "int8", record_int4, t_start=t_start,
                       time_mod=_time, reps=3)
        except Exception:
            pass  # informational line only — never block the canonical emit

    timer.cancel()
    _emit_all()


if __name__ == "__main__":
    main()
