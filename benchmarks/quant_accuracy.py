"""Quantization accuracy at 7B scale: INT8 weights / INT8 KV vs the bf16 twin.

BASELINE.json's metric includes "logit max-abs-err / perplexity within the
scheme's stated Δ at 7B" — tests/test_quant.py asserts this at toy shapes;
this measures it at the full 7B geometry on the real chip.

Protocol (HBM forces separate passes — bf16 + int8 params together exceed
16 GB): each scheme runs init(seed 0) → [quantize] → prefill + TEACHER-FORCED
decode of the SAME fixed continuation tokens. Teacher forcing is load-bearing:
greedy trajectories diverge at the first argmax flip (random-init logits are
near-uniform over 32000 classes, so top-1 margins are ~1e-2) and positions
stop being comparable — measured: pos-0 max-err 0.12 vs 6.1 after divergence.

Reported per scheme: logit max-abs-err, mean-abs-err, and Δ cross-entropy
(nats) of the quantized model's distribution vs bf16 — the perplexity-delta
proxy (random-init weights have no meaningful absolute perplexity; the DELTA
between twins is exactly the quantization damage). Top-1 agreement is
reported as information only: with near-uniform random-init logits an
ε-perturbation flips argmax at rates no real checkpoint would show.

Stated Δ bounds (asserted): INT8 per-output-channel weights and INT8 per-head
KV are ~0.4%-relative-error schemes; on unit-variance logits the compounded
7B-depth damage stays under max-abs-err 0.5 / Δ-CE 0.02 nats.

Usage: python benchmarks/quant_accuracy.py [--quick]
"""

from __future__ import annotations

import argparse
import gc
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

# Per-scheme Δ bounds ("the scheme's stated Δ", BASELINE.json): INT8
# per-channel is a ~0.4%-relative scheme. FP8 E4M3's 3-bit mantissa is ~6%
# relative PER MATMUL for weight-only use; at 32 layers that compounds to
# ΔCE ~0.4 nats (measured at 7B) — the stated Δ of the scheme, and the
# reason weight-only INT8 (same bytes, 10x tighter) is the recommended
# default. FP8 KV is mild: only the attended values carry the error.
BOUNDS = {
    "int8": {"max_abs_err": 0.5, "delta_ce_nats": 0.02},
    "fp8_kv": {"max_abs_err": 1.0, "delta_ce_nats": 0.05},
    "fp8_weights": {"max_abs_err": 8.0, "delta_ce_nats": 0.8},
    # W8A8 prefill adds dynamic per-token activation quant (~0.4% relative
    # per matmul) on top of weight-only INT8 — roughly doubled compounded
    # damage vs weight-only, still far inside fp8 territory.
    "int8_w8a8": {"max_abs_err": 1.0, "delta_ce_nats": 0.05},
}


def run_model(cfg, *, weight_quant, prompts, plens, forced: np.ndarray,
              lm_head: bool = False):
    """Init (seed 0) → optionally quantize (weight_quant = None|"int8"|"fp8";
    ``lm_head=True`` also quantizes the output head) → prefill +
    TEACHER-FORCED decode of ``forced`` (B, n) tokens. Returns all logits,
    (B, n+1, V) on host."""
    from starflashattention_tpu.cache import contiguous
    from starflashattention_tpu.models import llama

    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if weight_quant:
        params = llama.quantize_model_weights(
            params, weight_quant, consume=True, lm_head=lm_head
        )
    b = prompts.shape[0]
    cache = contiguous.init_cache(
        cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.bfloat16, quant_mode=cfg.quant_mode,
        calibration_scale=cfg.kv_calibration_scale,
    )
    cos, sin = llama.rope_tables(cfg)
    logits, cache = llama.prefill(params, cache, prompts, plens, cos, sin, cfg)
    outs = [np.asarray(logits, np.float32)]
    for i in range(forced.shape[1]):
        tok = jnp.asarray(forced[:, i], jnp.int32)
        logits, cache = llama.decode_step(params, cache, tok, cos, sin, cfg)
        outs.append(np.asarray(logits, np.float32))
    del params, cache
    gc.collect()
    return np.stack(outs, axis=1)  # (B, n+1, V)


def compare(name: str, ref: np.ndarray, got: np.ndarray) -> dict:
    if "fp8_weights" in name:
        bounds = BOUNDS["fp8_weights"]
    elif "fp8" in name:
        bounds = BOUNDS["fp8_kv"]
    elif "w8a8" in name:
        bounds = BOUNDS["int8_w8a8"]
    else:
        bounds = BOUNDS["int8"]
    err = np.abs(got - ref)
    # Δ cross-entropy: E_p_ref[log p_ref - log p_got], mean over positions
    def logsoftmax(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    lp_ref, lp_got = logsoftmax(ref), logsoftmax(got)
    p_ref = np.exp(lp_ref)
    delta_ce = float((p_ref * (lp_ref - lp_got)).sum(-1).mean())
    out = {
        "scheme": name,
        "max_abs_err": round(float(err.max()), 4),
        "mean_abs_err": round(float(err.mean()), 5),
        "top1_agree": round(float((got.argmax(-1) == ref.argmax(-1)).mean()), 4),
        "delta_ce_nats": round(delta_ce, 5),
        "ref_logit_std": round(float(ref.std()), 3),
    }
    out["within_bounds"] = bool(
        out["max_abs_err"] <= bounds["max_abs_err"]
        and abs(out["delta_ce_nats"]) <= bounds["delta_ce_nats"]
    )
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    from starflashattention_tpu.runtime.params import ModelConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    if args.quick or jax.default_backend() != "tpu":
        cfg_kw = dict(num_layers=4, max_seq_len=512)
        b, sp, n_dec = 2, 128, 4
    else:
        cfg_kw = dict(max_seq_len=1024)
        b, sp, n_dec = 4, 512, 8

    rng = np.random.default_rng(0)
    prompts = jnp.asarray(rng.integers(0, 32000, (b, sp)), jnp.int32)
    plens = jnp.full((b,), sp, jnp.int32)
    forced = rng.integers(0, 32000, (b, n_dec))  # same continuation for all

    cfg = ModelConfig.llama_7b_gqa(**cfg_kw)
    ref = run_model(cfg, weight_quant=None, prompts=prompts, plens=plens, forced=forced)

    results = []
    for wq, kv, w8a8, lm in [
        ("int8", None, False, False), (None, "int8", False, False),
        ("int8", "int8", False, False),
        ("fp8", None, False, False), (None, "fp8", False, False),
        ("fp8", "fp8", False, False),
        ("int8", None, True, False),  # W8A8 prefill (int8 x int8 MXU path)
        # headline scheme: int8 weights INCLUDING the lm_head (bench.py)
        ("int8", None, False, True),
    ]:
        kw = dict(cfg_kw)
        if kv:
            kw["quant_mode"] = kv
        if w8a8:
            kw["w8a8_prefill"] = True
        c = ModelConfig.llama_7b_gqa(**kw) if (kv or w8a8) else cfg
        got = run_model(
            c, weight_quant=wq, prompts=prompts, plens=plens, forced=forced,
            lm_head=lm,
        )
        name = "+".join(filter(None, [f"{wq}_weights" if wq else None,
                                      f"{kv}_kv" if kv else None,
                                      "w8a8_prefill" if w8a8 else None,
                                      "lm_head" if lm else None]))
        results.append(compare(name, ref, got))
    out = Path(__file__).parent / "artifacts" / "quant_accuracy.json"
    out.write_text(json.dumps({"bounds": BOUNDS, "results": results}, indent=1))
    assert all(r["within_bounds"] for r in results), (
        f"quantization Δ bounds violated: {results}"
    )


if __name__ == "__main__":
    main()
