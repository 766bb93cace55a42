"""Canonical benchmark: 7B-GQA decode tokens/s/chip on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` reports
achieved effective HBM bandwidth as a fraction of the BASELINE.json target
(85% of the per-chip roofline): vs_baseline = achieved_BW / (0.85 * roofline).
>1.0 means the bandwidth target is beaten. Decode at these shapes is
weight+cache-read bound, so effective BW = bytes_touched_per_step / step_time.

Timing protocol: the axon tunnel makes block_until_ready dispatch-only and
adds ~25-30 ms per host readback, so we chain N steps per measurement and use
the marginal time between a short and a long chain.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# v5e per-chip HBM bandwidth roofline (bytes/s)
HBM_ROOFLINE = 819e9
TARGET_FRACTION = 0.85


def _bytes_per_step(params_bytes: int, cache, mean_len: float) -> float:
    """HBM bytes read per decode step: all weights + the valid KV prefix."""
    l, b, hkv, _, d = cache.k.shape
    itemsize = cache.k.dtype.itemsize
    kv_bytes = 2 * l * b * hkv * mean_len * d * itemsize
    return params_bytes + kv_bytes


def main() -> None:
    from starflashattention_tpu.cache import contiguous
    from starflashattention_tpu.models import llama
    from starflashattention_tpu.runtime.params import ModelConfig

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # Kernel knobs from the measured on-device sweep (runtime/autotune.py;
        # winner memoized in benchmarks/artifacts/autotune_cache.json):
        # single-split fused-epilogue decode, 8 sequences per grid cell,
        # 64-row KV blocks (tight fetch for ragged lengths).
        cfg = ModelConfig.llama_7b_gqa(
            max_seq_len=1024, num_splits=1, block_k=64, batch_block=8
        )
        batch, ctx, dtype = 16, 1024, jnp.bfloat16
        warm_chain, n_chain = 4, 24
    else:  # CPU smoke fallback so the line always prints
        cfg = ModelConfig.tiny(dtype="float32")
        batch, ctx, dtype = 2, 64, jnp.float32
        warm_chain, n_chain = 2, 6

    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    if on_tpu:
        # Headline = the north-star configuration: weight-only INT8 with
        # fused in-kernel dequant (ops/quant_matmul.py).
        params = llama.quantize_model_weights(params, "int8", consume=True)
    params_bytes = sum(p.size * p.dtype.itemsize for p in jax.tree.leaves(params))
    cache = contiguous.init_cache(
        cfg.num_layers, batch, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim, dtype=dtype
    )
    # Mid-context working point: decode at ctx/2 ± ragged lengths.
    lens = np.full((batch,), ctx // 2, np.int64)
    lens[: batch // 2] = ctx // 4
    cache = contiguous.advance(cache, jnp.asarray(lens, jnp.int32))
    cos, sin = llama.rope_tables(cfg)
    tok = jnp.zeros((batch,), jnp.int32)

    def chain(n):
        nonlocal cache
        t0 = time.time()
        logits = None
        for _ in range(n):
            logits, cache = llama.decode_step(params, cache, tok, cos, sin, cfg)
        _ = np.asarray(logits[:1, :1])  # force full execution through the tunnel
        return time.time() - t0

    chain(1)  # compile
    t_short = chain(warm_chain)
    t_long = chain(n_chain)
    per_step = (t_long - t_short) / (n_chain - warm_chain)

    tokens_per_s = batch / per_step
    mean_len = float(np.mean(lens)) + (warm_chain + n_chain) / 2
    achieved_bw = _bytes_per_step(params_bytes, cache, mean_len) / per_step
    vs_baseline = achieved_bw / (TARGET_FRACTION * HBM_ROOFLINE) if on_tpu else 0.0

    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_s_per_chip_7b_gqa_int8w",
                "value": round(tokens_per_s, 1),
                "unit": "tokens/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
