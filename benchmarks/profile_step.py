"""Component-level timing breakdown of the 7B decode step (real TPU).

Answers "where does the step time go?" with the honest scan-chain protocol
(utils/profiling.time_scanned): each component is chained into one XLA
program so per-call dispatch cannot pollute sub-millisecond measurements.
Each row prints measured time, the HBM bytes the component must touch, and
the implied roofline fraction — the gap rows are where to optimize.

Usage: python benchmarks/profile_step.py [--batch 16] [--ctx 1024]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.cache import contiguous
from starflashattention_tpu.models import llama
from starflashattention_tpu.ops.cache_append import append_rows_kv
from starflashattention_tpu.ops.flash_decode import flash_decode
from starflashattention_tpu.ops.quant_matmul import quant_matmul
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.utils.profiling import time_scanned

HBM_BW = 819e9


def row(name: str, seconds: float, gbytes: float) -> None:
    frac = gbytes * 1e9 / seconds / HBM_BW if seconds > 0 else 0.0
    print(f"{name:34s} {seconds * 1e6:9.1f} us  {gbytes * 1e3:9.2f} MB  {frac:5.2f} roofline")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=1024)
    args = ap.parse_args()

    cfg = ModelConfig.llama_7b_gqa(
        max_seq_len=args.ctx, num_splits=1, block_k=64, batch_block=8
    )
    b, dtype = args.batch, jnp.bfloat16
    L, hq, hkv, d, h = (
        cfg.num_layers, cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim, cfg.hidden_size,
    )
    inter, v = cfg.intermediate_size, cfg.vocab_size

    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    params = llama.quantize_model_weights(params, "int8", consume=True)
    cache = contiguous.init_cache(L, b, hkv, cfg.max_seq_len, d, dtype=dtype)
    lens = np.full((b,), args.ctx // 2, np.int64)
    lens[: b // 2] = args.ctx // 4
    cache = contiguous.advance(cache, jnp.asarray(lens, jnp.int32))
    mean_len = float(np.mean(lens))
    cos, sin = llama.rope_tables(cfg)
    tok = jnp.zeros((b,), jnp.int32)

    layers = params["layers"]

    # ---- full step --------------------------------------------------------
    # params MUST ride as an operand (time_scanned consts): closed-over
    # arrays become jit constants and the whole 6.7 GB pytree would be
    # serialized to the remote compiler.
    def full_step(carry, params, cos, sin):
        cache, tok = carry
        logits, cache = llama._decode_core(params, cache, tok, cos, sin, cfg)
        return cache, jnp.argmax(logits[:, :1], -1).astype(jnp.int32) * 0

    t_full, _ = time_scanned(full_step, (cache, tok), params, cos, sin, iters=64, repeats=3)
    params_b = sum(p.size * p.dtype.itemsize for p in jax.tree.leaves(params))
    kv_b = 2 * L * b * hkv * mean_len * d * cache.k.dtype.itemsize
    row("FULL decode step", t_full, (params_b + kv_b) / 1e9)
    print()

    # ---- quantized matmuls (per layer, at decode batch) -------------------
    x0 = jnp.ones((b, h), dtype)
    qmm_parts = {}
    for name, h_in in (("wqkv", h), ("wo", hq * d), ("w_gate_up", h), ("w_down", inter)):
        w = layers[name]
        xin = jnp.ones((b, h_in), dtype)

        def qf(s, xin, w8, sc):
            out = quant_matmul(xin + s, w8, sc, layer=0)
            return out[0, 0].astype(dtype) * 0

        t, _ = time_scanned(qf, xin[0, 0] * 0, xin, w["w"], w["scale"], iters=256, repeats=3)
        gb = w["w"][0].size * 1 / 1e9  # int8: 1 B/elem, one layer
        qmm_parts[name] = t
        row(f"quant_matmul {name}", t, gb)
    t_qmm_layer = sum(qmm_parts.values())
    row("  -> all projections x L", t_qmm_layer * L,
        sum(layers[n]["w"][0].size for n in qmm_parts) * L / 1e9)
    print()

    # ---- attention kernel (one layer, stacked table) ----------------------
    q0 = jnp.ones((b, hq, d), dtype)
    lengths = cache.lengths + 1

    def att(s, q0, k, v, lengths):
        o = flash_decode(
            q0 + s, k, v, lengths, layer=0,
            num_splits=cfg.num_splits, block_k=cfg.block_k, batch_block=cfg.batch_block,
        )
        return o[0, 0, 0].astype(dtype) * 0

    t_att, _ = time_scanned(att, q0[0, 0, 0] * 0, q0, cache.k, cache.v, lengths,
                            iters=256, repeats=3)
    gb_att = 2 * b * hkv * mean_len * d * cache.k.dtype.itemsize / 1e9
    row("flash_decode (1 layer)", t_att, gb_att)
    row("  -> x L", t_att * L, gb_att * L)
    print()

    # ---- cache append (one layer) ----------------------------------------
    kn = jnp.ones((b, hkv, d), dtype)

    def app(carry, pos):
        k, v, kn = carry
        k, v = append_rows_kv(k, v, kn, kn, 0, pos)
        return (k, v, kn + k[0, 0, 0, 0, 0] * 0), None

    from starflashattention_tpu.utils.profiling import _force, _timed, _tunnel_rtt

    @jax.jit
    def app_chain(carry, pos):
        def body(c, _):
            c, _ = app(c, pos)
            return c, None
        c, _ = jax.lax.scan(body, carry, None, length=256)
        return c

    pos_w = jnp.minimum(cache.lengths, cfg.max_seq_len - 1)
    out = app_chain((cache.k, cache.v, kn), pos_w)
    _force(out)
    t_app = (min(_timed(lambda: _force(app_chain((cache.k, cache.v, kn), pos_w)))
                 for _ in range(3)) - _tunnel_rtt()) / 256
    gb_app = 4 * b * hkv * 32 * d * cache.k.dtype.itemsize / 1e9  # RMW window traffic
    row("append_rows_kv (1 layer)", t_app, gb_app)
    row("  -> x L", t_app * L, gb_app * L)
    print()

    # ---- dense head + embed ----------------------------------------------
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    xl = jnp.ones((b, h), dtype)

    def lm(s, xl, head):
        out = jnp.dot(xl + s, head, preferred_element_type=jnp.float32)
        return out[0, 0].astype(dtype) * 0

    t_lm, _ = time_scanned(lm, xl[0, 0] * 0, xl, head, iters=64, repeats=3)
    row("lm_head dense bf16", t_lm, head.size * head.dtype.itemsize / 1e9)

    def emb(s, tok, e):
        out = e[tok] + s
        return out[0, 0] * 0

    t_emb, _ = time_scanned(emb, jnp.zeros((), dtype), tok, params["embed"], iters=256, repeats=3)
    row("embed gather", t_emb, b * h * 2 / 1e9)
    print()

    # ---- norms + rope + residuals (per layer, elementwise floor) ---------
    def ew(s, x0, cos, sin):
        hh = llama.rms_norm(x0 + s, jnp.ones((h,), dtype), cfg.rms_norm_eps)
        qq = hh[:, : hq * d].reshape(b, hq, d)
        qq = jax.lax.stop_gradient(qq)
        from starflashattention_tpu.core.rope import apply_rope
        qq = apply_rope(qq, cache.lengths, cos, sin, style=cfg.rope_style)
        return qq[0, 0, 0].astype(dtype) * 0

    t_ew, _ = time_scanned(ew, x0[0, 0] * 0, x0, cos, sin, iters=512, repeats=3)
    row("rmsnorm+rope (1 layer approx)", t_ew, 0.0)
    print()

    sum_parts = (t_qmm_layer + t_att + t_app) * L + t_lm + t_emb
    print(f"sum of parts: {sum_parts*1e3:.3f} ms   full step: {t_full*1e3:.3f} ms   "
          f"unaccounted: {(t_full - sum_parts)*1e3:.3f} ms")
    print(f"tokens/s at full step: {b / t_full:.0f}")


if __name__ == "__main__":
    main()
