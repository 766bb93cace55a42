"""On-chip kernel smoke suite: every Pallas kernel vs the jnp spec at bf16
tolerance with ``interpret=False`` on the REAL chip.

The 300+-test pytest suite runs the kernels in interpret mode on CPU
(SURVEY.md §4 test plan) — bf16/Mosaic-specific lowering is otherwise only
exercised implicitly through benchmark assertions. This is the explicit
gate: ~12 checks covering decode (fused / split / window / sinks / verify /
int8-KV), paged decode, prefill (+LSE), the prefill backward, cache append,
and the quantized matmuls (int8 / int4 / w8a8), each asserted against
core/reference (the fp32 executable spec) and appended to the round
artifact as one ``kernel_smoke_onchip`` line.

Usage: python benchmarks/kernel_smoke.py [--append FILE]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def run_all(quick: bool = False) -> tuple[list[dict], float]:
    from starflashattention_tpu.core import quant, reference
    from starflashattention_tpu.ops.cache_append import append_rows_kv
    from starflashattention_tpu.ops.flash_bwd import flash_prefill_bwd
    from starflashattention_tpu.ops.flash_decode import flash_decode, flash_verify
    from starflashattention_tpu.ops.flash_prefill import flash_prefill
    from starflashattention_tpu.ops.paged_decode import paged_flash_decode
    from starflashattention_tpu.ops.quant_matmul import (
        quant_matmul,
        quant_matmul_int4,
        quant_matmul_w8a8,
    )

    rng = np.random.default_rng(0)
    results: list[dict] = []
    t0 = time.time()

    def check(name: str, got, want, tol: float):
        err = float(jnp.max(jnp.abs(
            jnp.asarray(got, jnp.float32) - jnp.asarray(want, jnp.float32))))
        results.append({"check": name, "max_abs_err": round(err, 5),
                        "tol": tol, "ok": bool(err <= tol)})

    # --- decode family: B=4, Hq=16, Hkv=4 (GQA), S=512, D=128, ragged ----
    # quick: halve the sequence dims (fewer KV blocks / q rows per check;
    # same code paths, ~3x faster wall for deadline-bound invocations)
    b, hq, hkv, s, d = 4, 16, 4, (256 if quick else 512), 128
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    lens = jnp.asarray([s - 1, 3 * s // 4, s // 4 + 1, s], jnp.int32)
    ref = reference.decode_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), lens)
    # bf16 tolerance: attention outputs are convex combinations of
    # unit-variance V rows; bf16 rounding (2^-8 relative) + fp32-accum
    # kernel math stays well inside 3e-2 absolute.
    TOL = 3e-2
    check("decode_fused", flash_decode(
        q, k, v, lens, num_splits=1, block_k=128, interpret=False), ref, TOL)
    check("decode_split4", flash_decode(
        q, k, v, lens, num_splits=4, block_k=128, interpret=False), ref, TOL)

    w = s // 2
    ref_w = reference.decode_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        lens, sliding_window=w)
    check("decode_window", flash_decode(
        q, k, v, lens, num_splits=1, block_k=128, window=w, interpret=False),
        ref_w, TOL)
    ref_ws = reference.decode_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        lens, sliding_window=w, attention_sinks=32)
    check("decode_window_sinks", flash_decode(
        q, k, v, lens, num_splits=1, block_k=128, window=w, sinks=32,
        interpret=False), ref_ws, TOL)

    # Gemma-2 features: attention softcapping + DYNAMIC (traced) window —
    # the per-layer-alternating-window kernel path, at bf16 on the chip
    ref_cap = reference.decode_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        lens, softcap=50.0)
    check("decode_softcap", flash_decode(
        q, k, v, lens, num_splits=1, block_k=128, softcap=50.0,
        interpret=False), ref_cap, TOL)
    wdyn = jnp.asarray(w, jnp.int32)
    got_dyn = jax.jit(lambda ww: flash_decode(
        q, k, v, lens, num_splits=1, block_k=128, window=ww, softcap=50.0,
        interpret=False))(wdyn)
    ref_dyn = reference.decode_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        lens, sliding_window=w, softcap=50.0)
    check("decode_dynwin_softcap", got_dyn, ref_dyn, TOL)

    # verify mode (spec decode): T=3 staircase — row j attends < len+j
    T = 3
    qv = jnp.asarray(rng.standard_normal((b, hq, T, d)), jnp.bfloat16)
    lens_v = jnp.asarray(
        [3 * s // 4, s // 2 - 1, s // 4 + 2, s - 3], jnp.int32)
    got_v = flash_verify(qv, k, v, lens_v, block_k=128, interpret=False)
    want_v = jnp.stack([
        reference.decode_reference(
            qv[:, :, j].astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), lens_v + j)
        for j in range(T)
    ], axis=2)
    check("decode_verify_t3", got_v, want_v, TOL)

    # int8-KV fused dequant
    k8q = quant.quantize_int8(k.astype(jnp.float32))
    v8q = quant.quantize_int8(v.astype(jnp.float32))
    ref8 = reference.decode_reference(
        q.astype(jnp.float32), quant.dequantize(k8q), quant.dequantize(v8q), lens)
    check("decode_int8kv", flash_decode(
        q, k8q.values, v8q.values, lens, num_splits=1, block_k=128,
        k_scales=k8q.scales, v_scales=v8q.scales, interpret=False), ref8, TOL)

    # paged decode through a shuffled page table
    ps, ppcb = 64, 2
    pages_per_seq = s // ps
    num_pages = b * pages_per_seq + 1
    perm = rng.permutation(num_pages - 1) + 1
    pt = jnp.asarray(
        perm[: b * pages_per_seq].reshape(b, pages_per_seq).astype(np.int32))
    kp = jnp.zeros((hkv, num_pages, ps, d), jnp.bfloat16)
    vp = jnp.zeros((hkv, num_pages, ps, d), jnp.bfloat16)
    kp = kp.at[:, pt.reshape(-1)].set(
        k.reshape(b, hkv, pages_per_seq, ps, d).transpose(1, 0, 2, 3, 4)
        .reshape(hkv, -1, ps, d))
    vp = vp.at[:, pt.reshape(-1)].set(
        v.reshape(b, hkv, pages_per_seq, ps, d).transpose(1, 0, 2, 3, 4)
        .reshape(hkv, -1, ps, d))
    check("paged_decode", paged_flash_decode(
        q, kp, vp, pt, lens, pages_per_compute_block=ppcb, interpret=False),
        ref, TOL)

    # --- prefill + backward: B=2, Sq=Skv=512 ----------------------------
    sq = 256 if quick else 512
    qp = jnp.asarray(rng.standard_normal((2, hq, sq, d)), jnp.bfloat16)
    kpre = jnp.asarray(rng.standard_normal((2, hkv, sq, d)), jnp.bfloat16)
    vpre = jnp.asarray(rng.standard_normal((2, hkv, sq, d)), jnp.bfloat16)
    plens = jnp.asarray([sq, 3 * sq // 5], jnp.int32)
    ref_p = reference.prefill_reference(
        qp.astype(jnp.float32), kpre.astype(jnp.float32),
        vpre.astype(jnp.float32), lengths=plens, causal=True)
    got_p, lse = flash_prefill(
        qp, kpre, vpre, plens, causal=True, block_q=256, block_k=256,
        interpret=False, return_lse=True)
    # compare only valid rows (padded query rows are unspecified)
    mask = (jnp.arange(sq)[None, :] < plens[:, None])[:, None, :, None]
    check("prefill_causal", jnp.where(mask, got_p, 0),
          jnp.where(mask, ref_p, 0), TOL)

    # backward vs jnp autodiff of the spec (bf16 inputs, fp32 oracle math)
    do = jnp.asarray(rng.standard_normal((2, hq, sq, d)), jnp.bfloat16)

    def loss_ref(qf, kf, vf):
        o = reference.prefill_reference(qf, kf, vf, lengths=plens, causal=True)
        return jnp.sum(jnp.where(mask, o, 0) * do.astype(jnp.float32))

    gq_ref, gk_ref, gv_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        qp.astype(jnp.float32), kpre.astype(jnp.float32), vpre.astype(jnp.float32))
    zoff = jnp.zeros((2,), jnp.int32)
    dq, dk, dv = flash_prefill_bwd(
        qp, kpre, vpre, got_p, lse, jnp.where(mask, do, 0).astype(jnp.bfloat16),
        plens, zoff, causal=True, block_q=256, block_k=256, interpret=False)
    # grads accumulate over up to 512 rows — scale tolerance with the
    # oracle's own magnitude (bf16 rounding is relative)
    gtol = 3e-2 * float(jnp.max(jnp.abs(gk_ref)))
    check("prefill_bwd_dq", jnp.where(mask, dq, 0), jnp.where(mask, gq_ref, 0),
          3e-2 * float(jnp.max(jnp.abs(gq_ref))))
    check("prefill_bwd_dk", dk, gk_ref, gtol)
    check("prefill_bwd_dv", dv, gv_ref, 3e-2 * float(jnp.max(jnp.abs(gv_ref))))

    # --- cache append (windowed RMW) ------------------------------------
    L = 2
    kt = jnp.asarray(rng.standard_normal((L, b, hkv, 128, d)), jnp.bfloat16)
    vt = jnp.asarray(rng.standard_normal((L, b, hkv, 128, d)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.bfloat16)
    pos = jnp.asarray([0, 5, 77, 127], jnp.int32)
    want_kt = kt.at[1, jnp.arange(b), :, pos].set(kn)
    want_vt = vt.at[1, jnp.arange(b), :, pos].set(vn)
    kt2, vt2 = append_rows_kv(kt, vt, kn, vn, 1, pos, interpret=False)
    check("cache_append_k", kt2, want_kt, 0.0)  # pure data movement: exact
    check("cache_append_v", vt2, want_vt, 0.0)

    # --- quantized matmuls ----------------------------------------------
    h, o_dim = 512, 512
    wdense = jnp.asarray(rng.standard_normal((h, o_dim)) / np.sqrt(h), jnp.float32)
    x = jnp.asarray(rng.standard_normal((16, h)), jnp.bfloat16)
    w8 = quant.quantize_weight(wdense, "int8")
    oracle8 = x.astype(jnp.float32) @ quant.dequantize_weight(w8)
    qm_tol = 3e-2 * float(jnp.std(oracle8))
    check("qmm_int8", quant_matmul(x, w8["w"], w8["scale"], interpret=False),
          oracle8, qm_tol)
    w4 = quant.quantize_weight_int4(wdense)
    oracle4 = x.astype(jnp.float32) @ quant.dequantize_weight_int4(w4)
    check("qmm_int4", quant_matmul_int4(x, w4["w"], w4["scale"], interpret=False),
          oracle4, 3e-2 * float(jnp.std(oracle4)))
    # W8A8: dynamic per-row activation quant on top — oracle quantizes rows
    from starflashattention_tpu.ops.quant_matmul import quantize_rows

    xq, xs = quantize_rows(x)  # xs is (B, 1) already
    oracle88 = (
        (xq.astype(jnp.float32) * xs) @ quant.dequantize_weight(w8))
    check("qmm_w8a8", quant_matmul_w8a8(x, w8["w"], w8["scale"], interpret=False),
          oracle88, 3e-2 * float(jnp.std(oracle88)))

    for r in results:
        print(r, flush=True)
    return results, time.time() - t0


def main() -> None:
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--append", default=None)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    backend = jax.default_backend()
    results, secs = run_all(args.quick)
    n_pass = sum(r["ok"] for r in results)
    line = json.dumps({
        "bench": "kernel_smoke_onchip",
        "ms": round(secs * 1e3, 1),
        "passed": n_pass,
        "total": len(results),
        "backend": backend,
        "failed": [r["check"] for r in results if not r["ok"]],
    })
    print(line, flush=True)
    if args.append:
        with open(args.append, "a") as f:
            f.write(line + "\n")
    assert n_pass == len(results), f"kernel smoke failures: {line}"


if __name__ == "__main__":
    main()
