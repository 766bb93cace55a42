"""Prefill-kernel variant experiments (real TPU).

The shipped kernel (ops/flash_prefill.py) measures ~0.50 of the bf16 MXU
peak at seq 8192. Per-element accounting says softmax VPU time roughly
equals matmul MXU time at D=128 (each score element costs 512 MXU FLOPs vs
~10 VPU ops), so a kernel that serializes [QK -> softmax -> PV] per tile is
capped near 50%. Variants measured here:

  v0  shipped kernel (baseline)
  v1  pre-scaled q (sm_scale*log2e folded in) + base-2 softmax (exp2)
  v2  v1 + the group dim split into two independent (m,l,acc) chains,
      ops interleaved [QKa, QKb, sm_a, PVa, sm_b, PVb] so Mosaic can run
      chain-b matmuls on the MXU while chain-a softmax runs on the VPU.

Usage: python benchmarks/exp_prefill.py
"""

from __future__ import annotations

import functools
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from starflashattention_tpu.ops.flash_prefill import flash_prefill
from starflashattention_tpu.utils.profiling import time_scanned

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
LOG2E = math.log2(math.e)
MXU_PEAK = 197e12  # v5e bf16


def _kernel_v1(
    lengths_ref, q_off_ref, q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s,
    *, group, block_q, block_k, num_kv_blocks, causal,
):
    """Pre-scaled q, exp2 softmax. m/l live in log2 units throughout."""
    batch = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    length = lengths_ref[batch]
    offset = q_off_ref[batch]
    kv_start = ki * block_k
    q_row0 = offset + qi * block_q
    in_band = kv_start <= q_row0 + block_q - 1 if causal else True
    should_run = jnp.logical_and(in_band, kv_start < length)
    no_mask = kv_start + block_k <= length
    if causal:
        no_mask = jnp.logical_and(no_mask, kv_start + block_k - 1 <= q_row0)

    def _attend(masked: bool):
        q = q_ref[0].reshape(group * block_q, q_ref.shape[-1])
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # already in log2 domain (q pre-scaled by sm_scale*log2e)
        if masked:
            col = kv_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            mask = col < length
            if causal:
                row = q_row0 + jax.lax.rem(
                    jax.lax.broadcasted_iota(jnp.int32, s.shape, 0), block_q
                )
                mask = jnp.logical_and(mask, col <= row)
            s = jnp.where(mask, s, NEG_INF)
        m_prev = m_s[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_s[...] = alpha * l_s[...] + jnp.sum(p, axis=1, keepdims=True)
        m_s[...] = m_next
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_s[...] = acc_s[...] * alpha[:, :1] + pv

    @pl.when(jnp.logical_and(should_run, no_mask))
    def _fast():
        _attend(False)

    @pl.when(jnp.logical_and(should_run, jnp.logical_not(no_mask)))
    def _masked():
        _attend(True)

    @pl.when(ki == num_kv_blocks - 1)
    def _emit():
        l = l_s[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_s[...] / l_safe).astype(o_ref.dtype).reshape(
            group, block_q, o_ref.shape[-1]
        )


def _kernel_v2(
    lengths_ref, q_off_ref, q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s,
    *, group, block_q, block_k, num_kv_blocks, causal,
):
    """v1 + two independent softmax chains (group halves) interleaved."""
    batch = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    length = lengths_ref[batch]
    offset = q_off_ref[batch]
    kv_start = ki * block_k
    q_row0 = offset + qi * block_q
    in_band = kv_start <= q_row0 + block_q - 1 if causal else True
    should_run = jnp.logical_and(in_band, kv_start < length)
    no_mask = kv_start + block_k <= length
    if causal:
        no_mask = jnp.logical_and(no_mask, kv_start + block_k - 1 <= q_row0)

    half = group // 2
    rows = half * block_q

    def _attend(masked: bool):
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        d = q_ref.shape[-1]
        qa = q_ref[0, :half].reshape(rows, d)
        qb = q_ref[0, half:].reshape(rows, d)

        def qk(q):
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if masked:
                col = kv_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                mask = col < length
                if causal:
                    row = q_row0 + jax.lax.rem(
                        jax.lax.broadcasted_iota(jnp.int32, s.shape, 0), block_q
                    )
                    mask = jnp.logical_and(mask, col <= row)
                s = jnp.where(mask, s, NEG_INF)
            return s

        def softmax(s, sl):
            m_prev = m_s[sl]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            l_s[sl] = alpha * l_s[sl] + jnp.sum(p, axis=1, keepdims=True)
            m_s[sl] = m_next
            return p, alpha

        def pv(p, alpha, sl):
            out = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_s[sl] = acc_s[sl] * alpha[:, :1] + out

        sla = pl.dslice(0, rows)
        slb = pl.dslice(rows, rows)
        # interleave: MXU(QKb) can overlap VPU softmax(a), MXU(PVa) can
        # overlap VPU softmax(b)
        sa = qk(qa)
        sb = qk(qb)
        pa, aa = softmax(sa, sla)
        pv(pa, aa, sla)
        pb, ab = softmax(sb, slb)
        pv(pb, ab, slb)

    @pl.when(jnp.logical_and(should_run, no_mask))
    def _fast():
        _attend(False)

    @pl.when(jnp.logical_and(should_run, jnp.logical_not(no_mask)))
    def _masked():
        _attend(True)

    @pl.when(ki == num_kv_blocks - 1)
    def _emit():
        l = l_s[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_s[...] / l_safe).astype(o_ref.dtype).reshape(
            group, block_q, o_ref.shape[-1]
        )




def _mk_kernel_sep(nchains: int):
    def kernel(lengths_ref, q_off_ref, q_ref, k_ref, v_ref, o_ref, *scratch,
               group, block_q, block_k, num_kv_blocks, causal):
        m_ss = scratch[0::3][:nchains]
        l_ss = scratch[1::3][:nchains]
        acc_ss = scratch[2::3][:nchains]
        # scratch tuple is interleaved (m0,l0,acc0,m1,l1,acc1,...)
        m_ss = scratch[0:3*nchains:3]
        l_ss = scratch[1:3*nchains:3]
        acc_ss = scratch[2:3*nchains:3]
        batch = pl.program_id(0)
        qi = pl.program_id(2)
        ki = pl.program_id(3)

        @pl.when(ki == 0)
        def _init():
            for c in range(nchains):
                m_ss[c][...] = jnp.full_like(m_ss[c], NEG_INF)
                l_ss[c][...] = jnp.zeros_like(l_ss[c])
                acc_ss[c][...] = jnp.zeros_like(acc_ss[c])

        length = lengths_ref[batch]
        offset = q_off_ref[batch]
        kv_start = ki * block_k
        q_row0 = offset + qi * block_q
        in_band = kv_start <= q_row0 + block_q - 1 if causal else True
        should_run = jnp.logical_and(in_band, kv_start < length)
        no_mask = kv_start + block_k <= length
        if causal:
            no_mask = jnp.logical_and(no_mask, kv_start + block_k - 1 <= q_row0)

        sub = group // nchains

        def _attend(masked: bool):
            k = k_ref[0, 0]
            v = v_ref[0, 0]
            d = q_ref.shape[-1]

            def qk(c):
                q = q_ref[0, c * sub:(c + 1) * sub].reshape(sub * block_q, d)
                s = jax.lax.dot_general(
                    q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if masked:
                    col = kv_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    mask = col < length
                    if causal:
                        row = q_row0 + jax.lax.rem(
                            jax.lax.broadcasted_iota(jnp.int32, s.shape, 0), block_q)
                        mask = jnp.logical_and(mask, col <= row)
                    s = jnp.where(mask, s, NEG_INF)
                return s

            def softmax(s, c):
                m_prev = m_ss[c][...]
                m_curr = jnp.max(s, axis=1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp2(m_prev - m_next)
                p = jnp.exp2(s - m_next[:, :1])
                l_ss[c][...] = alpha * l_ss[c][...] + jnp.sum(p, axis=1, keepdims=True)
                m_ss[c][...] = m_next
                return p, alpha

            def pv(p, alpha, c):
                out = jax.lax.dot_general(
                    p.astype(v.dtype), v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_ss[c][...] = acc_ss[c][...] * alpha[:, :1] + out

            # software pipeline: QK(c+1) issued before softmax(c) so the MXU
            # stays busy while the VPU runs the previous chain's softmax
            s_next = qk(0)
            for c in range(nchains):
                s_cur = s_next
                if c + 1 < nchains:
                    s_next = qk(c + 1)
                p, a = softmax(s_cur, c)
                pv(p, a, c)

        @pl.when(jnp.logical_and(should_run, no_mask))
        def _fast():
            _attend(False)

        @pl.when(jnp.logical_and(should_run, jnp.logical_not(no_mask)))
        def _masked():
            _attend(True)

        @pl.when(ki == num_kv_blocks - 1)
        def _emit():
            for c in range(nchains):
                l = l_ss[c][:, :1]
                l_safe = jnp.where(l == 0.0, 1.0, l)
                o_ref[0, c * sub:(c + 1) * sub] = (
                    acc_ss[c][...] / l_safe
                ).astype(o_ref.dtype).reshape(sub, block_q, o_ref.shape[-1])

    return kernel


def _kernel_v3(*a, **kw):
    return _mk_kernel_sep(2)(*a, **kw)


def _kernel_v4(*a, **kw):
    return _mk_kernel_sep(4)(*a, **kw)


def _run_variant(kernel_fn, q, k, v, lengths, *, block_q, block_k, prescale):
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    g = hq // hkv
    sm_scale = 1.0 / (d**0.5)
    if prescale:
        q = (q.astype(jnp.float32) * (sm_scale * LOG2E)).astype(q.dtype)
    q_offsets = jnp.zeros((b,), jnp.int32)
    num_q_blocks = sq // block_q
    num_kv_blocks = skv // block_k
    grid = (b, hkv, num_q_blocks, num_kv_blocks)
    kernel = functools.partial(
        kernel_fn, group=g, block_q=block_q, block_k=block_k,
        num_kv_blocks=num_kv_blocks, causal=True,
    )
    nch = {_kernel_v3: 2, _kernel_v4: 4}.get(kernel_fn, 0)
    if nch:
        sub = g // nch
        scratch = []
        for _ in range(nch):
            scratch += [
                pltpu.VMEM((sub * block_q, LANES), jnp.float32),
                pltpu.VMEM((sub * block_q, LANES), jnp.float32),
                pltpu.VMEM((sub * block_q, d), jnp.float32),
            ]
    else:
        scratch = [
            pltpu.VMEM((g * block_q, LANES), jnp.float32),
            pltpu.VMEM((g * block_q, LANES), jnp.float32),
            pltpu.VMEM((g * block_q, d), jnp.float32),
        ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, g, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, block_q, d),
                               lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(lengths, q_offsets, q, k, v)


def main() -> None:
    b, hq, hkv, d = 1, 32, 8, 128
    key = jax.random.PRNGKey(0)
    for seq in (2048, 4096, 8192):
        kq, kk, kv, key = jax.random.split(key, 4)
        q = jax.random.normal(kq, (b, hq, seq, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, hkv, seq, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, hkv, seq, d), jnp.bfloat16)
        lengths = jnp.full((b,), seq, jnp.int32)
        flops = 4 * seq * seq * d * hq * 0.5  # causal

        ref = flash_prefill(q, k, v, lengths, causal=True)

        def run_v0(q, k, v, lengths):
            o = flash_prefill(q, k, v, lengths, causal=True)
            return q + o * jnp.bfloat16(1e-3)

        variants = {"v0_shipped": run_v0}
        RAW = {}

        for name, kern, bq, bk in (
            ("v2_interleave", _kernel_v2, 512, 1024),
            ("v3_sep2", _kernel_v3, 512, 1024),
            ("v4_sep4", _kernel_v4, 512, 1024),
            ("v4_sep4_bk512", _kernel_v4, 512, 512),
            ("v4_sep4_bq256", _kernel_v4, 256, 1024),
        ):
            def raw(q, k, v, lengths, kern=kern, bq=bq, bk=bk):
                return _run_variant(kern, q, k, v, lengths,
                                    block_q=bq, block_k=bk, prescale=True)
            def run(q, k, v, lengths, raw=raw):
                o = raw(q, k, v, lengths)
                return q + o * jnp.bfloat16(1e-3)
            variants[name] = run
            RAW[name] = raw

        for name, fn in variants.items():
            # parity first (single call on the raw kernel output)
            if name != "v0_shipped":
                out = RAW[name](q, k, v, lengths)
                err = jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32)
                ))
                ok = float(err) < 0.05
            else:
                ok = True
            per, _ = time_scanned(fn, q, k, v, lengths, iters=32, repeats=3)
            tflops = flops / per / 1e12
            print(f"seq{seq} {name:24s} {per*1e3:8.3f} ms  {tflops:6.1f} TFLOP/s "
                  f"({tflops*1e12/MXU_PEAK:.3f} of peak)  parity={'OK' if ok else 'FAIL'}")
        print()


if __name__ == "__main__":
    main()
