"""Speculative decoding on the real chip: verify-step cost + end-to-end gain.

Three measurements at the headline 7B-GQA INT8-weight shapes (bench.py):

1. ``verify_step_cost`` — wall time of one T-token verify step vs one plain
   decode step (scan-chain protocol). The speculative speedup model is
   ``(1 + accepted) / cost_ratio``; decode is HBM-bound so the ratio should
   be close to 1 even at T=4..8.
2. ``spec_decode_equivalence`` — spec_decode_multi's emitted token stream
   vs decode_multi's argmax stream on the same model (must be identical).
3. ``spec_serving`` — Engine(spec_decode=k) vs plain Engine on a workload
   with natural repetition (structured prompts), wall tokens/s.

Usage: python benchmarks/spec_bench.py [--steps N]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.cache import contiguous
from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.utils.profiling import _force, _tunnel_rtt


def build_model(cfg, quant=True):
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if quant:
        params = llama.quantize_model_weights(params, "int8", consume=True)
    return params


def time_chain(fn, carry_fn, iters, repeats=4):
    _force(fn(carry_fn()))
    times = []
    for _ in range(repeats):
        c = carry_fn()
        jax.block_until_ready(c)
        t0 = time.time()
        _force(fn(c))
        times.append(time.time() - t0)
    return (min(times) - _tunnel_rtt()) / iters


def bench_step_cost(cfg, params, batch, ctx, iters, num_draft):
    cos, sin = llama.rope_tables(cfg)
    lens = jnp.full((batch,), ctx, jnp.int32)
    active = jnp.ones((batch,), bool)

    def fresh(with_history=False):
        c = contiguous.init_cache(
            cfg.num_layers, batch, cfg.num_kv_heads, cfg.max_seq_len,
            cfg.head_dim, dtype=jnp.bfloat16,
        )
        c = contiguous.advance(c, lens)
        out = [c, jnp.zeros((batch,), jnp.int32)]
        if with_history:
            out.append(jnp.zeros((batch, cfg.max_seq_len), jnp.int32))
        return tuple(out)

    # params/tables ride as jit ARGUMENTS: a closure would capture the 6.2 GB
    # int8 weight set as lowering constants (multi-GB constant folding makes
    # the compile pathologically slow — observed >30 min at 7B).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def plain(carry, params, cos, sin):
        def body(c, _):
            cache, tok = c
            logits, cache = llama._decode_core(params, cache, tok, cos, sin, cfg)
            return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), None
        return jax.lax.scan(body, carry, None, length=iters)[0]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def spec(carry, params, cos, sin):
        def body(c, _):
            cache, tok, hist = c
            cache, hist, tok, _out, _n = llama._spec_step(
                params, cache, hist, tok, cos, sin, active, cfg,
                num_draft, 2,
            )
            return (cache, tok, hist), None
        return jax.lax.scan(body, carry, None, length=iters)[0]

    t_plain = time_chain(lambda c: plain(c, params, cos, sin), fresh, iters)
    t_spec = time_chain(
        lambda c: spec(c, params, cos, sin), lambda: fresh(True), iters)
    return t_plain, t_spec


def bench_draft_model_cost(cfg, params, batch, ctx, iters, num_draft):
    """Round cost of DRAFT-MODEL speculation vs one plain decode step.

    Acceptance of a random-init draft against a random-init target is
    meaningless (both are noise), so this measures the COST side of the
    speedup model — speedup = (1 + accepted) / cost_ratio — with a ~160M
    draft at 7B-target shapes; tests/test_spec_decode.py proves the emitted
    stream is bit-identical to plain decoding for ANY draft quality."""
    dcfg = ModelConfig(
        vocab_size=cfg.vocab_size, hidden_size=1024, intermediate_size=2816,
        num_layers=4, num_q_heads=8, num_kv_heads=8, head_dim=128,
        max_seq_len=cfg.max_seq_len, num_splits=1,
    )
    dparams = build_model(dcfg, quant=jax.default_backend() == "tpu")
    cos, sin = llama.rope_tables(cfg)
    dcos, dsin = llama.rope_tables(dcfg)
    lens = jnp.full((batch,), ctx, jnp.int32)
    active = jnp.ones((batch,), bool)

    def fresh():
        c = contiguous.init_cache(
            cfg.num_layers, batch, cfg.num_kv_heads, cfg.max_seq_len,
            cfg.head_dim, dtype=jnp.bfloat16,
        )
        dc = contiguous.init_cache(
            dcfg.num_layers, batch, dcfg.num_kv_heads, dcfg.max_seq_len,
            dcfg.head_dim, dtype=jnp.bfloat16,
        )
        return (
            contiguous.advance(c, lens),
            contiguous.advance(dc, lens),
            jnp.zeros((batch,), jnp.int32),
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def spec(carry, params, dparams):
        def body(c, _):
            cache, dcache, tok = c
            cache, dcache, tok, _out, _n = llama._spec_step_draft_model(
                params, cache, dparams, dcache, tok, cos, sin, dcos, dsin,
                active, cfg, dcfg, num_draft,
            )
            return (cache, dcache, tok), None
        return jax.lax.scan(body, carry, None, length=iters)[0]

    return time_chain(lambda c: spec(c, params, dparams), fresh, iters)


def bench_serving(cfg, params, num_draft, steps_per_round):
    from starflashattention_tpu.serving.engine import Engine

    rng = np.random.default_rng(0)
    # structured workload: shared boilerplate + repeated field pattern, the
    # regime prompt-lookup exists for (code/JSON/templated text)
    big = cfg.max_seq_len >= 512
    m, nb, max_new, slots = (24, 8, 96, 16) if big else (6, 2, 12, 4)
    vocab_hi = min(2000, cfg.vocab_size - 1)
    motif = list(rng.integers(100, vocab_hi, size=m))
    prompts = []
    for i in range(slots):
        body = list(rng.integers(100, vocab_hi, size=nb))
        prompts.append(motif + body + motif + body[: nb // 2] + motif)

    results = {}
    for name, k in (("plain", None), ("spec", num_draft)):
        eng = Engine(
            params, cfg, num_slots=slots, steps_per_round=steps_per_round,
            spec_decode=k,
        )
        warm = [list(p) for p in prompts[:slots]]
        eng.generate(warm, max_new_tokens=8)  # compile both programs
        eng.reset_stats()
        t0 = time.time()
        outs = eng.generate([list(p) for p in prompts], max_new_tokens=max_new)
        wall = time.time() - t0
        total = sum(len(o) for o in outs)
        results[name] = {
            "outs": outs,
            "wall_s": wall,
            "tokens": total,
            "tok_per_s": total / wall,
            "stats": eng.stats.summary(),
        }
    # Exact stream equality holds in fp32 (tests/test_spec_decode.py) but NOT
    # for a random-init bf16 model on chip: the verify kernel reduces in a
    # different order than single-token decode, and random logits are dense
    # with near-ties — one flipped argmax cascades the rest of that stream.
    # Report the per-slot agreement instead; the kernel-level oracle
    # (check_verify_consistency) guards real numerics bugs.
    n = len(results["plain"]["outs"])
    match = sum(
        a == b for a, b in zip(results["plain"]["outs"], results["spec"]["outs"])
    )
    results["stream_match_frac"] = match / n
    return results


def bench_trained_chain(num_draft=7, ngram=5, n_steps=24, slots=8, sp=160):
    """Robust spec-vs-plain measurement on the TRAINED byte checkpoint.

    Wall-clock engine A/B pairs through the shared tunnel are hostage to
    multi-second contention phases (measured: identical rounds at 25 ms vs
    1.0 s minutes apart), so this measures the two factors separately with
    the min-of-N scan protocol that every other bench uses:

    - ACCEPTANCE: one n_steps spec chain (ONE program) reports per-step
      emitted-token counts — deterministic, noise-free.
    - COST RATIO: the same chain timed vs an n_steps plain decode_multi
      chain, min over repeats (greedy is deterministic, so every repeat
      re-runs the same trajectory).

    implied_speedup = tokens_per_step / cost_ratio. The emitted stream is
    also asserted equal to the plain chain's argmax stream (on-chip bf16 —
    a stronger oracle than wall agreement).
    """
    import functools

    from starflashattention_tpu.cache import contiguous
    from starflashattention_tpu.models import checkpoint
    from train_tiny import load_corpus

    art = Path(__file__).parent / "artifacts"
    ckpt = art / "tiny_trained_big"
    if not ckpt.exists():
        ckpt = art / "tiny_trained"
    cfg, params = checkpoint.load_checkpoint(str(ckpt))
    corpus = load_corpus(Path(__file__).resolve().parents[1])
    train = corpus[: -len(corpus) // 20]
    rng = np.random.default_rng(2)
    idx = rng.integers(0, len(train) - sp - 1, size=(slots,))
    prompts = jnp.asarray(
        np.stack([train[i:i + sp] for i in idx]).astype(np.int32))
    plens = jnp.full((slots,), sp, jnp.int32)
    cos, sin = llama.rope_tables(cfg)
    active = jnp.ones((slots,), bool)

    def prep():
        cache = contiguous.init_cache(
            cfg.num_layers, slots, cfg.num_kv_heads, cfg.max_seq_len,
            cfg.head_dim, dtype=jnp.bfloat16)
        logits, cache = llama.prefill(params, cache, prompts, plens, cos, sin, cfg)
        pend = jnp.argmax(logits, -1).astype(jnp.int32)
        hist = jnp.zeros((slots, cfg.max_seq_len), jnp.int32)
        hist = jax.lax.dynamic_update_slice(hist, prompts, (0, 0))
        return cache, hist, pend

    def run_spec(cache, hist, pend):
        return llama.spec_decode_multi(
            params, cache, hist, pend, cos, sin, active, cfg, n_steps,
            num_draft=num_draft, ngram=ngram)

    def run_plain(cache, _hist, pend):
        return llama.decode_multi(
            params, cache, pend, cos, sin, active, cfg, n_steps)

    # compile + correctness pass: spec stream must equal plain argmax stream
    cache, hist, pend = prep()
    toks_s, counts, *_ = run_spec(cache, hist, pend)
    cache, hist, pend = prep()
    toks_p, *_ = run_plain(cache, hist, pend)
    counts_h = np.asarray(counts)       # (B, n)
    toks_s_h = np.asarray(toks_s)       # (B, n, k+1)
    toks_p_h = np.asarray(toks_p)       # (B, n)
    mismatches = 0
    for b_i in range(slots):
        stream = [int(t) for s_i in range(n_steps)
                  for t in toks_s_h[b_i, s_i, : counts_h[b_i, s_i]]]
        want = list(toks_p_h[b_i])  # plain emits exactly n_steps tokens
        m = min(len(stream), len(want))
        mismatches += sum(a != b for a, b in zip(stream[:m], want[:m]))
    tokens_per_step = float(counts_h.sum()) / (slots * n_steps)
    # the exactness ORACLE, not a report: any spec-vs-plain argmax
    # divergence invalidates the speedup claim (greedy spec is bit-identical
    # by construction)
    assert mismatches == 0, (
        f"spec stream diverged from the plain argmax chain: "
        f"{mismatches} token mismatches"
    )

    def time_variant(fn):
        best = float("inf")
        for _ in range(6):
            args = prep()
            jax.block_until_ready(args[0].lengths)
            t0 = time.time()
            out = fn(*args)
            jax.block_until_ready(out[0])
            best = min(best, time.time() - t0 - _tunnel_rtt())
        return best / n_steps

    t_plain = time_variant(run_plain)
    t_spec = time_variant(run_spec)
    cost_ratio = t_spec / t_plain
    return {
        "ckpt": ckpt.name,
        "tokens_per_step": round(tokens_per_step, 3),
        "accept_per_step": round(tokens_per_step - 1.0, 3),
        "plain_step_ms": round(t_plain * 1e3, 3),
        "spec_step_ms": round(t_spec * 1e3, 3),
        "cost_ratio": round(cost_ratio, 3),
        "implied_speedup": round(tokens_per_step / cost_ratio, 3),
        "stream_mismatches": int(mismatches),
    }


def bench_serving_trained(num_draft=4, ngram=5, steps_per_round=4,
                          max_new=160, slots=8):
    """Spec serving on the TRAINED byte-level checkpoint with in-domain
    prompts — the realistic-acceptance measurement the random-init 7B twin
    cannot provide (its greedy continuations are noise, so prompt-lookup
    accepts ~0.3 drafts/step regardless of machinery).

    The `big` checkpoint (train_tiny.py --preset big) is trained to ~0.08
    nats/byte on the repo's own source: its greedy stream on in-domain
    prompts is near-deterministic templated code — the regime prompt-lookup
    decoding exists for (strong model + repetitive text), reproduced
    offline. Acceptance is still exact-argmax verification; tokens are real
    engine outputs."""
    from train_tiny import load_corpus

    from starflashattention_tpu.models import checkpoint
    from starflashattention_tpu.serving.engine import Engine

    art = Path(__file__).parent / "artifacts"
    ckpt = art / "tiny_trained_big"
    if not ckpt.exists():
        ckpt = art / "tiny_trained"
    cfg, params = checkpoint.load_checkpoint(str(ckpt))

    corpus = load_corpus(Path(__file__).resolve().parents[1])
    train = corpus[: -len(corpus) // 20]
    rng = np.random.default_rng(2)
    sp = 160
    idx = rng.integers(0, len(train) - sp - 1, size=(slots,))
    prompts = [[int(t) for t in train[i:i + sp]] for i in idx]

    engines = {
        name: Engine(
            params, cfg, num_slots=slots, steps_per_round=steps_per_round,
            spec_decode=k, spec_ngram=ngram,
        )
        for name, k in (("plain", None), ("spec", num_draft))
    }
    for eng in engines.values():  # compile both programs
        eng.generate([list(p) for p in prompts], max_new_tokens=8)

    # The shared chip passes through multi-second contention phases (measured
    # r5: identical tiny-model rounds at 25 ms vs 1.0 s minutes apart), so a
    # single plain-vs-spec pair is meaningless — interleave 3 repeats and
    # keep each engine's BEST run (same min-of-N protocol as time_scanned).
    results = {"plain": None, "spec": None}
    for _ in range(3):
        for name, eng in engines.items():
            eng.reset_stats()
            t0 = time.time()
            outs = eng.generate(
                [list(p) for p in prompts], max_new_tokens=max_new)
            wall = time.time() - t0
            total = sum(len(o) for o in outs)
            r = {
                "outs": outs, "wall_s": wall, "tokens": total,
                "tok_per_s": total / wall, "stats": eng.stats.summary(),
            }
            if results[name] is None or r["tok_per_s"] > results[name]["tok_per_s"]:
                results[name] = r
    match = sum(
        a == b for a, b in zip(results["plain"]["outs"], results["spec"]["outs"])
    )
    results["stream_match_frac"] = match / len(prompts)
    results["ckpt"] = ckpt.name
    return results


def check_verify_consistency(batch=16, hq=32, hkv=8, d=128, s=1024, span=4):
    """Chip-side oracle over EVERY staircase row: flash_verify row j must
    equal a plain flash_decode call at ``lengths + j`` (row j attends
    exactly the positions a single-token step at that length sees) — on
    RAGGED lengths, to bf16 tolerance. Catches verify-kernel numerics bugs
    that CPU interpret tests (fp32) cannot, while tolerating argmax tie
    flips downstream."""
    from starflashattention_tpu.ops.flash_decode import flash_decode, flash_verify

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, (batch, hq, span, d), jnp.bfloat16)
    k = jax.random.normal(kk, (batch, hkv, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (batch, hkv, s, d), jnp.bfloat16)
    rng = np.random.default_rng(3)
    lengths = jnp.asarray(
        rng.integers(span + 1, s - span, size=(batch,)), jnp.int32)
    o_ver = jax.jit(lambda *a: flash_verify(*a, block_k=128))(q, k, v, lengths)
    err = 0.0
    dec = jax.jit(lambda *a: flash_decode(*a, num_splits=1, block_k=128))
    for j in range(span):
        o_dec = dec(q[:, :, j], k, v, lengths + j)
        err = max(err, float(jnp.max(jnp.abs(
            o_ver[:, :, j].astype(jnp.float32) - o_dec.astype(jnp.float32)))))
    assert err < 0.05, f"verify staircase vs per-row decode max|err| {err}"
    return err


ARTIFACT = Path(__file__).parent / "artifacts" / "results_round5.jsonl"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--draft", type=int, default=4)
    ap.add_argument(
        "--trained", action="store_true",
        help="run ONLY the trained-checkpoint serving comparison "
             "(realistic-acceptance regime)",
    )
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    if args.trained:
        ch = bench_trained_chain(num_draft=args.draft)
        line_t = {
            "bench": f"spec_trained_chain_k{args.draft}",
            **ch,
            "note": "trained byte model, in-domain prompts; tokens/step from "
                    "one deterministic spec chain, step costs min-of-6 scans "
                    "(wall A/B is phase-noise-bound on the shared tunnel); "
                    "stream asserted vs the plain argmax chain on-chip",
        }
        print(json.dumps(line_t))
        if on_tpu:
            with open(ARTIFACT, "a") as f:
                f.write(json.dumps(line_t) + "\n")
        return
    if on_tpu:
        cfg = ModelConfig.llama_7b_gqa(
            max_seq_len=1024, num_splits=1, block_k=64, batch_block=16
        )
        batch, ctx = 16, 512
    else:
        cfg = ModelConfig.tiny(dtype="float32", num_splits=1)
        batch, ctx = 4, 32
    params = build_model(cfg, quant=on_tpu)

    t_plain, t_spec = bench_step_cost(
        cfg, params, batch, ctx, args.iters, args.draft
    )
    line = {
        "bench": f"spec_verify_step_cost_k{args.draft}",
        "decode_step_ms": round(t_plain * 1e3, 4),
        "verify_step_ms": round(t_spec * 1e3, 4),
        "cost_ratio": round(t_spec / t_plain, 3),
        "breakeven_accept": round(t_spec / t_plain - 1.0, 3),
        "note": f"b{batch} ctx{ctx} int8w; verify = draft+verify+accept, T={args.draft + 1}",
    }
    print(json.dumps(line))

    t_draft = bench_draft_model_cost(
        cfg, params, batch, ctx, max(args.iters // 2, 8), args.draft
    )
    line_d = {
        "bench": f"spec_draft_model_round_cost_k{args.draft}",
        "decode_step_ms": round(t_plain * 1e3, 4),
        "draft_round_ms": round(t_draft * 1e3, 4),
        "cost_ratio": round(t_draft / t_plain, 3),
        "breakeven_accept": round(t_draft / t_plain - 1.0, 3),
        "note": (
            f"b{batch} ctx{ctx}; round = {args.draft + 1} draft(160M int8) "
            f"steps + 1 verify + accept; speedup = (1+accept)/cost_ratio"
        ),
    }
    print(json.dumps(line_d))

    verify_err = check_verify_consistency() if on_tpu else None

    serving = bench_serving(cfg, params, args.draft, steps_per_round=4)
    line2 = {
        "bench": f"spec_serving_7b_int8w_k{args.draft}",
        "plain_tok_per_s": round(serving["plain"]["tok_per_s"], 1),
        "spec_tok_per_s": round(serving["spec"]["tok_per_s"], 1),
        "speedup": round(
            serving["spec"]["tok_per_s"] / serving["plain"]["tok_per_s"], 3
        ),
        "accept_per_step": serving["spec"]["stats"]["spec_accept_per_step"],
        "stream_match_frac": round(serving["stream_match_frac"], 3),
        "verify_staircase_max_err": (
            None if verify_err is None else round(verify_err, 4)),
        "note": (
            "structured (templated) prompts, wall incl tunnel RTT; stream "
            "divergence = bf16 argmax ties on a random-init model (fp32 "
            "equivalence proven in tests/test_spec_decode.py); realistic-"
            "acceptance regime measured by spec_serving_trained"
        ),
    }
    print(json.dumps(line2))
    if on_tpu:
        with open(ARTIFACT, "a") as f:
            f.write(json.dumps(line) + "\n")
            f.write(json.dumps(line_d) + "\n")
            f.write(json.dumps(line2) + "\n")


if __name__ == "__main__":
    main()
