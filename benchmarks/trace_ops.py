"""Capture an xplane trace of the 7B decode step and print the op-level
time breakdown (what the ncu reports are to the reference, SURVEY §2.13).

Usage: python benchmarks/trace_ops.py [--out benchmarks/artifacts/trace_step]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def capture(out_dir: str) -> None:
    from starflashattention_tpu.cache import contiguous
    from starflashattention_tpu.models import llama
    from starflashattention_tpu.runtime.params import ModelConfig

    cfg = ModelConfig.llama_7b_gqa(
        max_seq_len=1024, num_splits=1, block_k=64, batch_block=8
    )
    batch, ctx, dtype = 16, 1024, jnp.bfloat16
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    params = llama.quantize_model_weights(params, "int8", consume=True)
    cache = contiguous.init_cache(
        cfg.num_layers, batch, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim, dtype=dtype
    )
    lens = np.full((batch,), ctx // 2, np.int64)
    lens[: batch // 2] = ctx // 4
    cache = contiguous.advance(cache, jnp.asarray(lens, jnp.int32))
    cos, sin = llama.rope_tables(cfg)
    tok = jnp.zeros((batch,), jnp.int32)

    @jax.jit
    def chain(cache, tok, params, cos, sin):
        def body(c, _):
            cache, tok = c
            logits, cache = llama._decode_core(params, cache, tok, cos, sin, cfg)
            return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), None
        c, _ = jax.lax.scan(body, (cache, tok), None, length=16)
        return c

    out = chain(cache, tok, params, cos, sin)  # compile + warm
    jax.block_until_ready(out)
    np.asarray(out[1][:1])
    with jax.profiler.trace(out_dir):
        out = chain(cache, tok, params, cos, sin)
        np.asarray(out[1][:1])


def capture_prefill(out_dir: str, seq: int = 2048, scheme: str = "bf16") -> None:
    """Trace one 7B prefill (the TTFT path) instead of the decode chain."""
    from starflashattention_tpu.cache import contiguous
    from starflashattention_tpu.models import llama
    from starflashattention_tpu.runtime.params import ModelConfig

    cfg = ModelConfig.llama_7b_gqa(max_seq_len=seq)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if scheme == "int8w":
        params = llama.quantize_model_weights(params, "int8", consume=True)
    cos, sin = llama.rope_tables(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, seq), 0, cfg.vocab_size, jnp.int32)
    plens = jnp.full((1,), seq, jnp.int32)

    def run():
        cache = contiguous.init_cache(
            cfg.num_layers, 1, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
            dtype=jnp.bfloat16,
        )
        logits, cache = llama.prefill(params, cache, toks, plens, cos, sin, cfg)
        np.asarray(logits[:1, :1])

    run()  # compile + warm
    with jax.profiler.trace(out_dir):
        run()


def capture_moe(out_dir: str) -> None:
    """Trace a Mixtral-geometry INT8 decode chain (the moe_decode_bench
    workload) — the round-3 MoE claims shipped without a trace."""
    from starflashattention_tpu.cache import contiguous
    from starflashattention_tpu.models import llama
    from starflashattention_tpu.runtime.params import ModelConfig

    cfg = ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_layers=8, num_q_heads=32, num_kv_heads=8, head_dim=128,
        max_seq_len=1024, num_splits=1, block_k=64, batch_block=8,
        num_experts=8, num_experts_per_tok=2,
    )
    batch = 8
    # Dense bf16 init at this geometry (~23 GB) OOMs; generate the expert
    # stacks directly in int8, one dense layer transient at a time.
    params = llama.init_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16, quantize="int8")
    cache = contiguous.init_cache(
        cfg.num_layers, batch, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.bfloat16,
    )
    cache = contiguous.advance(cache, jnp.full((batch,), 512, jnp.int32))
    cos, sin = llama.rope_tables(cfg)
    tok = jnp.zeros((batch,), jnp.int32)

    @jax.jit
    def chain(cache, tok, params, cos, sin):
        def body(c, _):
            cache, tok = c
            logits, cache = llama._decode_core(params, cache, tok, cos, sin, cfg)
            return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), None
        c, _ = jax.lax.scan(body, (cache, tok), None, length=16)
        return c

    out = chain(cache, tok, params, cos, sin)
    np.asarray(out[1][:1])
    with jax.profiler.trace(out_dir):
        out = chain(cache, tok, params, cos, sin)
        np.asarray(out[1][:1])


def capture_verify(out_dir: str, span: int = 4) -> None:
    """Trace the speculative VERIFY kernel (flash_verify staircase path) at
    7B shapes — the spec-decode hot op."""
    from starflashattention_tpu.ops.flash_decode import flash_verify

    b, hq, hkv, d, s = 16, 32, 8, 128, 1024
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, hq, span, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, hkv, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, hkv, s, d), jnp.bfloat16)
    lengths = jnp.full((b,), 512, jnp.int32)

    @jax.jit
    def chain(q, k, v, lengths):
        def body(c, _):
            o = flash_verify(c, k, v, lengths, block_k=128)
            return c + o * jnp.bfloat16(1e-3), None
        c, _ = jax.lax.scan(body, q, None, length=64)
        return c

    out = chain(q, k, v, lengths)
    np.asarray(out[0, 0, 0, :1])
    with jax.profiler.trace(out_dir):
        out = chain(q, k, v, lengths)
        np.asarray(out[0, 0, 0, :1])


def capture_epilogue(out_dir: str) -> None:
    """Trace the fused-epilogue (num_splits=1) vs split+LSE-combine
    (num_splits=4) decode variants back to back at the headline shape —
    the per-call profiler evidence for runtime/autotune's fused-by-default
    choice (the reference ships ncu captures of BOTH its kernels,
    profile_roll_manual.ncu-rep; SURVEY §2.13). Each variant runs as its
    own named TraceAnnotation block in one trace."""
    from starflashattention_tpu.ops.flash_decode import flash_decode

    b, hq, hkv, d, s = 16, 32, 8, 128, 1024
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, hq, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, hkv, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, hkv, s, d), jnp.bfloat16)
    lengths = jnp.full((b,), s // 2, jnp.int32)

    def make_chain(ns, bk):
        @jax.jit
        def chain(q, k, v, lengths):
            def body(c, _):
                o = flash_decode(c, k, v, lengths, num_splits=ns, block_k=bk,
                                 batch_block=16)
                return c + o * jnp.bfloat16(1e-3), None
            c, _ = jax.lax.scan(body, q, None, length=64)
            return c
        return chain

    fused = make_chain(1, 64)
    split = make_chain(4, 64)
    for f in (fused, split):  # compile + warm
        np.asarray(f(q, k, v, lengths)[0, 0, :1])
    with jax.profiler.trace(out_dir):
        with jax.profiler.TraceAnnotation("decode_fused_epilogue_ns1"):
            np.asarray(fused(q, k, v, lengths)[0, 0, :1])
        with jax.profiler.TraceAnnotation("decode_split_combine_ns4"):
            np.asarray(split(q, k, v, lengths)[0, 0, :1])


def summarize(out_dir: str, top: int = 28) -> None:
    # jax.profiler.trace writes a trace-viewer JSON next to the xplane —
    # parse it directly (the tensorboard_plugin_profile converter is broken
    # against this image's TF build).
    jsons = glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True)
    if jsons:
        latest = max(jsons, key=lambda p: Path(p).stat().st_mtime)
        trace = json.loads(gzip.open(latest, "rt").read())
    else:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        xplanes = glob.glob(f"{out_dir}/**/*.xplane.pb", recursive=True)
        assert xplanes, f"no xplane under {out_dir}"
        xplane = max(xplanes, key=lambda p: Path(p).stat().st_mtime)
        data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], "trace_viewer", {})
        trace = json.loads(data)
    events = trace["traceEvents"]
    pid_names = {
        e["pid"]: e["args"]["name"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    # device-side complete events only
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid", -1), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0.0)  # us
        by_op[name] += dur
        total += dur
    print(f"device total: {total/1e3:.3f} ms over {len(by_op)} distinct ops")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur/1e3:9.3f} ms  {100*dur/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/artifacts/trace_step")
    ap.add_argument("--no-capture", action="store_true")
    ap.add_argument("--prefill", action="store_true")
    ap.add_argument("--moe", action="store_true")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--epilogue", action="store_true")
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--scheme", default="bf16", choices=["bf16", "int8w"])
    args = ap.parse_args()
    if not args.no_capture:
        if args.prefill:
            capture_prefill(args.out, seq=args.seq, scheme=args.scheme)
        elif args.moe:
            capture_moe(args.out)
        elif args.verify:
            capture_verify(args.out)
        elif args.epilogue:
            capture_epilogue(args.out)
        else:
            capture(args.out)
    summarize(args.out)
