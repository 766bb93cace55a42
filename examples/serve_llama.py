"""End-to-end serving example: Llama-7B-GQA continuous batching.

The analog of the reference's Python example
(/root/reference/examples/python/testFlashDecoder.py) grown into what the
reference could not do: a full model generating tokens through the
continuous-batching engine.

Run: python examples/serve_llama.py [--tiny]
"""

import argparse
import time

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax
import numpy as np

from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.serving import Engine, PagedEngine, SamplingParams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="small model (CPU-friendly)")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--new-tokens", type=int, default=32)
    ap.add_argument("--paged", action="store_true",
                    help="paged KV pool (vLLM-style; native C++ allocator when built)")
    ap.add_argument("--int8", action="store_true", help="INT8 weight-only quantization")
    ap.add_argument("--int4", action="store_true",
                    help="INT4 weight-only quantization (nibble-packed, "
                    "grouped scales, fused in-kernel dequant; ~1.2x the int8 "
                    "decode tokens/s at 7B, weights 5.8 -> 3.0 GB)")
    ap.add_argument("--chunk", type=int, default=None,
                    help="chunked prefill width (one compiled prefill shape; "
                    "long prompts no longer monopolize a round)")
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="sampling temperature (0 = greedy)")
    ap.add_argument("--top-k", type=int, default=0, help="top-k cut (0 = off)")
    ap.add_argument("--top-p", type=float, default=1.0, help="nucleus cut (1 = off)")
    ap.add_argument("--seed", type=int, default=0,
                    help="sampling seed (trajectories are deterministic per seed)")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="automatic prefix caching (paged engine): admissions "
                    "reuse full KV pages of previously-seen prompt prefixes")
    ap.add_argument("--system-prompt", type=int, default=0,
                    help="prepend N shared tokens to every prompt (shows the "
                    "prefix cache working)")
    ap.add_argument("--lora", type=int, default=0, metavar="N",
                    help="serve N resident LoRA adapters (random init for "
                    "the demo), requests round-robin across them + base")
    args = ap.parse_args()

    if args.tiny or jax.default_backend() != "tpu":
        if jax.default_backend() == "tpu":
            # Mosaic DMA slices need 128-lane-aligned head dims on real
            # hardware; interpret mode (CPU) accepts the smaller test dims.
            cfg = ModelConfig.tiny(dtype="float32", head_dim=128, max_seq_len=256)
        else:
            cfg = ModelConfig.tiny(dtype="float32")
    else:
        cfg = ModelConfig.llama_7b_gqa(max_seq_len=1024)
    if args.int4 and args.int8:
        ap.error("--int8 and --int4 are mutually exclusive")
    quantize = "int4" if args.int4 else "int8" if args.int8 else None
    # quantize at init where requested: the big stacks are generated
    # layer-by-layer directly in quantized form (fits geometries whose dense
    # bf16 init alone would exceed HBM)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), quantize=quantize)
    if quantize:
        params = llama.quantize_model_weights(
            params, quantize, consume=True, lm_head=quantize == "int4")
    print(f"model: {llama.param_count(params)/1e9:.2f}B params, "
          f"{cfg.num_layers}L {cfg.num_q_heads}/{cfg.num_kv_heads} heads")

    rng = np.random.default_rng(0)
    system = [int(t) for t in rng.integers(0, cfg.vocab_size, args.system_prompt)]
    prompts = [
        system + [int(t) for t in rng.integers(0, cfg.vocab_size, rng.integers(4, 64))]
        for _ in range(args.requests)
    ]

    if args.prefix_cache and not args.paged:
        ap.error("--prefix-cache requires --paged (it shares pool pages)")
    sampled = args.temperature > 0.0
    samp = SamplingParams(
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        seed=args.seed,
    ) if sampled else None
    loras = None
    adapters = None
    if args.lora:
        if quantize:
            ap.error("--lora demo uses the dense base (adapters compose "
                     "with the activations, but this demo merges nothing)")
        from starflashattention_tpu.models import lora as lora_lib

        loras = [
            lora_lib.init_lora(cfg, jax.random.PRNGKey(100 + i), rank=16)
            for i in range(args.lora)
        ]
        # round-robin: adapter 0, 1, ..., N-1, base, adapter 0, ...
        adapters = [
            i % (args.lora + 1) if i % (args.lora + 1) < args.lora else None
            for i in range(len(prompts))
        ]
        print(f"multi-LoRA: {args.lora} adapters resident (rank 16)")
    if args.paged:
        page = 32 if cfg.max_seq_len < 512 else 128
        eng = PagedEngine(params, cfg, num_slots=args.slots, steps_per_round=8,
                          prefill_chunk=args.chunk, enable_sampling=sampled,
                          prefix_cache=args.prefix_cache, page_size=page,
                          lora_adapters=loras)
        print(f"paged pool: {eng.num_pages} pages x {eng.page_size} tokens, "
              f"allocator={type(eng.pool).__name__}")
    else:
        eng = Engine(params, cfg, num_slots=args.slots, steps_per_round=8,
                     prefill_chunk=args.chunk, enable_sampling=sampled,
                     lora_adapters=loras)
    t0 = time.time()
    outputs = eng.generate(prompts, max_new_tokens=args.new_tokens,
                           sampling=samp, adapters=adapters)
    dt = time.time() - t0
    total = sum(len(o) for o in outputs)
    print(f"{len(outputs)} requests, {total} tokens in {dt:.2f}s "
          f"-> {total/dt:.1f} tok/s (incl. prefill + scheduling)")
    print("engine stats:", eng.stats.summary())
    print("first output:", outputs[0][:16])


if __name__ == "__main__":
    main()
