"""Train a tiny byte-level Llama on REAL text and check in the weights.

The environment has no network egress and ships no pretrained checkpoints,
but BASELINE.json's accuracy clause wants quantization deltas "at the same
bit-width ... downstream perplexity" measured on a REAL model — random-init
twins (quant_accuracy.py's default protocol) have near-uniform logits whose
argmax flips exaggerate top-1 damage and whose perplexity is meaningless.
This script closes that gap the only way available offline: it trains a
~2.5M-param Llama-architecture model (same init_params pytree, same RoPE;
plain-jnp causal attention for the differentiable forward — the Pallas
inference kernels have no autodiff rule and are exercised by the eval
side instead) on the repository's own source text
(byte-level, ~1 MB of genuine code/prose), holds out a validation split,
and saves an orbax checkpoint via models/checkpoint.save_checkpoint —
exercising the checkpoint subsystem end-to-end. quant_accuracy.py
--real-checkpoint then loads it and reports per-scheme perplexity deltas
on held-out text.

Usage: python benchmarks/train_tiny.py [--steps 3000] [--out benchmarks/artifacts/tiny_trained]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from starflashattention_tpu.models import llama

from starflashattention_tpu.runtime.params import ModelConfig

SEQ = 256


def tiny_cfg() -> ModelConfig:
    # head_dim 128 so the trained model runs the REAL TPU decode/append
    # kernels (cache_append requires lane-dim multiples of 128 on chip).
    return ModelConfig(
        vocab_size=256,
        hidden_size=256,
        intermediate_size=512,
        num_layers=4,
        num_q_heads=2,
        num_kv_heads=1,
        head_dim=128,
        max_seq_len=512,
        dtype="float32",
        num_splits=1,
        block_k=128,
    )


def load_corpus(repo: Path) -> np.ndarray:
    """All tracked text files (py/md/toml) under the repo → one byte array."""
    chunks = []
    for pat in ("**/*.py", "**/*.md", "**/*.toml"):
        for f in sorted(repo.glob(pat)):
            if "artifacts" in f.parts or ".git" in f.parts:
                continue
            try:
                chunks.append(f.read_bytes())
            except OSError:
                continue
    data = b"\n\n".join(chunks)
    return np.frombuffer(data, np.uint8)


def forward_train(params, tokens, cfg: ModelConfig, cos, sin):
    """All-position logits (B, S, V) — the training twin of _prefill_core
    (no cache; same rms_norm/RoPE/flash_prefill/SwiGLU building blocks)."""
    b, s = tokens.shape
    x = params["embed"][tokens]
    pos = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))


    def layer_body(x, lp):
        h = llama.rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        qkv = jnp.dot(h, lp["wqkv"])
        q, k, v = llama._split_heads_prefill(qkv, cfg)
        q = llama.apply_rope(q, pos[:, None, :], cos, sin, style=cfg.rope_style)
        k = llama.apply_rope(k, pos[:, None, :], cos, sin, style=cfg.rope_style)
        # plain-jnp causal attention: the Pallas kernel has no autodiff rule
        # (it's an inference kernel; quant_accuracy's eval uses it instead)
        g = cfg.num_q_heads // cfg.num_kv_heads
        kq = jnp.repeat(k, g, axis=1)
        vq = jnp.repeat(v, g, axis=1)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, kq) / (cfg.head_dim**0.5)
        mask = jnp.tril(jnp.ones((s, s), bool))
        scores = jnp.where(mask[None, None], scores, -1e30)
        o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, axis=-1), vq)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, -1)
        x = x + jnp.dot(o, lp["wo"])

        h = llama.rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        gu = jnp.dot(h, lp["w_gate_up"])
        gate, up = jnp.split(gu, 2, axis=-1)
        x = x + jnp.dot(jax.nn.silu(gate) * up, lp["w_down"])
        return x, None

    x, _ = jax.lax.scan(layer_body, x, llama._scan_xs_layers(params["layers"]))
    x = llama.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return jnp.dot(x, params["lm_head"], preferred_element_type=jnp.float32)


def loss_fn(params, batch, cfg, cos, sin):
    logits = forward_train(params, batch[:, :-1], cfg, cos, sin)
    targets = batch[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument(
        "--out", default=str(Path(__file__).parent / "artifacts" / "tiny_trained")
    )
    args = ap.parse_args()

    repo = Path(__file__).resolve().parents[1]
    corpus = load_corpus(repo)
    n_val = len(corpus) // 20
    train, val = corpus[:-n_val], corpus[-n_val:]
    print(f"corpus: {len(corpus)} bytes ({len(train)} train / {len(val)} val)")

    cfg = tiny_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    n_params = llama.param_count(params)
    print(f"params: {n_params/1e6:.2f}M")
    cos, sin = llama.rope_tables(cfg)

    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.1)
    opt = optax.adamw(sched, weight_decay=0.01)
    opt_state = opt.init(params)

    @functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, cfg, cos, sin):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, cfg, cos, sin)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def eval_step(params, batch, cfg, cos, sin):
        return loss_fn(params, batch, cfg, cos, sin)

    def sample(split, rng, b):
        idx = rng.integers(0, len(split) - SEQ - 1, size=(b,))
        return jnp.asarray(
            np.stack([split[i:i + SEQ + 1] for i in idx]).astype(np.int32)
        )

    rng = np.random.default_rng(0)
    val_batches = [sample(val, rng, args.batch) for _ in range(4)]
    t0 = time.time()
    for step in range(args.steps + 1):
        batch = sample(train, rng, args.batch)
        params, opt_state, loss = train_step(params, opt_state, batch, cfg, cos, sin)
        if step % 250 == 0:
            vl = float(np.mean([np.asarray(eval_step(params, vb, cfg, cos, sin))
                                for vb in val_batches]))
            print(
                f"step {step:5d}  train {float(np.asarray(loss)):.4f}  "
                f"val {vl:.4f}  ppl {np.exp(vl):.2f}  ({time.time()-t0:.0f}s)",
                flush=True,
            )

    from starflashattention_tpu.models import checkpoint

    checkpoint.save_checkpoint(args.out, jax.device_get(params), cfg)
    print(f"checkpoint saved to {args.out} (val ppl {np.exp(vl):.2f})")


if __name__ == "__main__":
    main()
