"""Training-mode forward + loss for the Llama-family models.

The reference is inference-only (SURVEY.md §2: no backward, no training);
this module is the framework's training path, built from the same blocks
the serving path uses (rms_norm / RoPE / SwiGLU / fused-QKV layouts from
models/llama.py) so a trained checkpoint drops straight into the engine.

Attention is differentiable flash (ops/flash_bwd.flash_attention: Pallas
forward + FA2 backward, O(S) memory) by default, with a plain-jnp fallback
(``use_flash=False``) that materializes the (B, H, S, S) score tensor —
the two produce matching gradients (tests/test_train.py) and the jnp twin
doubles as the spec.

TPU notes: per-layer ``jax.checkpoint`` (remat) is on by default — decode
weights dominate HBM, so recomputing layer activations in the backward
trades cheap MXU FLOPs for the memory that sets the max trainable batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from starflashattention_tpu.models import llama
from starflashattention_tpu.ops.flash_bwd import flash_attention
from starflashattention_tpu.runtime.params import ModelConfig


def _attn_jnp(q, k, v, cfg: ModelConfig):
    """Plain-jnp causal attention twin (the executable spec)."""
    b, _, s, _ = q.shape
    g = cfg.num_q_heads // cfg.num_kv_heads
    kq = jnp.repeat(k, g, axis=1)
    vq = jnp.repeat(v, g, axis=1)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, kq) / (cfg.head_dim**0.5)
    pos = jnp.arange(s)
    mask = pos[None, :] <= pos[:, None]
    if cfg.sliding_window is not None:
        mask = mask & (pos[None, :] > pos[:, None] - cfg.sliding_window)
    scores = jnp.where(mask[None, None], scores, -1e30)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, axis=-1), vq)


def forward_train(
    params,
    tokens: jax.Array,  # (B, S) int32
    cfg: ModelConfig,
    cos: jax.Array,
    sin: jax.Array,
    *,
    use_flash: bool = True,
    remat: bool = True,
) -> jax.Array:
    """All-position logits (B, S, V) — the training twin of the serving
    prefill (models/llama._prefill_core), cache-free and differentiable."""
    b, s = tokens.shape
    x = params["embed"][tokens]
    pos = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))

    def layer_body(x, lp):
        h = llama.rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        qkv = jnp.dot(h, lp["wqkv"])
        if cfg.attention_bias:
            qkv = qkv + lp["bqkv"]
        q, k, v = llama._split_heads_prefill(qkv, cfg)
        q = llama.apply_rope(q, pos[:, None, :], cos, sin, style=cfg.rope_style)
        k = llama.apply_rope(k, pos[:, None, :], cos, sin, style=cfg.rope_style)
        if use_flash:
            o = flash_attention(q, k, v, window=cfg.sliding_window)
        else:
            o = _attn_jnp(q, k, v, cfg)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, -1)
        x = x + jnp.dot(o, lp["wo"])

        h = llama.rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        if cfg.num_experts:
            x = x + _moe_mlp_train(h, lp, cfg)
        else:
            gu = jnp.dot(h, lp["w_gate_up"])
            gate, up = jnp.split(gu, 2, axis=-1)
            x = x + jnp.dot(jax.nn.silu(gate) * up, lp["w_down"])
        return x, None

    if remat:
        layer_body = jax.checkpoint(layer_body)
    x, _ = jax.lax.scan(layer_body, x, llama._scan_xs_layers(params["layers"]))
    x = llama.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    return jnp.dot(x, head, preferred_element_type=jnp.float32)


def _moe_mlp_train(h, lp, cfg: ModelConfig):
    """Dense-compute MoE for training: top-k routing weights softmaxed
    (Mixtral semantics, matching llama._moe_mlp), experts evaluated densely
    and mixed — differentiable, fine at the tiny scales trainable offline."""
    router = jnp.dot(h.astype(jnp.float32), lp["moe_router"].astype(jnp.float32))
    top_w, top_i = jax.lax.top_k(router, cfg.num_experts_per_tok)
    top_w = jax.nn.softmax(top_w, axis=-1).astype(h.dtype)
    # (E, B, S, 2I) gate-up for every expert, then gather the top-k mix
    gu = jnp.einsum("bsd,edi->ebsi", h, lp["moe_gate_up"])
    gate, up = jnp.split(gu, 2, axis=-1)
    act = jax.nn.silu(gate) * up
    down = jnp.einsum("ebsi,eid->ebsd", act, lp["moe_down"])  # (E, B, S, D)
    down = down.transpose(1, 2, 0, 3)  # (B, S, E, D)
    picked = jnp.take_along_axis(down, top_i[..., None], axis=2)
    return jnp.sum(picked * top_w[..., None], axis=2)


def loss_fn(params, batch, cfg: ModelConfig, cos, sin, *, use_flash=True,
            remat=True):
    """Next-token cross-entropy over (B, S+1) token batches."""
    logits = forward_train(
        params, batch[:, :-1], cfg, cos, sin, use_flash=use_flash, remat=remat
    )
    targets = batch[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


@functools.partial(jax.jit, static_argnames=("cfg", "use_flash", "remat"))
def train_step(params, opt_state, batch, cfg: ModelConfig, cos, sin, lr,
               *, use_flash: bool = True, remat: bool = True):
    """One SGD-with-momentum step (optimizer-free helper for quick runs;
    benchmarks/train_tiny.py uses optax for the real tiny-model training)."""
    loss, grads = jax.value_and_grad(loss_fn)(
        params, batch, cfg, cos, sin, use_flash=use_flash, remat=remat
    )
    new_m = jax.tree.map(lambda m, g: 0.9 * m + g, opt_state, grads)
    new_p = jax.tree.map(lambda p, m: p - lr * m, params, new_m)
    return new_p, new_m, loss
