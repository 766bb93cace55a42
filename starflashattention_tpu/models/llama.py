"""Llama-family GQA transformer — functional JAX, scan-over-layers.

End-to-end model for the BASELINE.json 7B-GQA workload. Architecture matches
the reference golden model's Llama attention semantics
(/root/reference/examples/python/testFlashDecoder.py:61-94: fused QKV → RoPE →
cache concat → softmax·V) extended to the full decoder block (RMSNorm,
SwiGLU, residuals) and GQA.

Design notes (TPU-first):
- Layer parameters are STACKED on a leading (L, ...) axis and the decoder
  runs under ``jax.lax.scan`` — one traced layer body instead of L unrolled
  copies, so compile time and program size are O(1) in depth.
- The KV cache rides the scan carry; appends are dynamic_update_slice at the
  traced layer index (in-place under donation).
- Projections are fused: one (H, (Hq+2Hkv)·D) QKV matmul, one (H, 2I)
  gate+up matmul — big MXU matmuls instead of many small ones.
- decode_step / prefill are whole-model single XLA programs: embedding →
  L × (attention + MLP) → final norm → logits, no host round-trips.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from starflashattention_tpu.cache import contiguous, paged
from starflashattention_tpu.core import drafting, quant
from starflashattention_tpu.core import sampling as core_sampling
from starflashattention_tpu.ops import cache_append
from starflashattention_tpu.core.rope import apply_rope, rope_table
from starflashattention_tpu.ops.flash_decode import flash_decode, flash_verify
from starflashattention_tpu.ops.flash_prefill import flash_prefill
from starflashattention_tpu.ops.paged_decode import paged_flash_decode
from starflashattention_tpu.ops.quant_matmul import (
    quant_matmul, quant_matmul_int4, quant_matmul_w4a8, quant_matmul_w8a8)
from starflashattention_tpu.runtime.params import ModelConfig

Params = dict[str, Any]

_QUANT_WEIGHTS = ("wqkv", "wo", "w_gate_up", "w_down", "moe_gate_up", "moe_down")


def _wq_matmul(x2d: jax.Array, w: dict, layer, out_dtype=None) -> jax.Array:
    """Route a quantized weight dict to its kernel: int8/fp8 per-column
    (quant_matmul) vs int4 grouped (quant_matmul_int4). The scale RANK tags
    the format — see core/quant.is_int4_weight."""
    if quant.is_int4_weight(w):
        return quant_matmul_int4(
            x2d, w["w"], w["scale"], layer=layer, out_dtype=out_dtype)
    return quant_matmul(x2d, w["w"], w["scale"], layer=layer, out_dtype=out_dtype)


def _make_proj(
    layers: Params, lp: Params, lidx, cfg: "ModelConfig | None" = None,
    axis_name: str | None = None,
):
    """Projection closure for one scan iteration → fp32 outputs.

    Dense weights arrive pre-sliced via the scan xs (``lp``); QUANTIZED
    weights stay stacked in ``layers`` and the kernel selects the layer via
    ``lidx`` — an XLA dynamic-slice feeding a Pallas operand would
    materialize a full per-layer copy (measured 2.8x slower).

    W8A8 covers all four projections. The row-parallel ones (w_down, wo)
    see only a shard-local slice of each activation row under TP, so their
    dynamic row scales are pmax'd over the model axis (quantize_rows
    axis_name) — every shard then quantizes with exactly the full-row scale
    the single-chip run computes, preserving the sharded-equals-single-chip
    bit-match contract at the cost of one tiny (rows, 1) collective per
    projection."""
    w8a8 = cfg is not None and cfg.w8a8_prefill
    _ROW_PARALLEL = ("w_down", "wo")

    def proj(x: jax.Array, name: str, out_dtype=None) -> jax.Array:
        """``out_dtype`` narrows the QUANT kernel's output write in-kernel.
        Only safe where the consumer casts before any cross-shard psum
        (wqkv, gate_up — column-parallel, reduced after the cast in both the
        single-chip and TP worlds, so sharded bit-match is preserved). The
        dense path keeps f32; XLA fuses the downstream convert for free."""
        w = layers[name]
        if isinstance(w, dict):
            flat = x.reshape(-1, x.shape[-1])
            # W8A8 only at prefill row counts (compute-bound) and only for
            # int8 weights; decode rows (B ~ 16) stay weight-only — the
            # int8 MXU rate buys nothing when the matmul is weight-read
            # bound, and dynamic activation quant would only add error.
            # Threshold is on LOCAL rows (under shard_map the batch is
            # data-sharded), so it must sit well below one shard's prefill
            # rows while staying above any realistic decode batch: 256.
            if w8a8 and flat.shape[0] >= 256 and w["w"].dtype == jnp.int8:
                # prefill rows on the 2x-rate int8 MXU path: W8A8 for int8
                # weights, W4A8 (in-kernel nibble->int8 unpack) for int4 —
                # int4 deployments keep the fast-TTFT path
                kernel = (
                    quant_matmul_w4a8 if quant.is_int4_weight(w)
                    else quant_matmul_w8a8)
                out = kernel(
                    flat, w["w"], w["scale"], layer=lidx, out_dtype=out_dtype,
                    axis_name=axis_name if name in _ROW_PARALLEL else None,
                )
            else:
                out = _wq_matmul(flat, w, lidx, out_dtype=out_dtype)
            return out.reshape(*x.shape[:-1], out.shape[-1])
        return jnp.dot(x, lp[name], preferred_element_type=jnp.float32)

    return proj


def _scan_xs_layers(layers: Params) -> Params:
    """The scan-sliced part of the layer params: everything except stacked
    quantized weight dicts (those are closed over, see _make_proj)."""
    return {k: v for k, v in layers.items() if not isinstance(v, dict)}


@functools.partial(jax.jit, static_argnames=("mode", "int4_group"))
def _quantize_stacked(w: jax.Array, mode: str, int4_group: int | None = None):
    # No donation: the quantized outputs (int8/packed nibbles + scales) can
    # never alias the wider dense input buffer, so XLA would only warn
    # "donated buffers were not usable". The dense buffer frees when the
    # caller drops its reference (quantize_model_weights consume=True pops
    # it), which is what actually lets original+quantized 7B coexist.
    # lax.map streams layer by layer: the fp32 intermediate is one layer's
    # worth, not the whole stacked weight (which would OOM a 7B on 16 GB).
    if mode == "int4":
        return jax.lax.map(
            lambda wl: quant.quantize_weight_int4(wl, int4_group), w)
    return jax.lax.map(lambda wl: quant.quantize_weight(wl, mode), w)


@functools.partial(
    jax.jit, static_argnames=("shape", "fan_in", "dtype_name", "mode", "int4_group"))
def _init_quantized_stack(keys, shape, fan_in, dtype_name, mode, int4_group=None):
    # lax.map generates+quantizes one layer per step: peak HBM is one dense
    # layer slice, not the stacked dense weight (init_params quantize=...).
    dt = jnp.dtype(dtype_name)

    def one(k):
        w = jax.random.normal(k, shape, dt) / jnp.asarray(fan_in**0.5, dt)
        if mode == "int4":
            return quant.quantize_weight_int4(w, int4_group)
        return quant.quantize_weight(w, mode)

    return jax.lax.map(one, keys)


def quantize_model_weights(
    params: Params, mode: "quant.WeightQuantMode" = "int8", consume: bool = False,
    lm_head: bool = False, int4_group: int | None = None,
) -> Params:
    """Quantize the big projection weights (weight-only, per-output-channel
    scales; ``mode="int4"`` uses the nibble-packed grouped scheme —
    core/quant.quantize_weight_int4 — halving the weight stream again).
    The embedding (gather path) stays dense. Returns a new params
    pytree; jit specializes on the changed structure.

    ``lm_head=True`` additionally quantizes the output head — at 7B it is
    the step's single largest remaining dense stream (262 MB bf16/step; the
    per-column-scale int8 halves it). Measured logit max-abs-err from the
    head alone is the same order as one projection's (benchmarks/
    quant_accuracy.py scheme "int8_lm_head" asserts the bound at 7B).
    Ignored for tied-embedding models (the gather table stays dense).

    ``consume=True`` frees each dense weight as it is quantized (required to
    fit original + quantized on one chip for 7B-class models); the input
    pytree is emptied of those entries.
    """
    layers = dict(params["layers"])
    src_layers = params["layers"]
    # MoE models carry moe_gate_up/moe_down (L, E, H, O) stacks instead of
    # the dense pair; both the attention projections AND the expert stacks
    # quantize (per-expert per-output-channel scales — quantize_weight
    # reduces the contraction axis, so an (E, H, O) layer yields (E, O)
    # scales). The router stays fp32: it is tiny and drives a top-k whose
    # determinism across shardings matters more than its bytes.
    for name in (n for n in _QUANT_WEIGHTS if n in src_layers):
        if isinstance(src_layers[name], dict):
            continue  # already quantized (init_params quantize=...)
        # with consume=True the pop + del drop the dense buffer as soon as
        # the quantize program retires — how original+quantized 7B fit on
        # one chip (one dense stack alive at a time)
        w = src_layers.pop(name) if consume else src_layers[name]
        layers[name] = _quantize_stacked(w, mode, int4_group)
        del w
    out = dict(params)
    out["layers"] = layers
    if lm_head and "lm_head" in params and not isinstance(params["lm_head"], dict):
        w = out.pop("lm_head") if consume else params["lm_head"]
        out["lm_head"] = _quantize_flat(w, mode, int4_group)
        del w
    return out


@functools.partial(jax.jit, static_argnames=("mode", "int4_group"))
def _quantize_flat(w: jax.Array, mode: str, int4_group: int | None = None):
    # no donation — narrower outputs can't alias the dense input (see
    # _quantize_stacked)
    if mode == "int4":
        return quant.quantize_weight_int4(w, int4_group)
    return quant.quantize_weight(w, mode)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_params(
    cfg: ModelConfig, key: jax.Array, dtype=None,
    quantize: "quant.WeightQuantMode | None" = None,
    int4_group: int | None = None,
) -> Params:
    """Random-init parameters (benchmark / smoke use; checkpoint loaders fill
    the same pytree). Layer params are stacked on a leading L axis.

    ``quantize``: generate the big projection stacks DIRECTLY in quantized
    form, one layer at a time — the pytree matches
    ``quantize_model_weights(init_params(...), mode, consume=True)`` in
    structure (values differ: per-layer keys). Needed for geometries whose
    dense bf16 init alone exceeds HBM (Mixtral depth-8 is ~23 GB bf16 but
    ~11.5 GB int8 on a 16 GB v5e): the full-stack dense init OOMs before
    quantize_model_weights can ever shrink it.
    """
    if dtype is None:
        dtype = jnp.dtype(cfg.dtype)
    h, d = cfg.hidden_size, cfg.head_dim
    hq, hkv, inter, L = cfg.num_q_heads, cfg.num_kv_heads, cfg.intermediate_size, cfg.num_layers
    g = hq // hkv

    keys = jax.random.split(key, 18)

    def norm01(k, shape, fan_in):
        # Generate directly in the target dtype: an fp32 intermediate for a
        # 7B model would transiently need ~2x HBM and OOM a 16 GB chip.
        return jax.random.normal(k, shape, dtype) / jnp.asarray(fan_in**0.5, dtype)

    def big(k, shape, fan_in):
        # A quantizable stacked projection: dense norm01, or (quantize set)
        # per-layer generate→quantize so peak HBM is one dense layer + the
        # accumulating int8/fp8 stack, never the full dense stack.
        if quantize is None:
            return norm01(k, shape, fan_in)
        return _init_quantized_stack(
            jax.random.split(k, shape[0]), shape[1:], float(fan_in),
            jnp.dtype(dtype).name, quantize, int4_group)

    params: Params = {
        "embed": norm01(keys[0], (cfg.vocab_size, h), 1.0),
        "layers": {
            "attn_norm": jnp.ones((L, h), dtype),
            # Fused projections stay FLAT 2D-per-layer: any extra trailing
            # structure forces XLA to physically re-copy the weight at every
            # scan iteration (measured +41 ms/step for a (H, 2, I) gate/up on
            # a 7B at B=2). Tensor-parallel alignment is instead a one-time
            # COLUMN PERMUTATION applied at shard time (parallel/tp.py:
            # permute_params_for_tp), so the hot path never reshapes weights.
            # wqkv columns: [q (Hq*D) | k (Hkv*D) | v (Hkv*D)], head-major;
            # q head i attends kv head i // G (contiguous grouping).
            "wqkv": big(keys[1], (L, h, (hq + 2 * hkv) * d), h),
            "wo": big(keys[2], (L, hq * d, h), hq * d),
            "mlp_norm": jnp.ones((L, h), dtype),
        },
        "final_norm": jnp.ones((h,), dtype),
    }
    if cfg.num_experts:
        # Mixtral-style MoE MLP: router + per-expert [gate|up] / down stacks.
        # The router stays fp32-computed (tiny (H, E) matmul) so top-k expert
        # selection is deterministic across TP/EP shardings.
        E = cfg.num_experts
        params["layers"]["moe_router"] = norm01(keys[7], (L, h, E), h)
        params["layers"]["moe_gate_up"] = big(keys[3], (L, E, h, 2 * inter), h)
        params["layers"]["moe_down"] = big(keys[4], (L, E, inter, h), inter)
        if cfg.n_shared_experts:
            # DeepSeek shared experts: one dense SwiGLU of width
            # n_shared * expert_inter on every token, added to the routed sum
            si = cfg.n_shared_experts * inter
            params["layers"]["moe_shared_gate_up"] = norm01(
                keys[14], (L, h, 2 * si), h)
            params["layers"]["moe_shared_down"] = norm01(
                keys[15], (L, si, h), si)
        if cfg.first_k_dense:
            # DeepSeek first_k_dense_replace: a k-leading SIDE stack (dict →
            # excluded from the scan xs like the quant dicts; _mlp_block
            # gathers row lidx inside a lax.cond). The L-leading expert
            # stacks stay scan-homogeneous — the first k slices are zeros at
            # load time and the cond never reads their gather.
            di = cfg.dense_inter_size
            params["layers"]["dense_mlp"] = {
                "w_gate_up": norm01(keys[16], (cfg.first_k_dense, h, 2 * di), h),
                "w_down": norm01(keys[17], (cfg.first_k_dense, di, h), di),
            }
    else:
        # w_gate_up columns: [gate (I) | up (I)].
        params["layers"]["w_gate_up"] = big(keys[3], (L, h, 2 * inter), h)
        params["layers"]["w_down"] = big(keys[4], (L, inter, h), inter)
    if cfg.attention_bias:
        # Qwen2-style fused QKV bias, column layout identical to wqkv
        params["layers"]["bqkv"] = norm01(keys[6], (L, (hq + 2 * hkv) * d), h)
    if cfg.qk_norm:
        # Qwen3-style QK-norm: (D,) RMSNorm weights per layer, shared
        # across heads, applied before RoPE (_apply_qk_norm)
        params["layers"]["q_norm"] = jnp.ones((L, d), dtype)
        params["layers"]["k_norm"] = jnp.ones((L, d), dtype)
    if cfg.post_norms:
        # Gemma-2 post-norms: sublayer outputs RMS-normed before their
        # residual adds (_residual_add); mlp_norm doubles as the
        # pre_feedforward norm
        params["layers"]["post_attn_norm"] = jnp.ones((L, h), dtype)
        params["layers"]["post_mlp_norm"] = jnp.ones((L, h), dtype)
    if cfg.mla:
        # DeepSeek MLA replaces wqkv with the latent projections; wo takes
        # Hq*v_head_dim rows. W_uk/W_uv are the kv_b halves stored per head.
        del params["layers"]["wqkv"]
        c, nope, rope_d = cfg.kv_lora_rank, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
        v_dim = cfg.v_head_dim
        qk = nope + rope_d
        lay = params["layers"]
        if cfg.q_lora_rank is not None:
            lay["mla_wq_a"] = norm01(keys[8], (L, h, cfg.q_lora_rank), h)
            lay["mla_q_a_norm"] = jnp.ones((L, cfg.q_lora_rank), dtype)
            lay["mla_wq_b"] = norm01(
                keys[9], (L, cfg.q_lora_rank, hq * qk), cfg.q_lora_rank)
        else:
            lay["mla_wq"] = norm01(keys[8], (L, h, hq * qk), h)
        lay["mla_wkv_a"] = norm01(keys[10], (L, h, c + rope_d), h)
        lay["mla_kv_a_norm"] = jnp.ones((L, c), dtype)
        lay["mla_wuk"] = norm01(keys[11], (L, hq, nope, c), c)
        lay["mla_wuv"] = norm01(keys[12], (L, hq, c, v_dim), c)
        lay["wo"] = norm01(keys[13], (L, hq * v_dim, h), hq * v_dim)
    if not cfg.tie_embeddings:
        params["lm_head"] = norm01(keys[5], (h, cfg.vocab_size), h)
    return params


def param_count(params: Params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _layer_window(cfg: ModelConfig, lidx):
    """Per-layer sliding window. Pattern 1 (default): the static config
    window applies to every layer (compile path unchanged). Pattern P > 1
    (Gemma-2 alternating layers): layer L slides iff (L+1) % P != 0 — the
    value becomes a TRACED scalar (ops/flash_* dynamic-window operand), with
    full-attention layers passing a window beyond any length."""
    w = cfg.sliding_window
    if w is None or cfg.sliding_window_pattern == 1:
        return w
    full = jnp.int32(cfg.max_seq_len + 2)
    sliding = jax.lax.rem(
        jnp.asarray(lidx, jnp.int32) + 1, cfg.sliding_window_pattern
    ) != 0
    return jnp.where(sliding, jnp.int32(w), full)


def _residual_add(x, out, lp, post_key: str, eps: float):
    """x + out, with Gemma-2's post-norm (rms_norm of the sublayer OUTPUT
    before the residual add) when the layer params carry ``post_key``."""
    out = out.astype(x.dtype)
    if post_key in lp:
        out = rms_norm(out, lp[post_key], eps)
    return x + out


def _gate_act(cfg: ModelConfig):
    """MLP gate nonlinearity by config: SwiGLU's silu (default) or Gemma's
    GeGLU gelu_tanh (HF gelu_pytorch_tanh == jax.nn.gelu approximate)."""
    if cfg.mlp_activation == "gelu_tanh":
        return functools.partial(jax.nn.gelu, approximate=True)
    if cfg.mlp_activation == "gelu_exact":
        return functools.partial(jax.nn.gelu, approximate=False)
    assert cfg.mlp_activation == "silu", cfg.mlp_activation
    return jax.nn.silu


def _embed_tokens(params: Params, tokens: jax.Array, cfg: ModelConfig):
    """Embedding gather, with Gemma's sqrt(hidden) output scaling when
    configured (scaling the OUTPUT, not the table, keeps tied-lm_head
    logits unscaled — matching HF)."""
    x = params["embed"][tokens]
    if cfg.embed_scale:
        x = (x.astype(jnp.float32) * cfg.hidden_size**0.5).astype(x.dtype)
    return x


def _apply_qk_norm(q, k, lp, cfg):
    """Qwen3-style QK-norm: per-head RMSNorm over head_dim on q and the new
    k, BEFORE RoPE (learned (D,) weights shared across heads per layer).
    No-op unless the params carry q_norm/k_norm (cfg.qk_norm models)."""
    if "q_norm" not in lp:
        return q, k
    return (
        rms_norm(q, lp["q_norm"], cfg.rms_norm_eps),
        rms_norm(k, lp["k_norm"], cfg.rms_norm_eps),
    )


def _swiglu(x: jax.Array, proj, lora_l=None, lora_sel=None,
            act_fn=jax.nn.silu) -> jax.Array:
    from starflashattention_tpu.models.lora import delta_multi

    gu = proj(x, "w_gate_up", out_dtype=x.dtype)
    if lora_l is not None:
        gu = gu + delta_multi(x, lora_l, "w_gate_up", lora_sel)
    inter = gu.shape[-1] // 2
    gate, up = gu[..., :inter], gu[..., inter:]
    act = (act_fn(gate) * up).astype(x.dtype)
    out = proj(act, "w_down")  # fp32 (psum'd before cast under TP)
    if lora_l is not None:
        out = out + delta_multi(act, lora_l, "w_down", lora_sel)
    return out


def _shared_expert(
    flat: jax.Array, lp: Params, cfg: ModelConfig, axis_name: str | None
) -> jax.Array:
    """DeepSeek shared experts: a dense SwiGLU on every token → fp32 (N, H).

    Under a mesh the shared stacks ride the scan xs REPLICATED (the routed
    experts shard; these don't), so only shard 0 contributes — the caller's
    psum then adds exactly one copy. 0 when cfg.n_shared_experts == 0.
    """
    if not cfg.n_shared_experts:
        return jnp.zeros((), jnp.float32)
    gu = jnp.dot(
        flat, lp["moe_shared_gate_up"], preferred_element_type=jnp.float32
    )  # (N, 2*Is)
    inter = gu.shape[-1] // 2
    act = (jax.nn.silu(gu[..., :inter]) * gu[..., inter:]).astype(flat.dtype)
    out = jnp.dot(act, lp["moe_shared_down"], preferred_element_type=jnp.float32)
    if axis_name is not None:
        out = jnp.where(jax.lax.axis_index(axis_name) == 0, out, 0.0)
    return out


def _dense_first_mlp(
    flat: jax.Array, dm: Params, cfg: ModelConfig, lidx, axis_name: str | None
) -> jax.Array:
    """DeepSeek first_k_dense_replace layer: plain SwiGLU from the k-leading
    side stack ``layers["dense_mlp"]`` (a dict → closed over, never in the
    scan xs), row ``lidx`` gathered under the _mlp_block lax.cond so MoE
    layers never read it. fp32 (N, H); shard-0-gated like _shared_expert
    (the side stack is replicated under a mesh)."""
    li = jnp.minimum(jnp.asarray(lidx), cfg.first_k_dense - 1)
    wgu = jax.lax.dynamic_index_in_dim(dm["w_gate_up"], li, keepdims=False)
    wd = jax.lax.dynamic_index_in_dim(dm["w_down"], li, keepdims=False)
    gu = jnp.dot(flat, wgu, preferred_element_type=jnp.float32)
    inter = gu.shape[-1] // 2
    act_fn = _gate_act(cfg)
    act = (act_fn(gu[..., :inter]) * gu[..., inter:]).astype(flat.dtype)
    out = jnp.dot(act, wd, preferred_element_type=jnp.float32)
    if axis_name is not None:
        out = jnp.where(jax.lax.axis_index(axis_name) == 0, out, 0.0)
    return out


def _moe_mlp(
    x: jax.Array,
    lp: Params,
    cfg: ModelConfig,
    axis_name: str | None = None,
    layers: Params | None = None,
    lidx=None,
) -> jax.Array:
    """Mixtral-style top-k routed MoE MLP → fp32 (caller psums under a mesh).

    TPU-first shape: with E small (8) and decode/prefill row counts modest,
    every LOCAL expert runs on ALL rows as one (E, N, ·) batched MXU matmul
    and the router weights zero out non-selected pairs — static shapes, no
    gather/scatter, no host-side capacity planning. Under expert parallelism
    the experts shard over the mesh axis: each chip computes its E/T local
    experts' contribution and the caller's psum completes the routed sum
    (the EP analog of Megatron's row-parallel reduction). The router itself
    is replicated and computed in fp32 so every shard selects identical
    experts.

    QUANTIZED experts (``layers["moe_gate_up"]`` is a {"w","scale"} dict
    after quantize_model_weights): per-expert weight-only INT8/FP8 with
    fused in-kernel dequant. The (L, E_local, H, O) stack is viewed as
    (L·E_local, H, O) — a free leading-dim reshape — and each local expert
    runs one stacked-layer quant_matmul at index ``lidx·E_local + e``;
    back-to-back Pallas calls stream at ~roofline (docs/ARCHITECTURE.md).
    Decode on an MoE model reads EVERY local expert's weights each step
    (B·top_k assignments almost surely touch all E at serving batch sizes),
    so halving expert bytes halves the dominant HBM stream.
    """
    flat = x.reshape(-1, x.shape[-1])  # (N, H)
    n = flat.shape[0]
    e_total = cfg.num_experts
    k = cfg.num_experts_per_tok

    # Routing, scattered back to a dense (N, E_total) matrix. Two score
    # conventions: Mixtral's softmax over the k selected logits (default;
    # algebraically Qwen3's softmax-all-then-renormalize), or DeepSeek's
    # greedy gate (modeling_deepseek_v2.DeepseekV2MoEGate) — softmax over
    # ALL experts FIRST, top-k of the probabilities, NO renormalization,
    # times routed_scaling_factor.
    r = jnp.dot(
        flat.astype(jnp.float32), lp["moe_router"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # (N, E_total)
    if cfg.router_pre_softmax:
        top_w, top_idx = jax.lax.top_k(jax.nn.softmax(r, axis=-1), k)
        top_w = top_w * cfg.routed_scaling_factor  # (N, k)
    else:
        top_logit, top_idx = jax.lax.top_k(r, k)  # (N, k)
        top_w = jax.nn.softmax(top_logit, axis=-1)  # (N, k)
    dense_w = jnp.sum(
        jax.nn.one_hot(top_idx, e_total, dtype=jnp.float32) * top_w[..., None],
        axis=1,
    )  # (N, E_total)

    wg_q = layers.get("moe_gate_up") if layers is not None else None
    if isinstance(wg_q, dict):
        # ---- quantized expert path (stacked (L, E_local, H, O) dicts) ----
        wd_q = layers["moe_down"]
        e_local = wg_q["w"].shape[1]
        if axis_name is not None and e_local != e_total:
            off = jax.lax.axis_index(axis_name) * e_local
            dense_w = jax.lax.dynamic_slice_in_dim(dense_w, off, e_local, axis=1)

        def flat_stack(d):
            # (L, E, ...) → (L·E, ...); int4 scales keep their group axis
            w, s = d["w"], d["scale"]
            return {
                "w": w.reshape(w.shape[0] * w.shape[1], *w.shape[2:]),
                "scale": s.reshape(s.shape[0] * s.shape[1], *s.shape[2:]),
            }

        wg_f = flat_stack(wg_q)
        wd_f = flat_stack(wd_q)
        out = jnp.zeros((n, wd_f["w"].shape[-1]), jnp.float32)
        for e in range(e_local):
            eidx = lidx * e_local + e
            # out_dtype matches _swiglu's dense-quant convention: the silu
            # consumer casts anyway, and the narrow write halves the
            # intermediate's HBM window at prefill row counts.
            gu = _wq_matmul(flat, wg_f, eidx, out_dtype=x.dtype)
            inter = gu.shape[-1] // 2
            act = (jax.nn.silu(gu[..., :inter]) * gu[..., inter:]).astype(x.dtype)
            y = _wq_matmul(act, wd_f, eidx)  # (N, H) fp32
            out = out + y * dense_w[:, e][:, None]
        out = out + _shared_expert(flat, lp, cfg, axis_name)
        return out.reshape(*x.shape[:-1], out.shape[-1])

    wg = lp["moe_gate_up"]  # (E_local, H, 2I)
    wd = lp["moe_down"]  # (E_local, I, H)
    e_local = wg.shape[0]
    if axis_name is not None and e_local != e_total:
        off = jax.lax.axis_index(axis_name) * e_local
        dense_w = jax.lax.dynamic_slice_in_dim(dense_w, off, e_local, axis=1)

    gu = jnp.einsum(
        "nh,ehi->eni", flat, wg, preferred_element_type=jnp.float32
    )  # (E_local, N, 2I)
    inter = gu.shape[-1] // 2
    act = (jax.nn.silu(gu[..., :inter]) * gu[..., inter:]).astype(x.dtype)
    y = jnp.einsum(
        "eni,eih->enh", act, wd, preferred_element_type=jnp.float32
    )  # (E_local, N, H)
    out = jnp.einsum("enh,ne->nh", y, dense_w)  # fp32
    out = out + _shared_expert(flat, lp, cfg, axis_name)
    return out.reshape(*x.shape[:-1], out.shape[-1])


def _mlp_block(
    x: jax.Array,
    lp: Params,
    proj,
    cfg: ModelConfig,
    axis_name: str | None = None,
    layers: Params | None = None,
    lidx=None,
    lora_l=None,
    lora_sel=None,
) -> jax.Array:
    """Dense SwiGLU or MoE, by config — fp32 out, psum'd by the caller.
    ``layers``/``lidx`` give MoE access to stacked quantized expert dicts
    (excluded from the scan xs exactly like the attention quant dicts)."""
    if cfg.num_experts:
        if cfg.first_k_dense:
            # DeepSeek first_k_dense_replace: layer < k runs the dense side
            # stack, others the routed MoE — ONE traced cond keeps the scan
            # body homogeneous (only the taken branch's weights are read;
            # the first k slices of the streamed expert stacks are zeros).
            if layers is None or "dense_mlp" not in layers:
                raise ValueError(
                    "cfg.first_k_dense set but layers['dense_mlp'] missing "
                    "(this forward path did not thread the side stack)"
                )
            flat = x.reshape(-1, x.shape[-1])
            out = jax.lax.cond(
                jnp.asarray(lidx) < cfg.first_k_dense,
                lambda: _dense_first_mlp(
                    flat, layers["dense_mlp"], cfg, lidx, axis_name),
                lambda: _moe_mlp(
                    x, lp, cfg, axis_name, layers=layers, lidx=lidx
                ).reshape(flat.shape[0], -1),
            )
            return out.reshape(*x.shape[:-1], out.shape[-1])
        return _moe_mlp(x, lp, cfg, axis_name, layers=layers, lidx=lidx)
    return _swiglu(x, proj, lora_l=lora_l, lora_sel=lora_sel,
                   act_fn=_gate_act(cfg))


def _split_heads_decode(qkv: jax.Array, cfg: ModelConfig):
    """(B, (Hq+2Hkv)*D) flat [q|k|v] → q (B,Hq,D), k/v (B,Hkv,D)."""
    b = qkv.shape[0]
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    qkv = qkv.reshape(b, hq + 2 * hkv, d)
    return qkv[:, :hq], qkv[:, hq : hq + hkv], qkv[:, hq + hkv :]


def _split_heads_prefill(qkv: jax.Array, cfg: ModelConfig):
    """(B, S, (Hq+2Hkv)*D) flat [q|k|v] → q (B,Hq,S,D), k/v (B,Hkv,S,D)."""
    b, s, _ = qkv.shape
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    qkv = qkv.reshape(b, s, hq + 2 * hkv, d).transpose(0, 2, 1, 3)
    return qkv[:, :hq], qkv[:, hq : hq + hkv], qkv[:, hq + hkv :]


def _logits(
    x: jax.Array, params: Params, cfg: ModelConfig, axis_name: str | None = None
) -> jax.Array:
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    if isinstance(head, dict):
        # quantized lm_head: (H, V) int8/int4 + per-column (int4: grouped)
        # scales, fused dequant in-kernel (2D kernel mode). Under TP the
        # vocab shard splits w columns and scales identically, so the
        # all_gather below still reassembles exact full-vocab logits.
        local = _wq_matmul(x, head, 0)
    else:
        local = jnp.dot(x, head, preferred_element_type=jnp.float32)
    if axis_name is not None and cfg.lm_head_sharded:
        # vocab-sharded lm_head (parallel/tp.py): gather the (.., V/T) logit
        # slices back to full vocab — exact concatenation, bit-identical to
        # the replicated matmul, at 1/T the per-chip lm_head HBM read.
        local = jax.lax.all_gather(local, axis_name, axis=x.ndim - 1, tiled=True)
    if cfg.final_softcap is not None:
        # Gemma-2 final logit softcapping (elementwise — order vs the
        # gather is immaterial; after keeps the capped-full-vocab invariant
        # obvious)
        local = cfg.final_softcap * jnp.tanh(local / cfg.final_softcap)
    return local


def rope_tables(cfg: ModelConfig, dtype=jnp.float32):
    # MLA rotates only the decoupled qk_rope_head_dim features
    rot = cfg.qk_rope_head_dim if cfg.mla else cfg.head_dim
    return rope_table(
        cfg.max_seq_len, rot, base=cfg.rope_base, dtype=dtype,
        scaling=cfg.rope_scaling,
    )


# ---------------------------------------------------------------------------
# Decode step (one token per sequence, whole model)
# ---------------------------------------------------------------------------


def _decode_core(
    params: Params,
    cache: contiguous.KVCache,
    tokens: jax.Array,  # (B,) int32
    cos: jax.Array,
    sin: jax.Array,
    cfg: ModelConfig,
    axis_name: str | None = None,
    active: jax.Array | None = None,  # (B,) bool — slots that really decode
    max_len_hint: int | None = None,  # static bound on lengths (see flash_decode)
    lora: dict | None = None,  # stacked adapters (lora.stack_adapters)
    lora_sel: jax.Array | None = None,  # (B, N) one-hot (zero row = base)
) -> tuple[jax.Array, contiguous.KVCache]:
    """One decode step: (B,) token ids → (B, V) fp32 logits + updated cache.

    With ``axis_name`` set (under shard_map, parallel/tp.py) the heads and
    MLP intermediate are tensor-sharded and the two row-parallel projections
    (wo, w_down) psum over the axis — Megatron-style 2 all-reduces/layer,
    carried by ICI. ``active=False`` rows neither advance nor (logically)
    extend their sequence (serving engine's free slots).
    """
    x = _embed_tokens(params, tokens, cfg)  # (B, H)
    pos = cache.lengths  # (B,)
    if active is None:
        lengths_now = cache.lengths + 1
        att_lengths = lengths_now
    else:
        lengths_now = cache.lengths + active.astype(jnp.int32)
        # Inactive slots (free / retired / preempted) keep their stale cache
        # length until re-admission; attending with it would fetch their
        # whole dead KV range every step AND force max_len_hint to cover it.
        # Their attention output is discarded, so attend zero rows instead.
        att_lengths = jnp.where(active, lengths_now, 0)

    layers = params["layers"]
    body = functools.partial(
        _decode_layer, layers=layers, cfg=cfg, cos=cos, sin=sin, pos=pos,
        att_lengths=att_lengths, k_scales_tab=cache.k_scales,
        v_scales_tab=cache.v_scales, axis_name=axis_name,
        max_len_hint=max_len_hint, lora_sel=lora_sel,
    )

    layer_idx = jnp.arange(cfg.num_layers)
    if lora is None:
        def layer_body(carry, layer_in):
            lp, lidx = layer_in
            return body(carry, lp, lidx, lidx), None

        xs = (_scan_xs_layers(layers), layer_idx)
    else:
        def layer_body(carry, layer_in):
            lp, lidx, ll = layer_in
            return body(carry, lp, lidx, lidx, lora_l=ll), None

        xs = (_scan_xs_layers(layers), layer_idx, lora["layers"])
    (x, k_all, v_all), _ = jax.lax.scan(
        layer_body, (x, cache.k, cache.v), xs
    )
    cache = dataclasses.replace(cache, k=k_all, v=v_all, lengths=lengths_now)
    return _logits(x, params, cfg, axis_name=axis_name), cache


# ---------------------------------------------------------------------------
# DeepSeek MLA (multi-head latent attention) — absorbed latent form
# ---------------------------------------------------------------------------


def _mla_project_q(h, lp, cfg: ModelConfig):
    """(..., H) → per-head queries (..., Hq, nope+rope): direct projection
    (V2-Lite) or the low-rank q_a → norm → q_b path."""
    if "mla_wq_a" in lp:
        qa = rms_norm(
            jnp.dot(h, lp["mla_wq_a"]).astype(h.dtype),
            lp["mla_q_a_norm"], cfg.rms_norm_eps,
        )
        q = jnp.dot(qa, lp["mla_wq_b"])
    else:
        q = jnp.dot(h, lp["mla_wq"])
    qk_dim = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
    return q.reshape(*h.shape[:-1], cfg.num_q_heads, qk_dim).astype(h.dtype)


def _mla_qkv(h, lp, cfg: ModelConfig, cos, sin, pos):
    """MLA projections in ABSORBED latent form → (q_cat, k_row, v_row).

    The cache stores ONE shared row per token: ``k_row = [c | k_pe | 0]``
    and ``v_row = [c | 0]`` (c = normed kv latent, k_pe = the decoupled
    roped key; zero-padded to the 128-lane cache width). The query
    concatenates ``q_abs = q_nope @ W_uk`` (latent-space absorption — by
    associativity, q_abs·c == q_nope·k_nope of HF's unabsorbed form) with
    the roped ``q_pe``; padding zeros contribute nothing to scores, and the
    attention output's first kv_lora_rank features are exactly p·c (mapped
    through W_uv by :func:`_mla_out`). Runs on the EXISTING MQA kernels —
    no MLA-specific kernel. DeepSeek ropes with the complex/interleaved
    convention (HF apply_rotary_emb) regardless of cfg.rope_style.

    ``h``: (..., H) with positions shaped like the leading dims; head axis
    is inserted at -2 (callers transpose for the kernels' heads-first
    layouts)."""
    c_rank, rope_d = cfg.kv_lora_rank, cfg.qk_rope_head_dim
    nope = cfg.qk_nope_head_dim
    _, d_pad = cfg.kv_cache_dims()

    q = _mla_project_q(h, lp, cfg)  # (..., Hq, nope+rope)
    q_nope, q_pe = q[..., :nope], q[..., nope:]
    q_pe = apply_rope(q_pe, pos[..., None], cos, sin, style="interleaved")
    # absorption: (..., Hq, nope) @ (Hq, nope, c) -> (..., Hq, c)
    q_abs = jnp.einsum(
        "...hn,hnc->...hc", q_nope.astype(jnp.float32),
        lp["mla_wuk"].astype(jnp.float32),
    ).astype(h.dtype)

    kv = jnp.dot(h, lp["mla_wkv_a"]).astype(h.dtype)  # (..., c + rope)
    c = rms_norm(kv[..., :c_rank], lp["mla_kv_a_norm"], cfg.rms_norm_eps)
    k_pe = apply_rope(
        kv[..., None, c_rank:], pos[..., None], cos, sin, style="interleaved"
    )  # (..., 1, rope)
    c = c[..., None, :]  # shared single "head"

    pad = d_pad - c_rank - rope_d
    zq = jnp.zeros(q_abs.shape[:-1] + (pad,), h.dtype)
    zk = jnp.zeros(c.shape[:-1] + (pad,), h.dtype)
    zv = jnp.zeros(c.shape[:-1] + (rope_d + pad,), h.dtype)
    q_cat = jnp.concatenate([q_abs, q_pe.astype(h.dtype), zq], axis=-1)
    k_row = jnp.concatenate([c, k_pe.astype(h.dtype), zk], axis=-1)
    v_row = jnp.concatenate([c, zv], axis=-1)
    return q_cat, k_row, v_row


def _mla_out(o, lp, cfg: ModelConfig):
    """Latent attention output (..., Hq, d_pad) → (..., Hq·v_head_dim):
    slice the latent part and map through per-head W_uv."""
    o_lat = o[..., : cfg.kv_lora_rank]
    out = jnp.einsum(
        "...hc,hcv->...hv", o_lat.astype(jnp.float32),
        lp["mla_wuv"].astype(jnp.float32),
    )
    return out.reshape(*out.shape[:-2], -1).astype(o.dtype)



def _decode_layer(
    carry,
    lp: Params,
    param_lidx,  # indexes stacked layer params (quant dicts, scale tables)
    cache_lidx,  # indexes the KV table's leading axis (pipeline stages remap
    # it: parallel/pp.py flattens (L_local, M microbatches) into one axis)
    *,
    layers: Params,
    cfg: ModelConfig,
    cos, sin, pos, att_lengths,
    k_scales_tab=None, v_scales_tab=None,
    axis_name: str | None = None,
    max_len_hint: int | None = None,
    lora_l=None,  # per-layer stacked-adapter slice (multi-LoRA serving)
    lora_sel=None,  # (B, N) one-hot adapter selector
    global_lidx=None,  # GLOBAL layer index for per-layer window parity
    # (pipeline stages pass it; param_lidx stays stage-local for the
    # stacked param/scale tables)
):
    """One decoder layer of the decode step: (x, k_table, v_table) → same.

    Shared by the single-chip/TP scan (``_decode_core``) and the pipeline
    stage loop (parallel/pp.py) so every parallelism strategy runs literally
    the same per-layer program.
    """
    from starflashattention_tpu.models.lora import delta_multi

    x, k_all, v_all = carry
    proj = _make_proj(layers, lp, param_lidx, cfg, axis_name)

    # Attention
    h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
    if cfg.mla:
        # DeepSeek MLA: one shared latent row per token, absorbed queries
        q, k_new, v_new = _mla_qkv(h, lp, cfg, cos, sin, pos)
    else:
        qkv = proj(h, "wqkv", out_dtype=x.dtype).astype(x.dtype)
        if lora_l is not None:
            qkv = qkv + delta_multi(h, lora_l, "wqkv", lora_sel)
        if "bqkv" in lp:  # fused QKV bias (Qwen2-style; cfg.attention_bias)
            qkv = qkv + lp["bqkv"]
        q, k_new, v_new = _split_heads_decode(qkv, cfg)
        q, k_new = _apply_qk_norm(q, k_new, lp, cfg)
        q = apply_rope(q, pos, cos, sin, style=cfg.rope_style)
        k_new = apply_rope(k_new, pos, cos, sin, style=cfg.rope_style)

    if k_scales_tab is not None:
        ks, vs = k_scales_tab[param_lidx], v_scales_tab[param_lidx]
        k_q = contiguous._quantize_new(k_new, ks, k_all.dtype)
        v_q = contiguous._quantize_new(v_new, vs, v_all.dtype)
    else:
        ks = vs = None
        k_q, v_q = k_new.astype(k_all.dtype), v_new.astype(v_all.dtype)

    # Append the new token in place (ops/cache_append windowed-RMW DMA,
    # the analog of the reference's in-kernel append, flash_attn.cu:
    # 691-701). The functional dynamic_update_slice alternative slices
    # the layer out/in and moves ~134 MB of HBM per layer at 7B shapes
    # (measured ~40% of the decode step); this writes ~1 MB. Positions
    # clamp to the last slot exactly like dynamic_update_slice did —
    # the scheduler's capacity slack keeps real traffic below that.
    pos_w = jnp.minimum(pos, k_all.shape[3] - 1)
    k_all, v_all = cache_append.append_rows_kv(
        k_all, v_all, k_q, v_q, cache_lidx, pos_w
    )

    o = flash_decode(
        q, k_all, v_all, att_lengths, layer=cache_lidx,
        sm_scale=cfg.sm_scale(),
        num_splits=cfg.num_splits, block_k=cfg.block_k,
        batch_block=cfg.batch_block,
        k_scales=ks, v_scales=vs,
        max_len_hint=max_len_hint,
        window=_layer_window(
            cfg, param_lidx if global_lidx is None else global_lidx),
        sinks=cfg.attention_sinks, softcap=cfg.attn_softcap,
    )  # (B, Hq, D)
    o = _mla_out(o, lp, cfg) if cfg.mla else o.reshape(o.shape[0], -1)
    attn_out = proj(o, "wo")
    if lora_l is not None:
        attn_out = attn_out + delta_multi(o, lora_l, "wo", lora_sel)
    if axis_name is not None:
        attn_out = jax.lax.psum(attn_out, axis_name)
    x = _residual_add(x, attn_out, lp, "post_attn_norm", cfg.rms_norm_eps)

    # MLP
    h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
    mlp_out = _mlp_block(h, lp, proj, cfg, axis_name, layers=layers,
                         lidx=param_lidx, lora_l=lora_l, lora_sel=lora_sel)
    if axis_name is not None:
        mlp_out = jax.lax.psum(mlp_out, axis_name)
    x = _residual_add(x, mlp_out, lp, "post_mlp_norm", cfg.rms_norm_eps)
    return (x, k_all, v_all)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def decode_step(
    params: Params,
    cache: contiguous.KVCache,
    tokens: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    cfg: ModelConfig,
) -> tuple[jax.Array, contiguous.KVCache]:
    """Single-chip jitted decode step — ONE XLA program with the cache
    donated (the reference needs a binding call + 2 launches + a device sync
    PER LAYER, flash_attn.cu:978-1005)."""
    return _decode_core(params, cache, tokens, cos, sin, cfg)


# ---------------------------------------------------------------------------
# Prefill (prompt chunk, whole model)
# ---------------------------------------------------------------------------


def _prefill_core(
    params: Params,
    cache: contiguous.KVCache,
    tokens: jax.Array,  # (B, Sq) int32, right-padded
    new_lengths: jax.Array,  # (B,) valid tokens per row
    cos: jax.Array,
    sin: jax.Array,
    cfg: ModelConfig,
    axis_name: str | None = None,
    active: jax.Array | None = None,  # (B,) bool — rows being prefilled
    lora: dict | None = None,  # stacked adapters (lora.stack_adapters)
    lora_sel: jax.Array | None = None,  # (B, N) one-hot (zero row = base)
) -> tuple[jax.Array, contiguous.KVCache]:
    """Prompt ingestion: returns (B, V) fp32 logits at each row's LAST valid
    token + the filled cache. One jitted program (TTFT path).

    ``active=False`` rows are untouched: their cache windows self-write and
    their lengths don't advance (serving engine admits into a shared batch).
    """
    b, sq = tokens.shape
    x = _embed_tokens(params, tokens, cfg)  # (B, Sq, H)
    start = cache.lengths
    pos = start[:, None] + jnp.arange(sq)[None, :]  # (B, Sq)
    if active is not None:
        new_lengths = jnp.where(active, new_lengths, 0)
    kv_lengths = start + new_lengths

    layers = params["layers"]

    from starflashattention_tpu.models.lora import delta_multi

    def layer_body(carry, layer_in):
        x, k_all, v_all = carry
        if lora is None:
            lp, lidx = layer_in
            ll = None
        else:
            lp, lidx, ll = layer_in
        proj = _make_proj(layers, lp, lidx, cfg, axis_name)

        h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        if cfg.mla:
            q, k_new, v_new = _mla_qkv(h, lp, cfg, cos, sin, pos)
            # helper emits (B, Sq, H*, D); kernels take heads-first
            q = q.transpose(0, 2, 1, 3)
            k_new = k_new.transpose(0, 2, 1, 3)
            v_new = v_new.transpose(0, 2, 1, 3)
        else:
            qkv = proj(h, "wqkv", out_dtype=x.dtype).astype(x.dtype)
            if ll is not None:
                qkv = qkv + delta_multi(h, ll, "wqkv", lora_sel)
            if "bqkv" in lp:  # fused QKV bias (Qwen2-style)
                qkv = qkv + lp["bqkv"]
            q, k_new, v_new = _split_heads_prefill(qkv, cfg)  # (B, H*, Sq, D)
            q, k_new = _apply_qk_norm(q, k_new, lp, cfg)
            q = apply_rope(q, pos[:, None, :], cos, sin, style=cfg.rope_style)
            k_new = apply_rope(
                k_new, pos[:, None, :], cos, sin, style=cfg.rope_style)

        if cache.k_scales is not None:
            ks, vs = cache.k_scales[lidx], cache.v_scales[lidx]
            k_q = contiguous._quantize_new(k_new, ks, k_all.dtype)
            v_q = contiguous._quantize_new(v_new, vs, v_all.dtype)
        else:
            ks = vs = None
            k_q, v_q = k_new.astype(k_all.dtype), v_new.astype(v_all.dtype)

        # Masked window write: inactive rows re-write their own cache window
        # (no-op), so admitting new slots never corrupts busy ones.
        act = jnp.ones((b,), bool) if active is None else active

        def upd(table_b, new_b, p, a):
            window = jax.lax.dynamic_slice(
                table_b, (0, p, 0), (table_b.shape[0], sq, table_b.shape[2])
            )
            return jax.lax.dynamic_update_slice(
                table_b, jnp.where(a, new_b, window), (0, p, 0)
            )

        k_l = jax.vmap(upd)(k_all[lidx], k_q, start, act)
        v_l = jax.vmap(upd)(v_all[lidx], v_q, start, act)
        k_all = jax.lax.dynamic_update_index_in_dim(k_all, k_l, lidx, 0)
        v_all = jax.lax.dynamic_update_index_in_dim(v_all, v_l, lidx, 0)

        if ks is not None:
            k_att = (k_l.astype(jnp.float32) * ks[None, :, None, None]).astype(q.dtype)
            v_att = (v_l.astype(jnp.float32) * vs[None, :, None, None]).astype(q.dtype)
        else:
            k_att, v_att = k_l, v_l
        o = flash_prefill(
            q, k_att, v_att, lengths=kv_lengths, causal=True, q_offsets=start,
            sm_scale=cfg.sm_scale(),
            window=_layer_window(cfg, lidx), sinks=cfg.attention_sinks,
            softcap=cfg.attn_softcap,
        )  # (B, Hq, Sq, D)
        o = o.transpose(0, 2, 1, 3)
        o = _mla_out(o, lp, cfg) if cfg.mla else o.reshape(b, sq, -1)
        attn_out = proj(o, "wo")
        if ll is not None:
            attn_out = attn_out + delta_multi(o, ll, "wo", lora_sel)
        if axis_name is not None:
            attn_out = jax.lax.psum(attn_out, axis_name)
        x = _residual_add(x, attn_out, lp, "post_attn_norm", cfg.rms_norm_eps)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        mlp_out = _mlp_block(h, lp, proj, cfg, axis_name, layers=layers,
                             lidx=lidx, lora_l=ll, lora_sel=lora_sel)
        if axis_name is not None:
            mlp_out = jax.lax.psum(mlp_out, axis_name)
        x = _residual_add(x, mlp_out, lp, "post_mlp_norm", cfg.rms_norm_eps)
        return (x, k_all, v_all), None

    layer_idx = jnp.arange(cfg.num_layers)
    xs = (_scan_xs_layers(layers), layer_idx)
    if lora is not None:
        xs = xs + (lora["layers"],)
    (x, k_all, v_all), _ = jax.lax.scan(
        layer_body, (x, cache.k, cache.v), xs
    )
    cache = dataclasses.replace(cache, k=k_all, v=v_all, lengths=kv_lengths)
    # Logits at the last valid token of each row.
    last = jnp.maximum(new_lengths - 1, 0)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    return _logits(x_last, params, cfg, axis_name=axis_name), cache


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def prefill(
    params: Params,
    cache: contiguous.KVCache,
    tokens: jax.Array,
    new_lengths: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    cfg: ModelConfig,
) -> tuple[jax.Array, contiguous.KVCache]:
    """Single-chip jitted prefill."""
    return _prefill_core(params, cache, tokens, new_lengths, cos, sin, cfg)


def _decode_multi_core(
    params: Params,
    cache: contiguous.KVCache,
    tok: jax.Array,  # (B,) the pending token per slot
    cos: jax.Array,
    sin: jax.Array,
    active: jax.Array,  # (B,) bool
    cfg: ModelConfig,
    n_steps: int,
    axis_name: str | None = None,
    sampling: dict | None = None,
    with_logprobs: bool = False,
    topk_logprobs: int = 0,
    max_len_hint: int | None = None,
    lora: dict | None = None,
    lora_sel: jax.Array | None = None,
) -> tuple:
    """``n_steps`` decode steps in ONE program → (tokens (B, n),
    next pending token, cache[, logprobs (B, n) f32]). ``axis_name`` set =
    running per-shard under shard_map (parallel/tp.py serving path).
    ``sampling`` (core/sampling.py state arrays) switches token selection
    from argmax to per-slot temperature/top-k/top-p sampling, keyed by
    (seed, absolute position) so trajectories are replay-deterministic.
    ``with_logprobs`` additionally emits each chosen token's log-probability
    under the UNMODIFIED distribution (log_softmax of the raw logits —
    temperature/cuts change what is chosen, not what is reported)."""

    def step(carry, _):
        tok, cache = carry
        logits, cache = _decode_core(
            params, cache, tok, cos, sin, cfg, axis_name=axis_name,
            active=active, max_len_hint=max_len_hint,
            lora=lora, lora_sel=lora_sel,
        )
        if sampling is None:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            # post-step cache.lengths IS the new token's absolute position
            nxt = core_sampling.sample_tokens(logits, sampling, cache.lengths)
        out = (nxt,)
        if with_logprobs:
            out = out + (token_logprob(logits, nxt),)
        if topk_logprobs:
            out = out + topk_token_logprobs(logits, topk_logprobs)
        return (nxt, cache), out

    (tok, cache), outs = jax.lax.scan(step, (tok, cache), None, length=n_steps)
    res = (outs[0].T, tok, cache)  # (B, n), (B,), cache
    i = 1
    if with_logprobs:
        res = res + (outs[i].T,)  # (B, n)
        i += 1
    if topk_logprobs:
        # (n, B, K) -> (B, n, K)
        res = res + (outs[i].transpose(1, 0, 2), outs[i + 1].transpose(1, 0, 2))
    return res


def token_logprob(logits: jax.Array, tok: jax.Array) -> jax.Array:
    """log P(tok) under log_softmax(logits) → (B,) f32."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lp, tok[:, None].astype(jnp.int32), axis=-1)[:, 0]


def topk_token_logprobs(logits: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Top-k alternatives per row under the UNMODIFIED distribution →
    ((B, k) f32 logprobs desc, (B, k) i32 token ids) — the serving API's
    per-position alternatives (sampling cuts change what is CHOSEN, not
    what is reported)."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    v, i = jax.lax.top_k(lp, k)
    return v, i.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "with_logprobs", "topk_logprobs",
                     "max_len_hint"),
    donate_argnums=(1,),
)
def decode_multi(
    params: Params,
    cache: contiguous.KVCache,
    tok: jax.Array,  # (B,) the pending token per slot
    cos: jax.Array,
    sin: jax.Array,
    active: jax.Array,  # (B,) bool
    cfg: ModelConfig,
    n_steps: int,
    sampling: dict | None = None,
    with_logprobs: bool = False,
    topk_logprobs: int = 0,
    max_len_hint: int | None = None,
    lora: dict | None = None,
    lora_sel: jax.Array | None = None,
) -> tuple:
    """Single-chip jitted ``n_steps`` decode rounds.

    Serving uses this to amortize host↔device round-trips (the tunnel costs
    ~25 ms per readback): one dispatch + one readback per n tokens.
    ``sampling=None`` compiles the argmax-only program (the benched path);
    passing state arrays compiles the sampled variant once. ``lora`` +
    ``lora_sel`` run per-request adapters (multi-LoRA serving).
    """
    return _decode_multi_core(
        params, cache, tok, cos, sin, active, cfg, n_steps, sampling=sampling,
        with_logprobs=with_logprobs, topk_logprobs=topk_logprobs,
        max_len_hint=max_len_hint, lora=lora, lora_sel=lora_sel,
    )


def _prefill_serving_core(
    params: Params,
    cache: contiguous.KVCache,
    tokens: jax.Array,  # (B, Sq)
    new_lengths: jax.Array,  # (B,)
    active: jax.Array,  # (B,) bool — slots being (re)filled
    reset: jax.Array,  # (B,) bool — slots starting a NEW prompt this call
    cos: jax.Array,
    sin: jax.Array,
    cfg: ModelConfig,
    axis_name: str | None = None,
    lora: dict | None = None,
    lora_sel: jax.Array | None = None,
) -> tuple[jax.Array, contiguous.KVCache]:
    """Masked prefill for admission: ``reset`` slots restart their cache
    window at 0 before filling; ``active`` slots append this call's tokens.
    Whole-prompt admission passes reset == active; CHUNKED prefill
    (serving/engine.py) resets only on a prompt's first chunk — continuation
    chunks must append at the already-filled length. Inactive slots are
    untouched. Returns each active row's last-valid-position logits."""
    cache = dataclasses.replace(
        cache, lengths=jnp.where(reset, 0, cache.lengths)
    )
    return _prefill_core(
        params, cache, tokens, new_lengths, cos, sin, cfg,
        axis_name=axis_name, active=active, lora=lora, lora_sel=lora_sel,
    )


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def prefill_serving(
    params: Params,
    cache: contiguous.KVCache,
    tokens: jax.Array,  # (B, Sq)
    new_lengths: jax.Array,  # (B,)
    active: jax.Array,  # (B,) bool — slots being (re)filled
    reset: jax.Array,  # (B,) bool — slots starting a new prompt
    cos: jax.Array,
    sin: jax.Array,
    cfg: ModelConfig,
    lora: dict | None = None,
    lora_sel: jax.Array | None = None,
) -> tuple[jax.Array, contiguous.KVCache]:
    """Single-chip jitted admission prefill."""
    return _prefill_serving_core(
        params, cache, tokens, new_lengths, active, reset, cos, sin, cfg,
        lora=lora, lora_sel=lora_sel,
    )


# ---------------------------------------------------------------------------
# Speculative decoding (prompt-lookup drafts + multi-token verify)
# ---------------------------------------------------------------------------


def _verify_core(
    params: Params,
    cache: contiguous.KVCache,
    tokens: jax.Array,  # (B, T) int32 — [pending, draft_1 .. draft_{T-1}]
    cos: jax.Array,
    sin: jax.Array,
    cfg: ModelConfig,
    axis_name: str | None = None,
    active: jax.Array | None = None,
    max_len_hint: int | None = None,
) -> tuple[jax.Array, contiguous.KVCache]:
    """Process T consecutive tokens per sequence in one step → logits at
    EVERY position (B, T, V) + cache advanced by T (active rows).

    This is the speculative-decoding verify step: structurally a decode step
    (weights streamed once, KV appended via the windowed-RMW block kernel,
    attention via the multi-query staircase-mask decode kernel
    ops/flash_decode.flash_verify) — NOT a prefill step (whose functional
    per-layer cache update moves ~134 MB/layer). A T-token verify therefore
    costs ≈ one decode step of HBM traffic; T·B stays far below the W8A8
    threshold so projections take the same weight-only path decode does.

    The caller rolls ``cache.lengths`` back to the accepted prefix; rows past
    the rollback are dead (masked by ``lengths``) and are fully overwritten
    by the next step's T-row append, since every step emits >= 1 token.
    """
    b, t = tokens.shape
    x = _embed_tokens(params, tokens, cfg)  # (B, T, H)
    start = cache.lengths
    pos = start[:, None] + jnp.arange(t)[None, :]  # (B, T)
    if active is None:
        n_valid = jnp.full((b,), t, jnp.int32)
    else:
        n_valid = jnp.where(active, t, 0).astype(jnp.int32)
    lengths_now = start + n_valid

    layers = params["layers"]

    def layer_body(carry, layer_in):
        x, k_all, v_all = carry
        lp, lidx = layer_in
        proj = _make_proj(layers, lp, lidx, cfg, axis_name)

        h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        qkv = proj(h, "wqkv", out_dtype=x.dtype).astype(x.dtype)
        if "bqkv" in lp:  # fused QKV bias (Qwen2-style; cfg.attention_bias)
            qkv = qkv + lp["bqkv"]
        q, k_new, v_new = _split_heads_prefill(qkv, cfg)  # (B, H*, T, D)
        q, k_new = _apply_qk_norm(q, k_new, lp, cfg)
        q = apply_rope(q, pos[:, None, :], cos, sin, style=cfg.rope_style)
        k_new = apply_rope(k_new, pos[:, None, :], cos, sin, style=cfg.rope_style)

        if cache.k_scales is not None:
            ks, vs = cache.k_scales[lidx], cache.v_scales[lidx]
            k_q = contiguous._quantize_new(k_new, ks, k_all.dtype)
            v_q = contiguous._quantize_new(v_new, vs, v_all.dtype)
        else:
            ks = vs = None
            k_q, v_q = k_new.astype(k_all.dtype), v_new.astype(v_all.dtype)

        pos_w = jnp.minimum(start, k_all.shape[3] - t)
        k_all, v_all = cache_append.append_block_kv(
            k_all, v_all, k_q, v_q, lidx, pos_w, n_valid
        )

        o = flash_verify(
            q, k_all, v_all, start + 1, layer=lidx,
            sm_scale=cfg.sm_scale(),
            block_k=cfg.block_k, batch_block=cfg.batch_block,
            k_scales=ks, v_scales=vs, window=_layer_window(cfg, lidx),
            sinks=cfg.attention_sinks, max_len_hint=max_len_hint,
            softcap=cfg.attn_softcap,
        )  # (B, Hq, T, D)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, -1)
        attn_out = proj(o, "wo")
        if axis_name is not None:
            attn_out = jax.lax.psum(attn_out, axis_name)
        x = _residual_add(x, attn_out, lp, "post_attn_norm", cfg.rms_norm_eps)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        mlp_out = _mlp_block(h, lp, proj, cfg, axis_name, layers=layers, lidx=lidx)
        if axis_name is not None:
            mlp_out = jax.lax.psum(mlp_out, axis_name)
        x = _residual_add(x, mlp_out, lp, "post_mlp_norm", cfg.rms_norm_eps)
        return (x, k_all, v_all), None

    layer_idx = jnp.arange(cfg.num_layers)
    (x, k_all, v_all), _ = jax.lax.scan(
        layer_body, (x, cache.k, cache.v), (_scan_xs_layers(layers), layer_idx)
    )
    cache = dataclasses.replace(cache, k=k_all, v=v_all, lengths=lengths_now)
    return _logits(x, params, cfg, axis_name=axis_name), cache


def _spec_step(
    params: Params,
    cache: contiguous.KVCache,
    history: jax.Array,  # (B, S_hist) int32 token history
    pending: jax.Array,  # (B,) int32
    cos: jax.Array,
    sin: jax.Array,
    active: jax.Array,  # (B,) bool
    cfg: ModelConfig,
    num_draft: int,
    ngram: int,
    axis_name: str | None = None,
    max_len_hint: int | None = None,
) -> tuple:
    """One speculative round: draft → verify → accept-longest-prefix.

    Emits ``accepted + 1`` tokens per active row (>= 1 — the "bonus" token is
    the model's own greedy choice at the first divergence, so a round is
    never wasted). Greedy outputs are bit-identical to plain decoding: a
    draft token is only kept when it EQUALS the argmax the plain loop would
    have produced, and the verify attention evaluates the exact same masked
    softmax a sequence of single-token steps would.
    """
    t = num_draft + 1
    start = cache.lengths
    history0 = history
    history = drafting.write_token(history, start, pending)
    draft = drafting.propose_drafts(
        history, start, pending, num_draft=num_draft, ngram=ngram
    )  # (B, k)
    tokens = jnp.concatenate([pending[:, None], draft], axis=1)  # (B, T)

    logits, cache = _verify_core(
        params, cache, tokens, cos, sin, cfg, axis_name=axis_name,
        active=active, max_len_hint=max_len_hint,
    )
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
    match = (preds[:, :-1] == draft).astype(jnp.int32)
    acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # (B,) longest prefix
    acc = jnp.where(active, acc, 0)
    bonus = jnp.take_along_axis(preds, acc[:, None], axis=1)[:, 0]
    n_emit = jnp.where(active, acc + 1, 0).astype(jnp.int32)

    # Roll back to the accepted prefix (+ the bonus token's own row, which
    # was computed from fully-verified context).
    cache = dataclasses.replace(cache, lengths=start + n_emit)

    hist_new = drafting.write_block(history, start + 1, draft)
    hist_new = drafting.write_token(hist_new, start + acc + 1, bonus)
    history = jnp.where(active[:, None], hist_new, history0)

    cols = jnp.arange(t, dtype=jnp.int32)[None, :]
    draft_pad = jnp.concatenate(
        [draft, jnp.zeros((draft.shape[0], 1), jnp.int32)], axis=1
    )
    out = jnp.where(
        cols < acc[:, None],
        draft_pad,
        jnp.where(cols == acc[:, None], bonus[:, None], 0),
    )  # (B, T); row b's first n_emit[b] entries are this round's tokens
    pending = jnp.where(active, bonus, pending)
    return cache, history, pending, out, n_emit


def _spec_decode_multi_core(
    params: Params,
    cache: contiguous.KVCache,
    history: jax.Array,
    tok: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    active: jax.Array,
    cfg: ModelConfig,
    n_steps: int,
    num_draft: int,
    ngram: int,
    axis_name: str | None = None,
    max_len_hint: int | None = None,
) -> tuple:
    def step(carry, _):
        cache, history, pending = carry
        cache, history, pending, out, n_emit = _spec_step(
            params, cache, history, pending, cos, sin, active, cfg,
            num_draft, ngram, axis_name=axis_name, max_len_hint=max_len_hint,
        )
        return (cache, history, pending), (out, n_emit)

    (cache, history, tok), (outs, counts) = jax.lax.scan(
        step, (cache, history, tok), None, length=n_steps
    )
    # (n, B, T) → (B, n, T); (n, B) → (B, n)
    return outs.transpose(1, 0, 2), counts.T, tok, cache, history


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "num_draft", "ngram", "max_len_hint"),
    donate_argnums=(1, 2),
)
def spec_decode_multi(
    params: Params,
    cache: contiguous.KVCache,
    history: jax.Array,  # (B, S_hist) int32 — prompt+generated token ids
    tok: jax.Array,  # (B,) pending token per slot
    cos: jax.Array,
    sin: jax.Array,
    active: jax.Array,  # (B,) bool
    cfg: ModelConfig,
    n_steps: int,
    num_draft: int = 4,
    # max key length; the matcher BACKS OFF to shorter keys (core/drafting),
    # so 4 strictly dominates the old fixed-2 default — matches Engine's
    ngram: int = 4,
    max_len_hint: int | None = None,
) -> tuple:
    """``n_steps`` speculative rounds in ONE program → (tokens (B, n, k+1),
    counts (B, n), next pending, cache, history).

    ``max_len_hint`` (static): caller-guaranteed bound on every row's cache
    length at round END (lengths + n_steps·(k+1)) — shrinks each verify
    step's KV-block grid exactly like the plain decode path's hint
    (ops/flash_decode._flash_decode_fused); the engine derives it from
    host-known slot lengths per round.

    Row b of round i emitted ``counts[b, i]`` tokens: ``tokens[b, i,
    :counts[b, i]]`` (1 to k+1 of them — up to k accepted prompt-lookup
    drafts plus the model's own next token). Greedy-only by construction;
    outputs are bit-identical to :func:`decode_multi`'s argmax stream while
    emitting up to (k+1)x more tokens per weight/KV pass. The reference
    decodes strictly one token per launch (flash_attn.cu:554-586).
    """
    return _spec_decode_multi_core(
        params, cache, history, tok, cos, sin, active, cfg,
        n_steps, num_draft, ngram, max_len_hint=max_len_hint,
    )


def _spec_step_draft_model(
    params: Params,
    cache: contiguous.KVCache,
    dparams: Params,
    dcache: contiguous.KVCache,
    pending: jax.Array,  # (B,) int32
    cos: jax.Array,
    sin: jax.Array,
    dcos: jax.Array,
    dsin: jax.Array,
    active: jax.Array,  # (B,) bool
    cfg: ModelConfig,
    dcfg: ModelConfig,
    num_draft: int,
    axis_name: str | None = None,
    draft_axis_name: str | None = None,
    max_len_hint: int | None = None,
) -> tuple:
    """One DRAFT-MODEL speculative round: k+1 small-model decode steps
    propose d_1..d_k, the target verifies [pending, d_1..d_k] in ONE
    multi-query step, accept-longest-prefix (same acceptance rule as the
    prompt-lookup rounds, so greedy output is bit-identical to plain
    decoding regardless of draft quality).

    The draft runs k+1 steps feeding [pending, d_1..d_k]: step j's argmax is
    d_j and its cache append writes the FED token's KV row, so after the
    round the draft cache holds rows for every possibly-accepted position
    (including d_k when all k drafts land); both caches then roll back to
    ``start + n_emit`` together and the dead rows are fully overwritten by
    the next round's contiguous appends (see _verify_core's rollback
    argument). The step-k+1 logits are discarded.

    Cost model: the draft pass streams (k+1)·draft_weights — worth it when
    draft_weights << target_weights/k and the draft's acceptance rate beats
    prompt lookup on free-running text (benchmarks/spec_bench.py measures
    both). The reference decodes strictly one token per launch
    (flash_attn.cu:554-586); both speculative modes are new capability.
    """
    k = num_draft
    start = cache.lengths

    def dstep(carry, _):
        tok, dc = carry
        lg, dc = _decode_core(
            dparams, dc, tok, dcos, dsin, dcfg,
            axis_name=draft_axis_name, active=active,
            max_len_hint=max_len_hint,
        )
        nxt = jnp.argmax(lg, -1).astype(jnp.int32)
        return (nxt, dc), nxt

    (_, dcache), drafts = jax.lax.scan(
        dstep, (pending, dcache), None, length=k + 1
    )
    draft = drafts[:k].T.astype(jnp.int32)  # (B, k); step k+1 only appends KV

    tokens = jnp.concatenate([pending[:, None], draft], axis=1)  # (B, k+1)
    logits, cache = _verify_core(
        params, cache, tokens, cos, sin, cfg, axis_name=axis_name,
        active=active, max_len_hint=max_len_hint,
    )
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k+1)
    match = (preds[:, :-1] == draft).astype(jnp.int32)
    acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # longest accepted prefix
    acc = jnp.where(active, acc, 0)
    bonus = jnp.take_along_axis(preds, acc[:, None], axis=1)[:, 0]
    n_emit = jnp.where(active, acc + 1, 0).astype(jnp.int32)

    cache = dataclasses.replace(cache, lengths=start + n_emit)
    # Draft cache rolls back in lockstep (inactive rows never advanced, so
    # start + 0 is already their length).
    dcache = dataclasses.replace(dcache, lengths=start + n_emit)

    t = k + 1
    cols = jnp.arange(t, dtype=jnp.int32)[None, :]
    draft_pad = jnp.concatenate(
        [draft, jnp.zeros((draft.shape[0], 1), jnp.int32)], axis=1
    )
    out = jnp.where(
        cols < acc[:, None],
        draft_pad,
        jnp.where(cols == acc[:, None], bonus[:, None], 0),
    )  # (B, T): row b's first n_emit[b] entries are this round's tokens
    pending = jnp.where(active, bonus, pending)
    return cache, dcache, pending, out, n_emit


def _spec_decode_multi_draft_core(
    params: Params,
    cache: contiguous.KVCache,
    dparams: Params,
    dcache: contiguous.KVCache,
    tok: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    dcos: jax.Array,
    dsin: jax.Array,
    active: jax.Array,
    cfg: ModelConfig,
    dcfg: ModelConfig,
    n_steps: int,
    num_draft: int,
    axis_name: str | None = None,
    draft_axis_name: str | None = None,
    max_len_hint: int | None = None,
) -> tuple:
    def step(carry, _):
        cache, dcache, pending = carry
        cache, dcache, pending, out, n_emit = _spec_step_draft_model(
            params, cache, dparams, dcache, pending, cos, sin, dcos, dsin,
            active, cfg, dcfg, num_draft, axis_name=axis_name,
            draft_axis_name=draft_axis_name, max_len_hint=max_len_hint,
        )
        return (cache, dcache, pending), (out, n_emit)

    (cache, dcache, tok), (outs, counts) = jax.lax.scan(
        step, (cache, dcache, tok), None, length=n_steps
    )
    return outs.transpose(1, 0, 2), counts.T, tok, cache, dcache


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dcfg", "n_steps", "num_draft", "max_len_hint"),
    donate_argnums=(1, 3),
)
def spec_decode_multi_draft(
    params: Params,
    cache: contiguous.KVCache,
    dparams: Params,
    dcache: contiguous.KVCache,
    tok: jax.Array,  # (B,) pending token per slot
    cos: jax.Array,
    sin: jax.Array,
    dcos: jax.Array,
    dsin: jax.Array,
    active: jax.Array,  # (B,) bool
    cfg: ModelConfig,
    dcfg: ModelConfig,
    n_steps: int,
    num_draft: int = 4,
    max_len_hint: int | None = None,
) -> tuple:
    """``n_steps`` draft-model speculative rounds in ONE program →
    (tokens (B, n, k+1), counts (B, n), next pending, cache, draft cache).

    The draft-model twin of :func:`spec_decode_multi` (prompt lookup): a
    small model's greedy continuations replace n-gram history matches as the
    draft source — higher acceptance on free-running text, at the cost of
    streaming the draft weights (k+1)× per round. Greedy outputs remain
    bit-identical to plain decoding: acceptance is exact-argmax-match
    against the target's own verify logits.
    """
    return _spec_decode_multi_draft_core(
        params, cache, dparams, dcache, tok, cos, sin, dcos, dsin, active,
        cfg, dcfg, n_steps, num_draft, max_len_hint=max_len_hint,
    )


# ---------------------------------------------------------------------------
# Paged-cache serving path (BASELINE config 3: GQA flash-decode, paged KV)
# ---------------------------------------------------------------------------


def _decode_core_paged(
    params: Params,
    cache: paged.PagedKVCache,
    tokens: jax.Array,  # (B,) int32
    cos: jax.Array,
    sin: jax.Array,
    cfg: ModelConfig,
    axis_name: str | None = None,
    active: jax.Array | None = None,
    max_len_hint: int | None = None,
    lora: dict | None = None,
    lora_sel: jax.Array | None = None,
) -> tuple[jax.Array, paged.PagedKVCache]:
    """One decode step against the PAGED pool — same program structure as
    :func:`_decode_core` but the KV stream rides the page table: appends go
    through the windowed-RMW paged kernel (ops/cache_append.append_rows_paged_kv)
    and attention through the double-buffered page-DMA kernel
    (ops/paged_decode.paged_flash_decode).

    The caller (serving engine / page allocator) guarantees every position in
    [0, lengths[b]] maps to an allocated physical page; unmapped entries point
    at the reserved null page 0, so inactive slots' writes land harmlessly
    there. With ``cfg.sliding_window`` the page walk is band-shifted (only
    in-window pages are DMA'd) and the serving engine reclaims pages below
    the band — rolling-buffer KV, pool usage O(window) per sequence."""
    x = _embed_tokens(params, tokens, cfg)
    pos = cache.lengths
    if active is None:
        lengths_now = cache.lengths + 1
        att_lengths = lengths_now
    else:
        lengths_now = cache.lengths + active.astype(jnp.int32)
        # see _decode_core: stale inactive-slot lengths must not drive fetch
        att_lengths = jnp.where(active, lengths_now, 0)

    layers = params["layers"]
    page_tbl = cache.page_table
    s_logical = cache.pages_per_seq * cache.page_size

    from starflashattention_tpu.models.lora import delta_multi

    def layer_body(carry, layer_in):
        x, k_pages, v_pages = carry
        if lora is None:
            lp, lidx = layer_in
            ll = None
        else:
            lp, lidx, ll = layer_in
        proj = _make_proj(layers, lp, lidx, cfg, axis_name)

        h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        if cfg.mla:
            # DeepSeek MLA: one shared latent row per token, absorbed
            # queries — identical to the contiguous _decode_layer branch;
            # the paged pool just stores the padded latent rows as its
            # (1-head) K/V pages.
            q, k_new, v_new = _mla_qkv(h, lp, cfg, cos, sin, pos)
        else:
            qkv = proj(h, "wqkv", out_dtype=x.dtype).astype(x.dtype)
            if ll is not None:
                qkv = qkv + delta_multi(h, ll, "wqkv", lora_sel)
            if "bqkv" in lp:  # fused QKV bias (Qwen2-style; cfg.attention_bias)
                qkv = qkv + lp["bqkv"]
            q, k_new, v_new = _split_heads_decode(qkv, cfg)
            q, k_new = _apply_qk_norm(q, k_new, lp, cfg)
            q = apply_rope(q, pos, cos, sin, style=cfg.rope_style)
            k_new = apply_rope(k_new, pos, cos, sin, style=cfg.rope_style)

        if cache.k_scales is not None:
            ks, vs = cache.k_scales[lidx], cache.v_scales[lidx]
            k_q = paged._quantize_new(k_new, ks, k_pages.dtype)
            v_q = paged._quantize_new(v_new, vs, v_pages.dtype)
        else:
            ks = vs = None
            k_q, v_q = k_new.astype(k_pages.dtype), v_new.astype(v_pages.dtype)

        pos_w = jnp.minimum(pos, s_logical - 1)
        k_pages, v_pages = cache_append.append_rows_paged_kv(
            k_pages, v_pages, k_q, v_q, lidx, page_tbl, pos_w
        )

        o = paged_flash_decode(
            q, k_pages, v_pages, page_tbl, att_lengths, layer=lidx,
            sm_scale=cfg.sm_scale(),
            pages_per_compute_block=cfg.pages_per_compute_block,
            k_scales=ks, v_scales=vs, max_len_hint=max_len_hint,
            window=_layer_window(cfg, lidx), sinks=cfg.attention_sinks,
            softcap=cfg.attn_softcap,
        )  # (B, Hq, D)
        o = _mla_out(o, lp, cfg) if cfg.mla else o.reshape(o.shape[0], -1)
        attn_out = proj(o, "wo")
        if ll is not None:
            attn_out = attn_out + delta_multi(o, ll, "wo", lora_sel)
        if axis_name is not None:
            attn_out = jax.lax.psum(attn_out, axis_name)
        x = _residual_add(x, attn_out, lp, "post_attn_norm", cfg.rms_norm_eps)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        mlp_out = _mlp_block(h, lp, proj, cfg, axis_name, layers=layers,
                             lidx=lidx, lora_l=ll, lora_sel=lora_sel)
        if axis_name is not None:
            mlp_out = jax.lax.psum(mlp_out, axis_name)
        x = _residual_add(x, mlp_out, lp, "post_mlp_norm", cfg.rms_norm_eps)
        return (x, k_pages, v_pages), None

    layer_idx = jnp.arange(cfg.num_layers)
    xs = (_scan_xs_layers(layers), layer_idx)
    if lora is not None:
        xs = xs + (lora["layers"],)
    (x, k_pages, v_pages), _ = jax.lax.scan(
        layer_body, (x, cache.k_pages, cache.v_pages), xs
    )
    cache = dataclasses.replace(
        cache, k_pages=k_pages, v_pages=v_pages, lengths=lengths_now
    )
    return _logits(x, params, cfg, axis_name=axis_name), cache


def _prefill_core_paged(
    params: Params,
    cache: paged.PagedKVCache,
    tokens: jax.Array,  # (B, Sq) int32, right-padded
    new_lengths: jax.Array,  # (B,)
    cos: jax.Array,
    sin: jax.Array,
    cfg: ModelConfig,
    axis_name: str | None = None,
    active: jax.Array | None = None,
    prefix_len: int = 0,
    lora: dict | None = None,
    lora_sel: jax.Array | None = None,
) -> tuple[jax.Array, paged.PagedKVCache]:
    """Prompt ingestion into the paged pool.

    ``prefix_len == 0`` (whole-prompt admission into fresh slots): the chunk
    being prefilled IS the whole sequence, so attention runs directly on the
    in-register chunk K/V (never touching the pool). ``prefix_len > 0``
    (continuation — chunked prefill AND prefix-cache admission): each active
    row has UP TO ``prefix_len`` tokens already in the pool (its own
    ``cache.lengths`` row says how many; rows may differ — prefix-cache hits
    land mid-batch with per-row matched lengths). The chunk is scattered
    FIRST, then the leading ``prefix_len + Sq`` pooled tokens are gathered
    back contiguous (paged.gather_prefix — static size), so KV buffer index
    == absolute position for every row and the causal mask needs only the
    per-row ``q_offsets``/``lengths`` it already has. Bit-identical to the
    old [gather(prefix) | in-register chunk] concat in the lockstep case
    (the gather reads back exactly the bytes the scatter wrote). Inactive
    rows scatter nothing and their logits row is unused."""
    b, sq = tokens.shape
    x = _embed_tokens(params, tokens, cfg)
    start = cache.lengths  # 0 for rows being admitted
    pos = start[:, None] + jnp.arange(sq)[None, :]
    if active is not None:
        new_lengths = jnp.where(active, new_lengths, 0)
    kv_lengths = start + new_lengths

    layers = params["layers"]
    page_tbl = cache.page_table

    from starflashattention_tpu.models.lora import delta_multi

    def layer_body(carry, layer_in):
        x, k_pages, v_pages = carry
        if lora is None:
            lp, lidx = layer_in
            ll = None
        else:
            lp, lidx, ll = layer_in
        proj = _make_proj(layers, lp, lidx, cfg, axis_name)

        h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        if cfg.mla:
            q, k_new, v_new = _mla_qkv(h, lp, cfg, cos, sin, pos)
            # helper emits (B, Sq, H*, D); kernels take heads-first
            q = q.transpose(0, 2, 1, 3)
            k_new = k_new.transpose(0, 2, 1, 3)
            v_new = v_new.transpose(0, 2, 1, 3)
        else:
            qkv = proj(h, "wqkv", out_dtype=x.dtype).astype(x.dtype)
            if ll is not None:
                qkv = qkv + delta_multi(h, ll, "wqkv", lora_sel)
            if "bqkv" in lp:  # fused QKV bias (Qwen2-style)
                qkv = qkv + lp["bqkv"]
            q, k_new, v_new = _split_heads_prefill(qkv, cfg)  # (B, H*, Sq, D)
            q, k_new = _apply_qk_norm(q, k_new, lp, cfg)
            q = apply_rope(q, pos[:, None, :], cos, sin, style=cfg.rope_style)
            k_new = apply_rope(
                k_new, pos[:, None, :], cos, sin, style=cfg.rope_style)

        if cache.k_scales is not None:
            ks, vs = cache.k_scales[lidx], cache.v_scales[lidx]
            k_q = paged._quantize_new(k_new, ks, k_pages.dtype)
            v_q = paged._quantize_new(v_new, vs, v_pages.dtype)
            # Attend against the quantize→dequantize round-trip so prefill
            # numerics match what decode will read back from the pool.
            k_att = (k_q.astype(jnp.float32) * ks[None, :, None, None]).astype(q.dtype)
            v_att = (v_q.astype(jnp.float32) * vs[None, :, None, None]).astype(q.dtype)
        else:
            k_q, v_q = k_new.astype(k_pages.dtype), v_new.astype(v_pages.dtype)
            k_att, v_att = k_q, v_q

        k_pages = paged.scatter_prefill_chunk(
            k_pages, lidx, k_q, page_tbl, start, new_lengths
        )
        v_pages = paged.scatter_prefill_chunk(
            v_pages, lidx, v_q, page_tbl, start, new_lengths
        )

        if prefix_len > 0:
            # Scatter landed above; read [0 .. prefix_len + Sq) back so the
            # attention buffer is position-aligned for EVERY row (per-row
            # starts — see docstring). Clamped to the table's capacity; the
            # clamp never cuts a live row (start + new <= capacity).
            span = min(prefix_len + sq, page_tbl.shape[1] * k_pages.shape[3])
            k_att = paged.gather_prefix(k_pages, lidx, page_tbl, span)
            v_att = paged.gather_prefix(v_pages, lidx, page_tbl, span)
            if cache.k_scales is not None:
                k_att = (k_att.astype(jnp.float32) * ks[None, :, None, None]).astype(q.dtype)
                v_att = (v_att.astype(jnp.float32) * vs[None, :, None, None]).astype(q.dtype)
            else:
                k_att = k_att.astype(q.dtype)
                v_att = v_att.astype(q.dtype)

        o = flash_prefill(
            q, k_att, v_att, lengths=kv_lengths, causal=True, q_offsets=start,
            sm_scale=cfg.sm_scale(),
            window=_layer_window(cfg, lidx), sinks=cfg.attention_sinks,
            softcap=cfg.attn_softcap,
        )
        o = o.transpose(0, 2, 1, 3)
        o = _mla_out(o, lp, cfg) if cfg.mla else o.reshape(b, sq, -1)
        attn_out = proj(o, "wo")
        if ll is not None:
            attn_out = attn_out + delta_multi(o, ll, "wo", lora_sel)
        if axis_name is not None:
            attn_out = jax.lax.psum(attn_out, axis_name)
        x = _residual_add(x, attn_out, lp, "post_attn_norm", cfg.rms_norm_eps)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        mlp_out = _mlp_block(h, lp, proj, cfg, axis_name, layers=layers,
                             lidx=lidx, lora_l=ll, lora_sel=lora_sel)
        if axis_name is not None:
            mlp_out = jax.lax.psum(mlp_out, axis_name)
        x = _residual_add(x, mlp_out, lp, "post_mlp_norm", cfg.rms_norm_eps)
        return (x, k_pages, v_pages), None

    layer_idx = jnp.arange(cfg.num_layers)
    xs = (_scan_xs_layers(layers), layer_idx)
    if lora is not None:
        xs = xs + (lora["layers"],)
    (x, k_pages, v_pages), _ = jax.lax.scan(
        layer_body, (x, cache.k_pages, cache.v_pages), xs
    )
    cache = dataclasses.replace(
        cache, k_pages=k_pages, v_pages=v_pages, lengths=kv_lengths
    )
    last = jnp.maximum(new_lengths - 1, 0)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    return _logits(x_last, params, cfg, axis_name=axis_name), cache


def _decode_multi_core_paged(
    params: Params,
    cache: paged.PagedKVCache,
    tok: jax.Array,  # (B,)
    cos: jax.Array,
    sin: jax.Array,
    active: jax.Array,  # (B,) bool
    cfg: ModelConfig,
    n_steps: int,
    axis_name: str | None = None,
    sampling: dict | None = None,
    with_logprobs: bool = False,
    topk_logprobs: int = 0,
    max_len_hint: int | None = None,
    lora: dict | None = None,
    lora_sel: jax.Array | None = None,
) -> tuple:
    """n decode steps against the paged pool in ONE program (argmax, or
    per-slot sampling when ``sampling`` state arrays are passed; optional
    chosen-token logprobs — see :func:`_decode_multi_core`)."""

    def step(carry, _):
        tok, cache = carry
        logits, cache = _decode_core_paged(
            params, cache, tok, cos, sin, cfg, axis_name=axis_name,
            active=active, max_len_hint=max_len_hint,
            lora=lora, lora_sel=lora_sel,
        )
        if sampling is None:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            nxt = core_sampling.sample_tokens(logits, sampling, cache.lengths)
        out = (nxt,)
        if with_logprobs:
            out = out + (token_logprob(logits, nxt),)
        if topk_logprobs:
            out = out + topk_token_logprobs(logits, topk_logprobs)
        return (nxt, cache), out

    (tok, cache), outs = jax.lax.scan(step, (tok, cache), None, length=n_steps)
    res = (outs[0].T, tok, cache)
    i = 1
    if with_logprobs:
        res = res + (outs[i].T,)
        i += 1
    if topk_logprobs:
        res = res + (outs[i].transpose(1, 0, 2), outs[i + 1].transpose(1, 0, 2))
    return res


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "with_logprobs", "topk_logprobs",
                     "max_len_hint"),
    donate_argnums=(1,),
)
def decode_multi_paged(
    params: Params,
    cache: paged.PagedKVCache,
    tok: jax.Array,  # (B,)
    cos: jax.Array,
    sin: jax.Array,
    active: jax.Array,  # (B,) bool
    cfg: ModelConfig,
    n_steps: int,
    sampling: dict | None = None,
    with_logprobs: bool = False,
    topk_logprobs: int = 0,
    max_len_hint: int | None = None,
    lora: dict | None = None,
    lora_sel: jax.Array | None = None,
) -> tuple:
    """Paged analog of :func:`decode_multi`: n steps, one program."""
    return _decode_multi_core_paged(
        params, cache, tok, cos, sin, active, cfg, n_steps, sampling=sampling,
        with_logprobs=with_logprobs, topk_logprobs=topk_logprobs,
        max_len_hint=max_len_hint, lora=lora, lora_sel=lora_sel,
    )


def _prefill_serving_core_paged(
    params: Params,
    cache: paged.PagedKVCache,
    tokens: jax.Array,  # (B, Sq)
    new_lengths: jax.Array,  # (B,)
    active: jax.Array,  # (B,) bool
    reset: jax.Array,  # (B,) bool — new-prompt slots (see _prefill_serving_core)
    cos: jax.Array,
    sin: jax.Array,
    cfg: ModelConfig,
    axis_name: str | None = None,
    prefix_len: int = 0,
    lora: dict | None = None,
    lora_sel: jax.Array | None = None,
) -> tuple[jax.Array, paged.PagedKVCache]:
    cache = dataclasses.replace(
        cache, lengths=jnp.where(reset, 0, cache.lengths)
    )
    return _prefill_core_paged(
        params, cache, tokens, new_lengths, cos, sin, cfg,
        axis_name=axis_name, active=active, prefix_len=prefix_len,
        lora=lora, lora_sel=lora_sel,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "prefix_len"), donate_argnums=(1,)
)
def prefill_serving_paged(
    params: Params,
    cache: paged.PagedKVCache,
    tokens: jax.Array,  # (B, Sq)
    new_lengths: jax.Array,  # (B,)
    active: jax.Array,  # (B,) bool
    reset: jax.Array,  # (B,) bool — slots starting a new prompt
    cos: jax.Array,
    sin: jax.Array,
    cfg: ModelConfig,
    prefix_len: int = 0,
    lora: dict | None = None,
    lora_sel: jax.Array | None = None,
) -> tuple[jax.Array, paged.PagedKVCache]:
    """Paged analog of :func:`prefill_serving`; ``prefix_len`` > 0 is the
    chunked-prefill continuation path (see _prefill_core_paged)."""
    return _prefill_serving_core_paged(
        params, cache, tokens, new_lengths, active, reset, cos, sin, cfg,
        prefix_len=prefix_len, lora=lora, lora_sel=lora_sel,
    )


# ---------------------------------------------------------------------------
# Generation helpers
# ---------------------------------------------------------------------------


def sample(logits: jax.Array, key: jax.Array | None = None, temperature: float = 0.0) -> jax.Array:
    """Greedy (temperature 0) or categorical sampling → (B,) int32."""
    if temperature <= 0.0 or key is None:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(key, logits / temperature, axis=-1).astype(jnp.int32)


def generate(
    params: Params,
    cfg: ModelConfig,
    prompts: jax.Array,  # (B, Sp) int32, right-padded
    prompt_lengths: jax.Array,  # (B,)
    max_new_tokens: int,
    *,
    cache: contiguous.KVCache | None = None,
    temperature: float = 0.0,
    key: jax.Array | None = None,
) -> jax.Array:
    """Prefill + autoregressive decode loop → (B, max_new_tokens) token ids."""
    b = prompts.shape[0]
    if cache is None:
        hkv, d = cfg.kv_cache_dims()  # MLA: one padded latent row per token
        cache = contiguous.init_cache(
            cfg.num_layers, b, hkv, cfg.max_seq_len, d,
            dtype=jnp.dtype(cfg.dtype), quant_mode=cfg.quant_mode,
            calibration_scale=cfg.kv_calibration_scale,
        )
    cos, sin = rope_tables(cfg)
    logits, cache = prefill(params, cache, prompts, prompt_lengths, cos, sin, cfg)
    out = []
    tok = sample(logits, key, temperature)
    for i in range(max_new_tokens):
        out.append(tok)
        if i == max_new_tokens - 1:
            break
        if key is not None:
            key = jax.random.fold_in(key, i)
        logits, cache = decode_step(params, cache, tok, cos, sin, cfg)
        tok = sample(logits, key, temperature)
    return jnp.stack(out, axis=1)
