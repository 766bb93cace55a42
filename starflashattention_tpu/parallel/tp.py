"""Tensor + data parallel model steps via shard_map.

Megatron-style TP re-expressed for JAX/TPU: the whole decode/prefill step runs
under ``shard_map`` over a ``(data, model)`` mesh so the Pallas kernels see
per-shard shapes directly. Column-parallel projections (wqkv, w_gate_up) shard
their output dim; row-parallel ones (wo, w_down) shard their input dim and
psum their partial outputs over ``"model"`` (2 all-reduces/layer on ICI —
models/llama.py:_decode_core applies them when ``axis_name`` is set).

Fused-projection sharding: the single-chip layouts are flat
(``[q|k|v]`` and ``[gate|up]`` column blocks — anything else measurably
re-copies weights every scan step), and a CONTIGUOUS shard of those columns
would mix unrelated pieces. So :func:`permute_params_for_tp` permutes the
fused columns ONCE at shard time into per-shard-contiguous order
(``[q_t|k_t|v_t]`` / ``[gate_t|up_t]`` for shard t); each chip then sees a
well-formed local flat layout and the per-shard model code is IDENTICAL to
the single-chip code at 1/T width.

GQA co-location: q head i uses kv head i // G, so contiguous head ranges per
shard co-locate each KV head with its G query heads — attention needs NO
communication (BASELINE.json: "heads and KV-cache pages tensor-sharded over
ICI").
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from starflashattention_tpu.cache.contiguous import KVCache
from starflashattention_tpu.core import quant
from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig

DATA, MODEL = "data", "model"


def _wqkv_perm(cfg: ModelConfig, tp: int) -> np.ndarray:
    """Column permutation: flat [q|k|v] → [q_0|k_0|v_0 | q_1|k_1|v_1 | …]."""
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    q_off, k_off, v_off = 0, hq * d, (hq + hkv) * d
    parts = []
    for t in range(tp):
        parts.append(np.arange(t * (hq // tp) * d, (t + 1) * (hq // tp) * d) + q_off)
        parts.append(np.arange(t * (hkv // tp) * d, (t + 1) * (hkv // tp) * d) + k_off)
        parts.append(np.arange(t * (hkv // tp) * d, (t + 1) * (hkv // tp) * d) + v_off)
    return np.concatenate(parts)


def _gate_up_perm(cfg: ModelConfig, tp: int) -> np.ndarray:
    """Column permutation: flat [gate|up] → [gate_0|up_0 | gate_1|up_1 | …]."""
    inter = cfg.intermediate_size
    parts = []
    for t in range(tp):
        parts.append(np.arange(t * (inter // tp), (t + 1) * (inter // tp)))
        parts.append(np.arange(t * (inter // tp), (t + 1) * (inter // tp)) + inter)
    return np.concatenate(parts)


def _permute_cols(w, perm: jnp.ndarray):
    """Permute the fused-column (last) axis of a dense weight OR a quantized
    ``{"w", "scale"}`` pair — per-output-channel quantization commutes with a
    column permutation, so w and scale permute identically."""
    if isinstance(w, dict):
        return {
            "w": jnp.take(w["w"], perm, axis=-1),
            "scale": jnp.take(w["scale"], perm, axis=-1),
        }
    return jnp.take(w, perm, axis=-1)


def permute_params_for_tp(params: dict, cfg: ModelConfig, tp: int) -> dict:
    """One-time fused-column permutation so contiguous model-axis shards are
    self-consistent local layouts (see module docstring). Idempotent only on
    fresh single-chip params — apply exactly once, inside shard_params."""
    if tp == 1:
        return params
    layers = dict(params["layers"])
    layers["wqkv"] = _permute_cols(layers["wqkv"], jnp.asarray(_wqkv_perm(cfg, tp)))
    if "bqkv" in layers:  # fused QKV bias permutes with the wqkv columns
        layers["bqkv"] = jnp.take(
            layers["bqkv"], jnp.asarray(_wqkv_perm(cfg, tp)), axis=-1
        )
    if "w_gate_up" in layers:
        layers["w_gate_up"] = _permute_cols(
            layers["w_gate_up"], jnp.asarray(_gate_up_perm(cfg, tp))
        )
    # MoE expert stacks need no permutation: the expert axis shards whole
    # experts (expert parallelism), nothing is column-interleaved.
    out = dict(params)
    out["layers"] = layers
    return out


# ---------------------------------------------------------------------------
# Multi-LoRA under TP: stacked adapters shard with the projections they
# modify. Column-parallel targets (wqkv, w_gate_up) keep `a` replicated and
# shard `b`'s OUT axis — with the same fused-column permutation the base
# weight got, so each shard's delta lands on exactly its local columns.
# Row-parallel targets (wo, w_down) shard `a`'s IN axis (the shard's local
# activation rows; the existing post-projection psum completes the delta
# sum — it is added before the psum in the layer body) and keep `b`
# replicated. Rows need no permutation: permuted fused columns put shard
# t's heads/intermediate contiguously, matching the plain row sharding.
# ---------------------------------------------------------------------------

_LORA_COL = {"a": P(), "b": P(None, None, None, MODEL)}
_LORA_ROW = {"a": P(None, None, MODEL, None), "b": P()}
_LORA_KIND = {
    "wqkv": _LORA_COL,
    "w_gate_up": _LORA_COL,
    "wo": _LORA_ROW,
    "w_down": _LORA_ROW,
}


def lora_specs(stack: dict) -> dict:
    """PartitionSpec tree matching a stacked multi-LoRA tree
    (models/lora.stack_adapters)."""
    return {"layers": {n: _LORA_KIND[n] for n in stack["layers"]}}


def shard_lora(stack: dict, mesh: Mesh, cfg: ModelConfig) -> dict:
    """Permute + shard a stacked adapter tree for the mesh (see block
    comment above). Idempotent only on a fresh stack — apply once."""
    tp_size = mesh.shape[MODEL]
    layers = {}
    for name, ab in stack["layers"].items():
        a, b = ab["a"], ab["b"]
        if tp_size > 1 and name == "wqkv":
            b = jnp.take(b, jnp.asarray(_wqkv_perm(cfg, tp_size)), axis=-1)
        elif tp_size > 1 and name == "w_gate_up":
            b = jnp.take(b, jnp.asarray(_gate_up_perm(cfg, tp_size)), axis=-1)
        layers[name] = {"a": a, "b": b}
    out = {"layers": layers}
    specs = lora_specs(out)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), out, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


# Quantized {"w", "scale"} spec pairs. Column-parallel weights shard the
# output dim of BOTH the (L, H, O) payload and its (L, O) per-output-channel
# scale; row-parallel weights shard the contraction dim of the payload only —
# the scale applies per (unsharded) output channel and is linear, so it
# commutes with the post-matmul psum.
_COL_QSPEC = {"w": P(None, None, MODEL), "scale": P(None, MODEL)}
_ROW_QSPEC = {"w": P(None, MODEL, None), "scale": P()}
# int4 scales are (L, G, O) — grouped along the CONTRACTION axis. Column-
# parallel still shards O (now axis -1 of a rank-3 scale); row-parallel
# shards the group axis alongside the packed rows (each shard owns its
# groups' scales — pairing and grouping are intra-shard by construction,
# enforced in shard_params).
_COL_QSPEC_I4 = {"w": P(None, None, MODEL), "scale": P(None, None, MODEL)}
_ROW_QSPEC_I4 = {"w": P(None, MODEL, None), "scale": P(None, MODEL, None)}


def param_specs(
    cfg: ModelConfig, *, weight_quant: "str | bool" = False,
    lm_head_quant: "str | bool" = False
) -> dict:
    """PartitionSpec pytree matching llama.init_params' structure.

    ``weight_quant=True`` matches the structure after
    ``llama.quantize_model_weights`` (the 4 projections are {"w","scale"}
    dicts — BASELINE north-star config: INT8 weights tensor-sharded);
    ``lm_head_quant=True`` matches its ``lm_head=True`` option (the head's
    vocab columns and per-column scales shard together over the model
    axis)."""
    specs = {
        "embed": P(),  # replicated (gather per token is tiny)
        "layers": {
            "attn_norm": P(),
            "wqkv": P(None, None, MODEL),  # permuted per-shard [q_t|k_t|v_t]
            "wo": P(None, MODEL, None),  # row-parallel: head dim sharded
            "mlp_norm": P(),
            "w_gate_up": P(None, None, MODEL),  # permuted per-shard [gate_t|up_t]
            "w_down": P(None, MODEL, None),  # row-parallel
        },
        "final_norm": P(),
        # vocab-sharded: each chip holds (H, V/T) and computes its logit
        # slice; llama._logits all-gathers the slices (bit-identical to the
        # replicated matmul, 1/T the lm_head HBM read — at 7B the replicated
        # head was the TP step's largest remaining stream, 262 MB/step)
        "lm_head": P(None, MODEL),
    }
    if cfg.num_experts:
        # Expert parallelism: whole experts shard over the model axis (the
        # MoE analog of row-parallel — each chip computes its local experts'
        # contribution for all rows, the in-core psum completes the routed
        # sum). Router replicated + fp32 so all shards route identically.
        del specs["layers"]["w_gate_up"], specs["layers"]["w_down"]
        specs["layers"]["moe_router"] = P()
        specs["layers"]["moe_gate_up"] = P(None, MODEL, None, None)
        specs["layers"]["moe_down"] = P(None, MODEL, None, None)
        if cfg.n_shared_experts:
            # DeepSeek shared experts: replicated — llama._shared_expert
            # gates the contribution to shard 0 so the caller's psum adds
            # exactly one copy (the routed experts carry the EP sharding)
            specs["layers"]["moe_shared_gate_up"] = P()
            specs["layers"]["moe_shared_down"] = P()
        if cfg.first_k_dense:
            # dense-first side stack: replicated + shard-0-gated, same deal
            specs["layers"]["dense_mlp"] = {
                "w_gate_up": P(), "w_down": P()}
    if weight_quant:
        int4 = weight_quant == "int4"
        for name in ("wqkv",) + (() if cfg.num_experts else ("w_gate_up",)):
            specs["layers"][name] = dict(_COL_QSPEC_I4 if int4 else _COL_QSPEC)
        for name in ("wo",) + (() if cfg.num_experts else ("w_down",)):
            specs["layers"][name] = dict(_ROW_QSPEC_I4 if int4 else _ROW_QSPEC)
        if cfg.num_experts:
            # Quantized expert stacks shard exactly like their dense forms:
            # whole experts over the model axis — payload (L, E, H, O) and
            # per-expert scales (L, E, O) (int4: (L, E, G, O)) split on the
            # same E axis.
            for name in ("moe_gate_up", "moe_down"):
                specs["layers"][name] = {
                    "w": P(None, MODEL, None, None),
                    "scale": P(None, MODEL, None, None) if int4
                    else P(None, MODEL, None),
                }
    if cfg.attention_bias:
        # column-parallel bias: shards with the (permuted) wqkv output dim
        specs["layers"]["bqkv"] = P(None, MODEL)
    if cfg.qk_norm:
        # replicated (D,)-per-layer norm weights: every shard norms its own
        # heads with the shared weights (shared across heads by design)
        specs["layers"]["q_norm"] = P()
        specs["layers"]["k_norm"] = P()
    if cfg.post_norms:
        # Gemma-2 post-norms run on the PSUMMED (full-hidden) sublayer
        # outputs — replicated like the pre-norms
        specs["layers"]["post_attn_norm"] = P()
        specs["layers"]["post_mlp_norm"] = P()
    if cfg.tie_embeddings:
        specs.pop("lm_head")
    elif lm_head_quant:
        # int4 head scales are (G, V): vocab axis is last either way
        specs["lm_head"] = {
            "w": P(None, MODEL),
            "scale": P(None, MODEL) if lm_head_quant == "int4" else P(MODEL),
        }
    return specs


def cache_specs() -> KVCache:
    """Specs for the (L, B, Hkv, S, D) cache: batch on data, KV heads on
    model — each chip holds exactly its co-located heads' cache shard."""
    return KVCache(
        k=P(None, DATA, MODEL, None, None),
        v=P(None, DATA, MODEL, None, None),
        lengths=P(DATA),
        k_scales=P(None, MODEL),
        v_scales=P(None, MODEL),
    )


def _strip_none_scales(specs: KVCache, cache: KVCache) -> KVCache:
    if cache.k_scales is None:
        return dataclasses.replace(specs, k_scales=None, v_scales=None)
    return specs


def _quant_kind(w) -> "str | bool":
    if not isinstance(w, dict):
        return False
    return "int4" if quant.is_int4_weight(w) else "int8"


def _params_are_weight_quant(params: dict) -> "str | bool":
    """False, "int8" (covers fp8 too — same layout), or "int4". The string
    is truthy, so every boolean use keeps working; param_specs needs the
    distinction because int4's GROUPED scales carry an extra axis."""
    return _quant_kind(params["layers"].get("wqkv"))


def _params_have_quant_lm_head(params: dict) -> "str | bool":
    return _quant_kind(params.get("lm_head"))


def shard_params(params: dict, mesh: Mesh, cfg: ModelConfig) -> dict:
    params = permute_params_for_tp(params, cfg, mesh.shape[MODEL])
    wq = _params_are_weight_quant(params)
    if wq == "int4":
        # Row-parallel int4 shards the packed contraction axis, which must
        # cut at scale-GROUP boundaries (nibble pairs live within a group).
        tp_size = mesh.shape[MODEL]
        # (MoE stacks shard whole experts, not the contraction — exempt)
        for name in ("wo", "w_down"):
            if isinstance(params["layers"].get(name), dict):
                G = params["layers"][name]["scale"].shape[-2]
                if G % tp_size:
                    raise ValueError(
                        f"int4 weight {name!r} has {G} scale groups, not "
                        f"divisible by model-axis size {tp_size}; re-quantize "
                        f"with quantize_model_weights(..., 'int4', "
                        f"int4_group=g) such that (contraction/g) % tp == 0"
                    )
    specs = param_specs(
        cfg,
        weight_quant=wq,
        lm_head_quant=_params_have_quant_lm_head(params),
    )
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: x is None,
    )


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    specs = _strip_none_scales(cache_specs(), cache)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs
    )


def _check(cfg: ModelConfig, mesh: Mesh) -> None:
    tp = mesh.shape[MODEL]
    if cfg.num_kv_heads % tp:
        raise ValueError(
            f"num_kv_heads {cfg.num_kv_heads} not divisible by model-axis size {tp}"
        )
    if cfg.num_experts:
        if cfg.num_experts % tp:
            raise ValueError(
                f"num_experts {cfg.num_experts} not divisible by model-axis "
                f"size {tp} (experts shard whole over the axis)"
            )
    elif cfg.intermediate_size % tp:
        raise ValueError(
            f"intermediate_size {cfg.intermediate_size} not divisible by {tp}"
        )
    if not cfg.tie_embeddings and cfg.vocab_size % tp:
        raise ValueError(
            f"vocab_size {cfg.vocab_size} not divisible by model-axis size {tp} "
            "(lm_head is vocab-sharded)"
        )


def make_tp_decode_step(
    mesh: Mesh, cfg: ModelConfig, quantized: bool = False,
    weight_quant: bool = False, lm_head_quant: bool = False,
):
    """Build the sharded decode step:
    ``step(params, cache, tokens, cos, sin) -> (logits, cache)``.

    Per-shard, each chip runs the SAME single-chip program (its heads, its KV
    shard, its batch rows) + 2 psums/layer; logits come out replicated over
    ``model`` and sharded over ``data``. ``quantized`` = the KV cache carries
    scales; ``weight_quant`` = params went through quantize_model_weights.
    """
    _check(cfg, mesh)
    shard_cfg = _shard_cfg(cfg, mesh)
    p_specs = param_specs(cfg, weight_quant=weight_quant, lm_head_quant=lm_head_quant)
    c_specs = cache_specs()
    if not quantized:
        c_specs = dataclasses.replace(c_specs, k_scales=None, v_scales=None)

    def core(params, cache, tokens, cos, sin):
        return llama._decode_core(
            params, cache, tokens, cos, sin, shard_cfg, axis_name=MODEL
        )

    sharded = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(p_specs, c_specs, P(DATA), P(), P()),
        out_specs=(P(DATA), c_specs),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))


def _shard_cfg(cfg: ModelConfig, mesh: Mesh) -> ModelConfig:
    """Per-shard model geometry: each chip runs the single-chip program at
    1/T width (its heads, its MLP slice, its vocab slice of lm_head)."""
    tp = mesh.shape[MODEL]
    return dataclasses.replace(
        cfg,
        num_q_heads=cfg.num_q_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        # MoE shards whole experts, not the intermediate dim; num_experts
        # stays GLOBAL in the shard config (the replicated router needs the
        # full expert count — local count comes from the weight shard shape).
        intermediate_size=(
            cfg.intermediate_size if cfg.num_experts
            else cfg.intermediate_size // tp
        ),
        # tied embeddings keep the (replicated) gather table as the head
        lm_head_sharded=not cfg.tie_embeddings,
    )


def make_tp_decode_multi(
    mesh: Mesh,
    cfg: ModelConfig,
    n_steps: int,
    quantized: bool = False,
    weight_quant: bool = False,
    lm_head_quant: bool = False,
    sampling: bool = False,
    with_logprobs: bool = False,
    topk_logprobs: int = 0,
    lora_stack: dict | None = None,
):
    """Sharded serving decode round: ``fn(params, cache, tok, cos, sin,
    active) -> (tokens (B, n), pending tok, cache[, logprobs])`` — the TP+DP
    analog of llama.decode_multi, used by the Engine when given a mesh. The
    whole n-step scan (including the 2 psums/layer) is one program per round.
    ``sampling=True`` builds the sampled-token variant: the fn takes a
    trailing core/sampling state-array dict, sharded over ``data`` like the
    slot axis it indexes (each data shard samples its own rows — logits are
    already full-vocab per shard after the model-axis psums).
    ``lora_stack`` (structure only) builds the multi-LoRA variant: the fn
    takes trailing (sharded stack, (B, N) one-hot) operands."""
    _check(cfg, mesh)
    scfg = _shard_cfg(cfg, mesh)
    p_specs = param_specs(cfg, weight_quant=weight_quant, lm_head_quant=lm_head_quant)
    c_specs = cache_specs()
    if not quantized:
        c_specs = dataclasses.replace(c_specs, k_scales=None, v_scales=None)
    s_specs = _sampling_specs() if sampling else None

    def core(params, cache, tok, cos, sin, active, *rest):
        rest = list(rest)
        samp = rest.pop(0) if sampling else None
        lora = rest.pop(0) if lora_stack is not None else None
        sel = rest.pop(0) if lora_stack is not None else None
        return llama._decode_multi_core(
            params, cache, tok, cos, sin, active, scfg, n_steps,
            axis_name=MODEL, sampling=samp,
            with_logprobs=with_logprobs, topk_logprobs=topk_logprobs,
            lora=lora, lora_sel=sel,
        )

    in_specs = (p_specs, c_specs, P(DATA), P(), P(), P(DATA))
    if sampling:
        in_specs = in_specs + (s_specs,)
    if lora_stack is not None:
        in_specs = in_specs + (lora_specs(lora_stack), P(DATA))
    out_specs = (P(DATA), P(DATA), c_specs)
    if with_logprobs:
        out_specs = out_specs + (P(DATA),)
    if topk_logprobs:
        out_specs = out_specs + (P(DATA), P(DATA))
    sharded = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))


def _sampling_specs():
    """Specs for the core/sampling state-array dict: per-slot vectors ride
    the data axis with the batch they parameterize."""
    return {"temperature": P(DATA), "top_k": P(DATA), "top_p": P(DATA),
            "min_p": P(DATA), "seed": P(DATA)}


def make_tp_spec_decode_multi(
    mesh: Mesh,
    cfg: ModelConfig,
    n_steps: int,
    num_draft: int,
    ngram: int = 4,
    quantized: bool = False,
    weight_quant: bool = False,
    lm_head_quant: bool = False,
):
    """Sharded speculative decode round: ``fn(params, cache, history, tok,
    cos, sin, active) -> (tokens (B, n, k+1), counts (B, n), pending, cache,
    history)`` — the TP+DP analog of llama.spec_decode_multi.

    Drafting, acceptance, and the token history are per-slot state and ride
    the DATA axis with the batch; the verify step itself is the usual
    Megatron-sharded layer stack (2 psums/layer over MODEL), so each data
    shard's argmax sees full-vocab logits and the accept decision is
    bit-identical to the single-chip program."""
    _check(cfg, mesh)
    scfg = _shard_cfg(cfg, mesh)
    p_specs = param_specs(cfg, weight_quant=weight_quant, lm_head_quant=lm_head_quant)
    c_specs = cache_specs()
    if not quantized:
        c_specs = dataclasses.replace(c_specs, k_scales=None, v_scales=None)

    def core(params, cache, history, tok, cos, sin, active):
        return llama._spec_decode_multi_core(
            params, cache, history, tok, cos, sin, active, scfg, n_steps,
            num_draft, ngram, axis_name=MODEL,
        )

    sharded = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(p_specs, c_specs, P(DATA), P(DATA), P(), P(), P(DATA)),
        out_specs=(P(DATA), P(DATA), P(DATA), c_specs, P(DATA)),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1, 2))


def draft_cache_specs() -> KVCache:
    """Specs for a REPLICATED draft model's (L, B, Hkv, S, D) cache: only
    the batch rides the data axis; heads stay whole on every chip (the
    draft is small enough to replicate — sharding it would add 2 psums per
    draft layer per draft step for no bandwidth win)."""
    return KVCache(
        k=P(None, DATA),
        v=P(None, DATA),
        lengths=P(DATA),
        k_scales=P(),
        v_scales=P(),
    )


def shard_draft_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    specs = _strip_none_scales(draft_cache_specs(), cache)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs
    )


def _replicated_param_specs(cfg: ModelConfig, weight_quant: bool = False) -> dict:
    return jax.tree.map(
        lambda s: P(), param_specs(cfg, weight_quant=weight_quant)
    )


def make_tp_spec_decode_multi_draft(
    mesh: Mesh,
    cfg: ModelConfig,
    dcfg: ModelConfig,
    n_steps: int,
    num_draft: int,
    quantized: bool = False,
    weight_quant: bool = False,
    lm_head_quant: bool = False,
    draft_quantized: bool = False,
    draft_weight_quant: bool = False,
):
    """Sharded DRAFT-MODEL speculative decode round: ``fn(params, cache,
    dparams, dcache, tok, cos, sin, dcos, dsin, active) -> (tokens, counts,
    pending, cache, dcache)`` — the TP+DP analog of
    llama.spec_decode_multi_draft.

    The draft model runs REPLICATED inside the same shard_map program
    (``draft_axis_name=None``): every model shard steps the full draft on
    its data rows, producing identical drafts per shard, then verifies with
    the usual Megatron-sharded target stack (2 psums/layer over MODEL).
    Greedy output stays bit-identical to the single-chip program — the
    accept decision compares the replicated drafts against full-vocab
    verify argmaxes on every shard."""
    _check(cfg, mesh)
    scfg = _shard_cfg(cfg, mesh)
    p_specs = param_specs(cfg, weight_quant=weight_quant, lm_head_quant=lm_head_quant)
    c_specs = cache_specs()
    if not quantized:
        c_specs = dataclasses.replace(c_specs, k_scales=None, v_scales=None)
    dp_specs = _replicated_param_specs(dcfg, weight_quant=draft_weight_quant)
    dc_specs = draft_cache_specs()
    if not draft_quantized:
        dc_specs = dataclasses.replace(dc_specs, k_scales=None, v_scales=None)

    def core(params, cache, dparams, dcache, tok, cos, sin, dcos, dsin, active):
        return llama._spec_decode_multi_draft_core(
            params, cache, dparams, dcache, tok, cos, sin, dcos, dsin,
            active, scfg, dcfg, n_steps, num_draft,
            axis_name=MODEL, draft_axis_name=None,
        )

    sharded = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(
            p_specs, c_specs, dp_specs, dc_specs,
            P(DATA), P(), P(), P(), P(), P(DATA),
        ),
        out_specs=(P(DATA), P(DATA), P(DATA), c_specs, dc_specs),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1, 3))


def make_tp_draft_prefill_serving(
    mesh: Mesh, dcfg: ModelConfig,
    draft_quantized: bool = False, draft_weight_quant: bool = False,
):
    """Admission prefill for the REPLICATED draft model on a sharded engine:
    same contract as make_tp_prefill_serving, but the full draft runs on
    every model shard (axis_name=None) over its data rows."""
    dp_specs = _replicated_param_specs(dcfg, weight_quant=draft_weight_quant)
    dc_specs = draft_cache_specs()
    if not draft_quantized:
        dc_specs = dataclasses.replace(dc_specs, k_scales=None, v_scales=None)

    def core(params, cache, tokens, new_lengths, active, reset, cos, sin):
        return llama._prefill_serving_core(
            params, cache, tokens, new_lengths, active, reset, cos, sin,
            dcfg, axis_name=None,
        )

    sharded = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(
            dp_specs, dc_specs, P(DATA), P(DATA), P(DATA), P(DATA), P(), P(),
        ),
        out_specs=(P(DATA), dc_specs),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))


def make_tp_prefill_serving(
    mesh: Mesh, cfg: ModelConfig, quantized: bool = False,
    weight_quant: bool = False, lm_head_quant: bool = False,
    lora_stack: dict | None = None,
):
    """Sharded admission prefill: ``fn(params, cache, tokens, new_lengths,
    active, reset, cos, sin)`` — TP+DP analog of llama.prefill_serving.
    ``lora_stack``: see :func:`make_tp_decode_multi`."""
    _check(cfg, mesh)
    scfg = _shard_cfg(cfg, mesh)
    p_specs = param_specs(cfg, weight_quant=weight_quant, lm_head_quant=lm_head_quant)
    c_specs = cache_specs()
    if not quantized:
        c_specs = dataclasses.replace(c_specs, k_scales=None, v_scales=None)

    def core(params, cache, tokens, new_lengths, active, reset, cos, sin,
             *rest):
        lora = rest[0] if lora_stack is not None else None
        sel = rest[1] if lora_stack is not None else None
        return llama._prefill_serving_core(
            params, cache, tokens, new_lengths, active, reset, cos, sin, scfg,
            axis_name=MODEL, lora=lora, lora_sel=sel,
        )

    in_specs = (p_specs, c_specs, P(DATA), P(DATA), P(DATA), P(DATA), P(), P())
    if lora_stack is not None:
        in_specs = in_specs + (lora_specs(lora_stack), P(DATA))
    sharded = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(DATA), c_specs),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))


# ---------------------------------------------------------------------------
# Sharded PAGED serving: the page pool shards its KV-head axis over "model"
# (each chip holds its co-located heads' slice of every page) and its PAGE
# axis over "data" (each data shard owns a private pool partition; page ids
# in the table are LOCAL to the shard, issued by that shard's allocator —
# serving/engine.PagedEngine keeps one allocator per data shard). The page
# table itself shards its slot rows over "data".
# ---------------------------------------------------------------------------


def paged_cache_specs():
    from starflashattention_tpu.cache.paged import PagedKVCache

    return PagedKVCache(
        k_pages=P(None, MODEL, DATA, None, None),
        v_pages=P(None, MODEL, DATA, None, None),
        page_table=P(DATA, None),
        lengths=P(DATA),
        k_scales=P(None, MODEL),
        v_scales=P(None, MODEL),
    )


def shard_paged_cache(cache, mesh: Mesh):
    specs = paged_cache_specs()
    if cache.k_scales is None:
        specs = dataclasses.replace(specs, k_scales=None, v_scales=None)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs
    )


def _paged_specs_for(cfg: ModelConfig):
    specs = paged_cache_specs()
    if cfg.quant_mode == "none":
        specs = dataclasses.replace(specs, k_scales=None, v_scales=None)
    return specs


def make_tp_decode_multi_paged(
    mesh: Mesh, cfg: ModelConfig, n_steps: int, weight_quant: bool = False,
    lm_head_quant: bool = False, sampling: bool = False,
    with_logprobs: bool = False, topk_logprobs: int = 0,
    lora_stack: dict | None = None,
):
    """Sharded paged serving decode round — the paged analog of
    :func:`make_tp_decode_multi` (incl. the ``sampling``/``with_logprobs``/
    ``topk_logprobs``/``lora_stack`` variants)."""
    _check(cfg, mesh)
    scfg = _shard_cfg(cfg, mesh)
    p_specs = param_specs(cfg, weight_quant=weight_quant, lm_head_quant=lm_head_quant)
    c_specs = _paged_specs_for(cfg)

    def core(params, cache, tok, cos, sin, active, *rest):
        rest = list(rest)
        samp = rest.pop(0) if sampling else None
        lora = rest.pop(0) if lora_stack is not None else None
        sel = rest.pop(0) if lora_stack is not None else None
        return llama._decode_multi_core_paged(
            params, cache, tok, cos, sin, active, scfg, n_steps,
            axis_name=MODEL, sampling=samp,
            with_logprobs=with_logprobs, topk_logprobs=topk_logprobs,
            lora=lora, lora_sel=sel,
        )

    in_specs = (p_specs, c_specs, P(DATA), P(), P(), P(DATA))
    if sampling:
        in_specs = in_specs + (_sampling_specs(),)
    if lora_stack is not None:
        in_specs = in_specs + (lora_specs(lora_stack), P(DATA))
    out_specs = (P(DATA), P(DATA), c_specs)
    if with_logprobs:
        out_specs = out_specs + (P(DATA),)
    if topk_logprobs:
        out_specs = out_specs + (P(DATA), P(DATA))
    sharded = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))


def make_tp_prefill_serving_paged(
    mesh: Mesh, cfg: ModelConfig, weight_quant: bool = False,
    lm_head_quant: bool = False, prefix_len: int = 0,
    lora_stack: dict | None = None,
):
    """Sharded paged admission prefill. ``prefix_len`` > 0 builds the
    chunked-prefill continuation program (prefix gathered per shard from its
    own pool partition — the gather is local, no collective)."""
    _check(cfg, mesh)
    scfg = _shard_cfg(cfg, mesh)
    p_specs = param_specs(cfg, weight_quant=weight_quant, lm_head_quant=lm_head_quant)
    c_specs = _paged_specs_for(cfg)

    def core(params, cache, tokens, new_lengths, active, reset, cos, sin,
             *rest):
        lora = rest[0] if lora_stack is not None else None
        sel = rest[1] if lora_stack is not None else None
        return llama._prefill_serving_core_paged(
            params, cache, tokens, new_lengths, active, reset, cos, sin, scfg,
            axis_name=MODEL, prefix_len=prefix_len, lora=lora, lora_sel=sel,
        )

    in_specs = (p_specs, c_specs, P(DATA), P(DATA), P(DATA), P(DATA), P(), P())
    if lora_stack is not None:
        in_specs = in_specs + (lora_specs(lora_stack), P(DATA))
    sharded = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(DATA), c_specs),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))


def make_tp_prefill(
    mesh: Mesh, cfg: ModelConfig, quantized: bool = False,
    weight_quant: bool = False, lm_head_quant: bool = False,
):
    """Sharded prefill: ``fn(params, cache, tokens, new_lengths, cos, sin)``."""
    _check(cfg, mesh)
    shard_cfg = _shard_cfg(cfg, mesh)
    p_specs = param_specs(cfg, weight_quant=weight_quant, lm_head_quant=lm_head_quant)
    c_specs = cache_specs()
    if not quantized:
        c_specs = dataclasses.replace(c_specs, k_scales=None, v_scales=None)

    def core(params, cache, tokens, new_lengths, cos, sin):
        return llama._prefill_core(
            params, cache, tokens, new_lengths, cos, sin, shard_cfg, axis_name=MODEL
        )

    sharded = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(p_specs, c_specs, P(DATA), P(DATA), P(), P()),
        out_specs=(P(DATA), c_specs),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))
