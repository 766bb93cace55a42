"""Checkpoint loading: HuggingFace Llama weights → this framework's pytree.

The reference has no checkpoint story (SURVEY.md §5: checkpoint/resume
ABSENT); a production engine must load real weights. This converts a HF
``LlamaForCausalLM`` state dict (torch tensors or numpy arrays, from
safetensors / torch.load / transformers) into ``models/llama.init_params``'
layout: per-layer q/k/v projections fuse into the flat ``wqkv`` column block
[q|k|v], gate/up fuse into ``w_gate_up`` [gate|up], and layers stack on the
leading L axis.

Note on RoPE convention: HF checkpoints use the "half" (rotate_half)
convention — ModelConfig.rope_style="half" (the default, matching the
reference's golden model testFlashDecoder.py:28-58).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.runtime.params import ModelConfig


def _hf_rope_scaling(hf_config) -> tuple | None:
    """HF rope_scaling dict -> the hashable tuple ModelConfig carries."""
    rs = getattr(hf_config, "rope_scaling", None)
    if rs is None:
        return None
    if isinstance(rs, dict):
        kind = rs.get("rope_type", rs.get("type"))
        if kind == "longrope":
            # Phi-3 su-scaling: per-dim factor lists -> hashable tuples.
            # target = the CHECKPOINT's full max_position_embeddings (HF
            # derives attention_factor from it — NOT from the possibly
            # shorter serving table).
            return (
                "longrope",
                int(getattr(hf_config, "original_max_position_embeddings",
                            hf_config.max_position_embeddings)),
                int(hf_config.max_position_embeddings),
                tuple(float(f) for f in rs["short_factor"]),
                tuple(float(f) for f in rs["long_factor"]),
            )
        if kind == "llama3":
            return (
                "llama3",
                float(rs.get("factor", 8.0)),
                float(rs.get("low_freq_factor", 1.0)),
                float(rs.get("high_freq_factor", 4.0)),
                int(rs.get("original_max_position_embeddings", 8192)),
            )
        if kind == "linear":
            return ("linear", float(rs.get("factor", 1.0)))
        raise ValueError(f"unsupported rope_scaling type {kind!r}")
    return None


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly bf16) without importing torch at module scope
    try:
        import torch  # noqa: F811

        if isinstance(t, torch.Tensor):
            return t.detach().to(torch.float32).cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


def config_from_hf(hf_config) -> ModelConfig:
    """ModelConfig from a transformers config for any supported family:
    Llama/Llama-2/3 (``LlamaConfig``), Mistral (``MistralConfig`` — adds
    ``sliding_window``), Qwen2 (``Qwen2Config`` — adds fused-QKV bias).
    """
    model_type = getattr(hf_config, "model_type", "llama")
    # Qwen2 always carries q/k/v projection biases; Llama-family configs
    # expose an explicit attention_bias flag (default False).
    attention_bias = bool(
        getattr(hf_config, "attention_bias", False) or model_type == "qwen2"
    )
    # Mistral: sliding_window is the window size (None disables). Qwen2 sets
    # sliding_window in the config but gates it behind use_sliding_window
    # (default False) — honor the gate.
    window = getattr(hf_config, "sliding_window", None)
    if not getattr(hf_config, "use_sliding_window", True):
        window = None
    # Qwen3 family: QK-norm is architectural (no config flag)
    qk_norm = model_type in ("qwen3", "qwen3_moe")
    # DeepSeek V2/V3: multi-head latent attention. The V2 MoE flavor
    # (greedy gate: softmax-all → top-k, unnormalized, × scaling factor;
    # shared experts; first_k_dense_replace dense layers) is supported;
    # V3's sigmoid+bias noaux routing and V2-big's group_limited_greedy
    # selection are not.
    is_deepseek = model_type in ("deepseek_v2", "deepseek_v3")
    mla_kw = {}
    deepseek_moe = is_deepseek and bool(
        getattr(hf_config, "n_routed_experts", None))
    if deepseek_moe:
        if model_type == "deepseek_v3":
            raise ValueError(
                "DeepSeek-V3 MoE (sigmoid scores + e_score_correction_bias) "
                "is unsupported — V2's greedy softmax gate only"
            )
        if getattr(hf_config, "topk_method", "greedy") != "greedy":
            raise ValueError(
                "DeepSeek MoE topk_method "
                f"{hf_config.topk_method!r} is unsupported (greedy only — "
                "group_limited_greedy's device-group masking is not "
                "implemented)"
            )
        if getattr(hf_config, "moe_layer_freq", 1) != 1:
            raise ValueError("DeepSeek moe_layer_freq != 1 is unsupported")
        first_k = int(getattr(hf_config, "first_k_dense_replace", 0) or 0)
        mla_kw.update(
            n_shared_experts=int(
                getattr(hf_config, "n_shared_experts", 0) or 0),
            first_k_dense=first_k,
            dense_inter_size=(
                hf_config.intermediate_size if first_k else None),
            router_pre_softmax=True,
            routed_scaling_factor=float(
                getattr(hf_config, "routed_scaling_factor", 1.0)),
        )
    if is_deepseek:
        if getattr(hf_config, "rope_scaling", None) is not None:
            raise ValueError("DeepSeek yarn rope_scaling is unsupported")
        mla_kw.update(
            mla=True,
            kv_lora_rank=hf_config.kv_lora_rank,
            q_lora_rank=getattr(hf_config, "q_lora_rank", None),
            qk_nope_head_dim=hf_config.qk_nope_head_dim,
            qk_rope_head_dim=hf_config.qk_rope_head_dim,
            v_head_dim=hf_config.v_head_dim,
            query_scale=float(
                hf_config.qk_nope_head_dim + hf_config.qk_rope_head_dim),
        )
    # Gemma: GeGLU MLP (hidden_act gelu_pytorch_tanh) + sqrt(hidden)-scaled
    # embeddings; its (1 + w) RMSNorm convention is folded into the stored
    # weights by load_hf_state_dict, not a runtime flag.
    is_gemma = model_type in ("gemma", "gemma2")
    is_gemma2 = model_type == "gemma2"
    hidden_act = getattr(hf_config, "hidden_act", None) or getattr(
        hf_config, "hidden_activation", None
    )
    if is_gemma or hidden_act == "gelu_pytorch_tanh":
        mlp_activation = "gelu_tanh"
    elif hidden_act == "gelu":
        # HF's exact erf GELU — distinct from the tanh approximation (they
        # differ by up to ~3e-3; mapping one to the other breaks HF parity)
        mlp_activation = "gelu_exact"
    else:
        mlp_activation = "silu"
    # Gemma-2: alternating sliding/full layers, score+logit softcapping,
    # query_pre_attn_scalar-scaled attention, post-norms
    gemma2_kw = {}
    if is_gemma2:
        gemma2_kw = dict(
            attn_softcap=getattr(hf_config, "attn_logit_softcapping", None),
            final_softcap=getattr(hf_config, "final_logit_softcapping", None),
            query_scale=float(
                getattr(hf_config, "query_pre_attn_scalar", None)
                or (getattr(hf_config, "head_dim", None)
                    or hf_config.hidden_size // hf_config.num_attention_heads)
            ),
            sliding_window_pattern=2,
            post_norms=True,
            num_splits=1,  # softcap runs in the fused kernels only
        )
    # Qwen3-MoE: experts use moe_intermediate_size; its softmax-all-then-
    # top-k-RENORMALIZED routing equals this framework's softmax-over-top-k
    # (the full-set partition function cancels under renormalization) — but
    # ONLY with norm_topk_prob, so unnormalized configs are rejected.
    num_experts = (
        getattr(hf_config, "num_local_experts", 0)
        or (getattr(hf_config, "num_experts", 0)
            if model_type == "qwen3_moe" else 0)
        or (hf_config.n_routed_experts if deepseek_moe else 0)
        or 0
    )
    inter = hf_config.intermediate_size
    if deepseek_moe:
        # cfg.intermediate_size is the ROUTED expert width for MoE models
        # (same convention as qwen3_moe below); the dense-first layers' width
        # travels as dense_inter_size
        inter = hf_config.moe_intermediate_size
    if model_type == "qwen3_moe":
        if not getattr(hf_config, "norm_topk_prob", True):
            raise ValueError(
                "qwen3_moe with norm_topk_prob=False is unsupported: the "
                "router computes softmax over the selected experts "
                "(equivalent to HF's normalized form only)"
            )
        if getattr(hf_config, "decoder_sparse_step", 1) != 1:
            raise ValueError("qwen3_moe decoder_sparse_step != 1 unsupported")
        if getattr(hf_config, "mlp_only_layers", None):
            raise ValueError(
                "qwen3_moe mlp_only_layers is unsupported (every layer must "
                "be routed — mixed dense/MoE stacks need per-layer params)"
            )
        inter = hf_config.moe_intermediate_size
    return ModelConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=inter,
        num_layers=hf_config.num_hidden_layers,
        num_q_heads=hf_config.num_attention_heads,
        num_kv_heads=(
            1 if is_deepseek
            else getattr(hf_config, "num_key_value_heads", None)
            or hf_config.num_attention_heads
        ),
        head_dim=(
            hf_config.qk_nope_head_dim + hf_config.qk_rope_head_dim
            if is_deepseek
            else getattr(hf_config, "head_dim", None)
            or hf_config.hidden_size // hf_config.num_attention_heads
        ),
        rms_norm_eps=hf_config.rms_norm_eps,
        rope_base=getattr(hf_config, "rope_theta", 10000.0),
        rope_scaling=_hf_rope_scaling(hf_config),
        max_seq_len=min(getattr(hf_config, "max_position_embeddings", 4096), 8192),
        tie_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        attention_bias=attention_bias,
        sliding_window=window,
        qk_norm=qk_norm,
        # Mixtral / Qwen3-MoE: E experts routed top-num_experts_per_tok
        num_experts=num_experts,
        num_experts_per_tok=getattr(hf_config, "num_experts_per_tok", 2),
        mlp_activation=mlp_activation,
        embed_scale=is_gemma,
        norm_plus_one=is_gemma,
        **gemma2_kw,
        **mla_kw,
    )


def load_hf_state_dict(
    state: Mapping[str, Any], cfg: ModelConfig, dtype=None
) -> dict:
    """Convert a HF Llama state dict to this framework's params pytree."""
    if dtype is None:
        dtype = jnp.dtype(cfg.dtype)
    L = cfg.num_layers
    d = cfg.head_dim
    hq, hkv, h = cfg.num_q_heads, cfg.num_kv_heads, cfg.hidden_size

    def get(name: str) -> np.ndarray:
        return _to_np(state[name])

    def get_norm(name: str) -> np.ndarray:
        # Gemma stores RMSNorm weights as offsets (x * (1 + w)); fold the
        # +1 here so the runtime rms_norm (x * w) is exact (cfg.norm_plus_one)
        w = get(name)
        return w + 1.0 if cfg.norm_plus_one else w

    wqkv, wo, w_gate_up, w_down = [], [], [], []
    attn_norm, mlp_norm, bqkv = [], [], []
    post_attn_norm, post_mlp_norm = [], []
    q_norm, k_norm = [], []
    moe_router, moe_gate_up, moe_down = [], [], []
    shared_gu, shared_down, dense_gu, dense_down = [], [], [], []
    mla = {k: [] for k in ("wq", "wq_a", "q_a_norm", "wq_b", "wkv_a",
                           "kv_a_norm", "wuk", "wuv")}
    for i in range(L):
        p = f"model.layers.{i}."
        # HF stores projections as (out, in); our matmuls are x @ W = (in, out).
        if cfg.mla:
            # DeepSeek MLA: q path (direct or low-rank), the shared latent
            # projection, and kv_b split per head into W_uk (first nope
            # rows) and W_uv (next v rows) — the absorbed-form operands.
            sa = p + "self_attn."
            if cfg.q_lora_rank is not None:
                mla["wq_a"].append(get(sa + "q_a_proj.weight").T)
                mla["q_a_norm"].append(get(sa + "q_a_layernorm.weight"))
                mla["wq_b"].append(get(sa + "q_b_proj.weight").T)
            else:
                mla["wq"].append(get(sa + "q_proj.weight").T)
            mla["wkv_a"].append(get(sa + "kv_a_proj_with_mqa.weight").T)
            mla["kv_a_norm"].append(get(sa + "kv_a_layernorm.weight"))
            kvb = get(sa + "kv_b_proj.weight")  # (Hq*(nope+v), c)
            nope, vdim = cfg.qk_nope_head_dim, cfg.v_head_dim
            kvb = kvb.reshape(cfg.num_q_heads, nope + vdim, cfg.kv_lora_rank)
            mla["wuk"].append(kvb[:, :nope, :])          # (Hq, nope, c)
            mla["wuv"].append(kvb[:, nope:, :].transpose(0, 2, 1))  # (Hq, c, v)
            wo.append(get(sa + "o_proj.weight").T)
        elif p + "self_attn.qkv_proj.weight" in state:
            # Phi-3 ships the projections ALREADY fused, row order [q|k|v] —
            # exactly this framework's wqkv column layout after transpose
            wqkv.append(get(p + "self_attn.qkv_proj.weight").T)
        else:
            q = get(p + "self_attn.q_proj.weight").T  # (h, hq*d)
            k = get(p + "self_attn.k_proj.weight").T  # (h, hkv*d)
            v = get(p + "self_attn.v_proj.weight").T
            wqkv.append(np.concatenate([q, k, v], axis=1))
        if cfg.attention_bias:
            # Qwen2-style: per-projection biases fuse into one row matching
            # the [q|k|v] column layout of wqkv
            bqkv.append(np.concatenate([
                get(p + "self_attn.q_proj.bias"),
                get(p + "self_attn.k_proj.bias"),
                get(p + "self_attn.v_proj.bias"),
            ]))
        if not cfg.mla:
            wo.append(get(p + "self_attn.o_proj.weight").T)  # (hq*d, h)
        if cfg.num_experts and cfg.first_k_dense and i < cfg.first_k_dense:
            # DeepSeek first_k_dense_replace layer: the real weights go to
            # the k-leading dense_mlp side stack; the layer's slices of the
            # L-homogeneous expert stacks are ZEROS (streamed but never
            # selected — the _mlp_block cond takes the dense branch here).
            E, I = cfg.num_experts, cfg.intermediate_size
            dense_gu.append(np.concatenate(
                [get(p + "mlp.gate_proj.weight").T,
                 get(p + "mlp.up_proj.weight").T], axis=1))
            dense_down.append(get(p + "mlp.down_proj.weight").T)
            moe_router.append(np.zeros((h, E), np.float32))
            moe_gate_up.append(np.zeros((E, h, 2 * I), np.float32))
            moe_down.append(np.zeros((E, I, h), np.float32))
            if cfg.n_shared_experts:
                si = cfg.n_shared_experts * I
                shared_gu.append(np.zeros((h, 2 * si), np.float32))
                shared_down.append(np.zeros((si, h), np.float32))
        elif cfg.num_experts:
            # Mixtral MoE: block_sparse_moe.gate (E, h) → router (h, E); per
            # expert w1=gate, w3=up → [gate|up]; w2=down. Qwen3-MoE and
            # DeepSeek-V2 name the same pieces mlp.gate /
            # mlp.experts.E.{gate,up,down}_proj (DeepSeek adds
            # mlp.shared_experts.*). Experts stack on a leading E axis.
            qwen_moe = p + "mlp.gate.weight" in state
            router_key = "mlp.gate.weight" if qwen_moe else "block_sparse_moe.gate.weight"
            moe_router.append(get(p + router_key).T)
            gus, downs = [], []
            for e in range(cfg.num_experts):
                if qwen_moe:
                    ep = p + f"mlp.experts.{e}."
                    gus.append(np.concatenate(
                        [get(ep + "gate_proj.weight").T,
                         get(ep + "up_proj.weight").T], axis=1))
                    downs.append(get(ep + "down_proj.weight").T)
                else:
                    ep = p + f"block_sparse_moe.experts.{e}."
                    gus.append(np.concatenate(
                        [get(ep + "w1.weight").T, get(ep + "w3.weight").T],
                        axis=1))
                    downs.append(get(ep + "w2.weight").T)
            moe_gate_up.append(np.stack(gus))
            moe_down.append(np.stack(downs))
            if cfg.n_shared_experts:
                sp = p + "mlp.shared_experts."
                shared_gu.append(np.concatenate(
                    [get(sp + "gate_proj.weight").T,
                     get(sp + "up_proj.weight").T], axis=1))
                shared_down.append(get(sp + "down_proj.weight").T)
        elif p + "mlp.gate_up_proj.weight" in state:
            # Phi-3 fused [gate|up] — matches w_gate_up's column layout
            w_gate_up.append(get(p + "mlp.gate_up_proj.weight").T)
            w_down.append(get(p + "mlp.down_proj.weight").T)
        else:
            gate = get(p + "mlp.gate_proj.weight").T  # (h, I)
            up = get(p + "mlp.up_proj.weight").T
            w_gate_up.append(np.concatenate([gate, up], axis=1))
            w_down.append(get(p + "mlp.down_proj.weight").T)  # (I, h)
        if cfg.qk_norm:
            # Qwen3-style per-head (D,) QK-norm weights
            q_norm.append(get(p + "self_attn.q_norm.weight"))
            k_norm.append(get(p + "self_attn.k_norm.weight"))
        attn_norm.append(get_norm(p + "input_layernorm.weight"))
        if cfg.post_norms:
            # Gemma-2's four norms: post_attention_layernorm is the attn
            # POST-norm here (in Llama-family models it is the MLP pre-norm)
            post_attn_norm.append(
                get_norm(p + "post_attention_layernorm.weight"))
            mlp_norm.append(get_norm(p + "pre_feedforward_layernorm.weight"))
            post_mlp_norm.append(
                get_norm(p + "post_feedforward_layernorm.weight"))
        else:
            mlp_norm.append(get_norm(p + "post_attention_layernorm.weight"))

    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "layers": {
            "attn_norm": jnp.asarray(np.stack(attn_norm), dtype),
            "wo": jnp.asarray(np.stack(wo), dtype),
            "mlp_norm": jnp.asarray(np.stack(mlp_norm), dtype),
        },
        "final_norm": jnp.asarray(get_norm("model.norm.weight"), dtype),
    }
    if cfg.mla:
        for name, stack in mla.items():
            if stack:
                params["layers"]["mla_" + name] = jnp.asarray(
                    np.stack(stack), dtype)
    else:
        params["layers"]["wqkv"] = jnp.asarray(np.stack(wqkv), dtype)
    if cfg.num_experts:
        params["layers"]["moe_router"] = jnp.asarray(np.stack(moe_router), dtype)
        params["layers"]["moe_gate_up"] = jnp.asarray(np.stack(moe_gate_up), dtype)
        params["layers"]["moe_down"] = jnp.asarray(np.stack(moe_down), dtype)
        if cfg.n_shared_experts:
            params["layers"]["moe_shared_gate_up"] = jnp.asarray(
                np.stack(shared_gu), dtype)
            params["layers"]["moe_shared_down"] = jnp.asarray(
                np.stack(shared_down), dtype)
        if cfg.first_k_dense:
            params["layers"]["dense_mlp"] = {
                "w_gate_up": jnp.asarray(np.stack(dense_gu), dtype),
                "w_down": jnp.asarray(np.stack(dense_down), dtype),
            }
    else:
        params["layers"]["w_gate_up"] = jnp.asarray(np.stack(w_gate_up), dtype)
        params["layers"]["w_down"] = jnp.asarray(np.stack(w_down), dtype)
    if cfg.attention_bias:
        params["layers"]["bqkv"] = jnp.asarray(np.stack(bqkv), dtype)
    if cfg.qk_norm:
        params["layers"]["q_norm"] = jnp.asarray(np.stack(q_norm), dtype)
        params["layers"]["k_norm"] = jnp.asarray(np.stack(k_norm), dtype)
    if cfg.post_norms:
        params["layers"]["post_attn_norm"] = jnp.asarray(
            np.stack(post_attn_norm), dtype)
        params["layers"]["post_mlp_norm"] = jnp.asarray(
            np.stack(post_mlp_norm), dtype)
    if not cfg.tie_embeddings:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype)
    _check_shapes(params, cfg)
    return params


def _check_shapes(params: dict, cfg: ModelConfig) -> None:
    d, hq, hkv, h = cfg.head_dim, cfg.num_q_heads, cfg.num_kv_heads, cfg.hidden_size
    I, E, L = cfg.intermediate_size, cfg.num_experts, cfg.num_layers
    if cfg.mla:
        expect = {
            ("layers", "mla_wkv_a"): (
                L, h, cfg.kv_lora_rank + cfg.qk_rope_head_dim),
            ("layers", "mla_wuk"): (
                L, hq, cfg.qk_nope_head_dim, cfg.kv_lora_rank),
            ("layers", "mla_wuv"): (
                L, hq, cfg.kv_lora_rank, cfg.v_head_dim),
            ("layers", "wo"): (L, hq * cfg.v_head_dim, h),
            ("embed",): (cfg.vocab_size, h),
        }
    else:
        expect = {
            ("layers", "wqkv"): (L, h, (hq + 2 * hkv) * d),
            ("layers", "wo"): (L, hq * d, h),
            ("embed",): (cfg.vocab_size, h),
        }
    if E:
        expect[("layers", "moe_router")] = (L, h, E)
        expect[("layers", "moe_gate_up")] = (L, E, h, 2 * I)
        expect[("layers", "moe_down")] = (L, E, I, h)
        if cfg.n_shared_experts:
            si = cfg.n_shared_experts * I
            expect[("layers", "moe_shared_gate_up")] = (L, h, 2 * si)
            expect[("layers", "moe_shared_down")] = (L, si, h)
        if cfg.first_k_dense:
            di = cfg.dense_inter_size
            expect[("layers", "dense_mlp", "w_gate_up")] = (
                cfg.first_k_dense, h, 2 * di)
            expect[("layers", "dense_mlp", "w_down")] = (
                cfg.first_k_dense, di, h)
    else:
        expect[("layers", "w_gate_up")] = (L, h, 2 * I)
        expect[("layers", "w_down")] = (L, I, h)
    if cfg.attention_bias:
        expect[("layers", "bqkv")] = (cfg.num_layers, (hq + 2 * hkv) * d)
    for path, shape in expect.items():
        node = params
        for k in path:
            node = node[k]
        if tuple(node.shape) != shape:
            raise ValueError(f"{'.'.join(path)}: got {tuple(node.shape)}, want {shape}")


def load_hf_model(model_name_or_path: str, dtype=None):
    """Load via transformers (local path or cached model) → (cfg, params)."""
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.from_pretrained(model_name_or_path)
    cfg = config_from_hf(hf_cfg)
    model = AutoModelForCausalLM.from_pretrained(model_name_or_path)
    params = load_hf_state_dict(model.state_dict(), cfg, dtype=dtype)
    return cfg, params


# ---------------------------------------------------------------------------
# Native checkpoints (Orbax): save/restore the framework's own pytree —
# including QUANTIZED weights, so a serving fleet warm-restarts without
# re-reading + re-quantizing the bf16 original (at 7B that is ~14 GB of IO
# plus a minute of on-chip quantization per restart).
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, params: dict, cfg: ModelConfig) -> None:
    """Write params (+ the ModelConfig, as metadata) to ``path``."""
    import dataclasses
    import json
    import pathlib

    import orbax.checkpoint as ocp

    path = pathlib.Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "params", params)
    ckptr.wait_until_finished()
    (path / "config.json").write_text(json.dumps(dataclasses.asdict(cfg)))


def load_checkpoint(path: str):
    """Restore ``(cfg, params)`` written by :func:`save_checkpoint` —
    quantized ``{"w", "scale"}`` structure round-trips as-is."""
    import json
    import pathlib

    import orbax.checkpoint as ocp

    path = pathlib.Path(path).resolve()
    cfg = ModelConfig(**json.loads((path / "config.json").read_text()))
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(path / "params")
    return cfg, params
