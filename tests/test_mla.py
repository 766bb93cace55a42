"""DeepSeek multi-head latent attention (MLA): absorbed latent-cache serving
on the EXISTING MQA kernels.

The cache stores one shared row per token — [c_kv | roped k_pe | pad] — and
the absorbed query (q_nope @ W_uk ++ q_pe) attends it; by associativity the
scores and outputs equal HF's unabsorbed per-head form exactly, at a cache
footprint of kv_lora_rank + qk_rope_head_dim per token instead of
2 * Hq * (nope + rope + v)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.cache import contiguous
from starflashattention_tpu.models import checkpoint, llama
from starflashattention_tpu.runtime.params import ModelConfig

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _hf_deepseek(q_lora_rank=None, seed=8):
    hf_cfg = transformers.DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=q_lora_rank, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=None, first_k_dense_replace=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(seed)
    return hf_cfg, transformers.DeepseekV2ForCausalLM(hf_cfg).eval()


def _assert_matches(hf_cfg, model, seq=9):
    cfg = checkpoint.config_from_hf(hf_cfg)
    params = checkpoint.load_hf_state_dict(
        model.state_dict(), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, (2, seq))
    with torch.no_grad():
        ref = model(torch.from_numpy(toks)).logits.numpy()
    cos, sin = llama.rope_tables(cfg)
    hkv, dpad = cfg.kv_cache_dims()
    cache = contiguous.init_cache(
        cfg.num_layers, 2, hkv, cfg.max_seq_len, dpad, dtype=jnp.float32)
    ours, cache = llama.prefill(
        params, cache, jnp.asarray(toks, jnp.int32),
        jnp.full((2,), seq, jnp.int32), cos, sin, cfg)
    np.testing.assert_allclose(
        np.asarray(ours), ref[:, -1], atol=3e-4, rtol=2e-3)
    nxt = ref[:, -1].argmax(-1)
    with torch.no_grad():
        ref2 = model(torch.from_numpy(
            np.concatenate([toks, nxt[:, None]], 1))).logits.numpy()[:, -1]
    ours2, _ = llama.decode_step(
        params, cache, jnp.asarray(nxt, jnp.int32), cos, sin, cfg)
    np.testing.assert_allclose(np.asarray(ours2), ref2, atol=3e-4, rtol=2e-3)
    return cfg


def test_mla_matches_hf_forward_direct_q():
    hf_cfg, model = _hf_deepseek(q_lora_rank=None)
    cfg = _assert_matches(hf_cfg, model)
    assert cfg.mla and cfg.q_lora_rank is None
    assert cfg.head_dim == 24 and cfg.query_scale == 24.0
    # cache row: one shared 128-lane-padded latent row per token
    assert cfg.kv_cache_dims() == (1, 128)


def test_mla_matches_hf_forward_q_lora():
    hf_cfg, model = _hf_deepseek(q_lora_rank=48, seed=9)
    cfg = _assert_matches(hf_cfg, model)
    assert cfg.q_lora_rank == 48


def _tiny_mla_cfg(**kw):
    base = dict(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_q_heads=4, num_kv_heads=1, head_dim=24, max_seq_len=64,
        dtype="float32", num_splits=1, block_k=16, mla=True,
        kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
        v_head_dim=16, query_scale=24.0,
    )
    base.update(kw)
    return ModelConfig(**base)


def test_mla_engine_matches_generate(rng):
    cfg = _tiny_mla_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    from starflashattention_tpu.serving import Engine

    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
    lens = jnp.asarray([6, 4], jnp.int32)
    want = llama.generate(params, cfg, toks, lens, max_new_tokens=5)
    eng = Engine(params, cfg, num_slots=2, steps_per_round=2)
    got = eng.generate(
        [[int(t) for t in np.asarray(toks)[0]],
         [int(t) for t in np.asarray(toks)[1][:4]]], max_new_tokens=5)
    assert got == [list(r) for r in np.asarray(want).tolist()]


def _hf_deepseek_moe(seed=11, **over):
    kw = dict(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, moe_layer_freq=1, topk_method="greedy",
        norm_topk_prob=False, routed_scaling_factor=1.5,
        aux_loss_alpha=0.0, seq_aux=False,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    kw.update(over)
    hf_cfg = transformers.DeepseekV2Config(**kw)
    torch.manual_seed(seed)
    return hf_cfg, transformers.DeepseekV2ForCausalLM(hf_cfg).eval()


def test_mla_moe_matches_hf_forward():
    """DeepSeek-V2 MoE flavor: greedy gate (softmax-all → top-k,
    unnormalized, × routed_scaling_factor), shared experts, and a
    first_k_dense_replace dense layer — prefill + decode match HF exactly.
    modeling_deepseek_v2.DeepseekV2MoEGate / DeepseekV2MoE."""
    hf_cfg, model = _hf_deepseek_moe()
    cfg = _assert_matches(hf_cfg, model)
    assert cfg.num_experts == 8 and cfg.num_experts_per_tok == 2
    assert cfg.n_shared_experts == 1 and cfg.first_k_dense == 1
    assert cfg.dense_inter_size == 128 and cfg.intermediate_size == 32
    assert cfg.router_pre_softmax and cfg.routed_scaling_factor == 1.5


def test_mla_moe_no_dense_first():
    """Every-layer-routed variant (first_k_dense_replace=0; HF's
    DeepseekV2MoE.forward requires shared_experts so those stay)."""
    hf_cfg, model = _hf_deepseek_moe(
        seed=12, first_k_dense_replace=0, n_shared_experts=2,
        routed_scaling_factor=1.0, num_hidden_layers=2)
    cfg = _assert_matches(hf_cfg, model)
    assert cfg.n_shared_experts == 2 and cfg.first_k_dense == 0


def test_mla_moe_engine_matches_generate(rng):
    cfg = _tiny_mla_cfg(
        num_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense=1, dense_inter_size=48, router_pre_softmax=True,
        routed_scaling_factor=1.5)
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    from starflashattention_tpu.serving import Engine

    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
    lens = jnp.asarray([6, 5], jnp.int32)
    want = llama.generate(params, cfg, toks, lens, max_new_tokens=5)
    eng = Engine(params, cfg, num_slots=2, steps_per_round=2)
    got = eng.generate(
        [[int(t) for t in np.asarray(toks)[0]],
         [int(t) for t in np.asarray(toks)[1][:5]]], max_new_tokens=5)
    assert got == [list(r) for r in np.asarray(want).tolist()]


def test_mla_paged_engine_matches_contiguous(rng):
    """MLA on the paged pool: the pages hold the shared padded latent rows
    (1 'head' of kv_cache_dims width) and the MQA paged kernels serve them —
    token stream identical to the contiguous engine."""
    from starflashattention_tpu.serving import Engine, PagedEngine

    for cfg in (
        _tiny_mla_cfg(),
        _tiny_mla_cfg(  # the MoE flavor through the paged path too
            num_experts=4, num_experts_per_tok=2, n_shared_experts=1,
            first_k_dense=1, dense_inter_size=48, router_pre_softmax=True),
    ):
        params = llama.init_params(cfg, jax.random.PRNGKey(1))
        prompts = [
            [int(t) for t in rng.integers(0, cfg.vocab_size, 7)],
            [int(t) for t in rng.integers(0, cfg.vocab_size, 4)],
        ]
        want = Engine(params, cfg, num_slots=2, steps_per_round=2).generate(
            prompts, max_new_tokens=6)
        got = PagedEngine(
            params, cfg, num_slots=2, steps_per_round=2, page_size=16
        ).generate(prompts, max_new_tokens=6)
        assert got == want


def test_mla_moe_quantized_weights_match_dequantized_twin(rng):
    """Weight-only INT8 on an MLA+MoE model: wo and the routed expert
    stacks quantize (the MLA latent projections and the dense-first /
    shared-expert stacks stay dense — they are a small fraction of
    DeepSeek's bytes, the experts dominate); the greedy stream must match
    an explicitly dequantized dense twin."""
    from starflashattention_tpu.core import quant as _quant
    from starflashattention_tpu.serving import Engine

    cfg = _tiny_mla_cfg(
        num_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense=1, dense_inter_size=48, router_pre_softmax=True)
    pq = llama.quantize_model_weights(
        llama.init_params(cfg, jax.random.PRNGKey(5)), "int8")
    assert isinstance(pq["layers"]["wo"], dict)  # quantized
    assert isinstance(pq["layers"]["moe_gate_up"], dict)
    assert "w" not in pq["layers"]["dense_mlp"]  # side stack stays dense
    dq_layers = {
        k: (_quant.dequantize_weight(v, jnp.float32)
            if isinstance(v, dict) and "scale" in v else v)
        for k, v in pq["layers"].items()
    }
    pdq = dict(pq)
    pdq["layers"] = dq_layers
    prompts = [[int(t) for t in rng.integers(0, cfg.vocab_size, 7)]
               for _ in range(2)]
    got_q = Engine(pq, cfg, num_slots=2, steps_per_round=2).generate(
        [list(p) for p in prompts], max_new_tokens=6)
    got_dq = Engine(pdq, cfg, num_slots=2, steps_per_round=2).generate(
        [list(p) for p in prompts], max_new_tokens=6)
    assert got_q == got_dq


def test_mla_guards():
    cfg = _tiny_mla_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    from starflashattention_tpu.serving import Engine

    with pytest.raises(NotImplementedError, match="MLA"):
        Engine(params, cfg, num_slots=2, spec_decode=2)
    with pytest.raises(ValueError, match="MLA"):
        _tiny_mla_cfg(quant_mode="int8")
    with pytest.raises(ValueError, match="head_dim"):
        _tiny_mla_cfg(head_dim=32)
    # V2-big's group-limited expert selection is rejected at conversion
    hf_cfg = transformers.DeepseekV2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        kv_lora_rank=16, qk_nope_head_dim=8, qk_rope_head_dim=4,
        v_head_dim=8, n_routed_experts=4,
        topk_method="group_limited_greedy", n_group=2, topk_group=1,
    )
    with pytest.raises(ValueError, match="group_limited"):
        checkpoint.config_from_hf(hf_cfg)
    # MoE knobs without experts are rejected at config construction
    with pytest.raises(ValueError, match="MoE knobs"):
        _tiny_mla_cfg(n_shared_experts=1)
    with pytest.raises(ValueError, match="dense_inter_size"):
        _tiny_mla_cfg(num_experts=4, first_k_dense=1)


def test_mla_cache_footprint():
    """The point of MLA: the cache row is kv_lora_rank + rope (+ lane pad)
    per token — at DeepSeek-V2 scale, 640 vs the 2*128*Hkv an equivalent
    GQA model stores (3.2x capacity at Hkv=8, 12.8x vs the unabsorbed MHA
    K+V of 2*Hq*(192+128) at Hq=16)."""
    cfg = ModelConfig(
        hidden_size=2048, num_q_heads=16, num_kv_heads=1, head_dim=192,
        mla=True, kv_lora_rank=512, qk_nope_head_dim=128,
        qk_rope_head_dim=64, v_head_dim=128, num_splits=1,
    )
    assert cfg.kv_cache_dims() == (1, 640)
