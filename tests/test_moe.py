"""Mixture-of-experts MLP (Mixtral-style) + expert parallelism.

The reference is a dense-Llama decode kernel repo with no MoE; this is a new
model-family capability. Oracles: (a) a tiny random HF MixtralForCausalLM
forward (cross-ecosystem), (b) exact equivalence of a 1-expert MoE to the
dense model, (c) a hand-rolled per-token loop over the routed experts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.serving.engine import Engine

MOE_CFG = dict(
    dtype="float32", num_splits=1, num_experts=4, num_experts_per_tok=2,
    num_q_heads=8, num_kv_heads=4,
)


def test_moe_mlp_matches_per_token_loop(rng):
    """_moe_mlp (batched all-experts + dense routing weights) == a literal
    per-token top-k loop."""
    cfg = ModelConfig.tiny(**MOE_CFG)
    h, inter, e, k = 64, cfg.intermediate_size, cfg.num_experts, 2
    lp = {
        "moe_router": jnp.asarray(rng.standard_normal((h, e)), jnp.float32),
        "moe_gate_up": jnp.asarray(
            rng.standard_normal((e, h, 2 * inter)), jnp.float32
        ),
        "moe_down": jnp.asarray(rng.standard_normal((e, inter, h)), jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((5, h)), jnp.float32)
    out = llama._moe_mlp(x, lp, cfg)

    r = np.asarray(x) @ np.asarray(lp["moe_router"])  # (5, E)
    expect = np.zeros((5, h), np.float32)
    for t in range(5):
        idx = np.argsort(r[t])[::-1][:k]
        w = np.exp(r[t, idx] - r[t, idx].max())
        w = w / w.sum()
        for j, ei in enumerate(idx):
            gu = np.asarray(x[t]) @ np.asarray(lp["moe_gate_up"][ei])
            gate, up = gu[:inter], gu[inter:]
            act = gate / (1 + np.exp(-gate)) * up
            expect[t] += w[j] * (act @ np.asarray(lp["moe_down"][ei]))
    np.testing.assert_allclose(np.asarray(out), expect, atol=2e-4, rtol=2e-4)


def test_single_expert_moe_equals_dense():
    """E=1/top-1 routing is a softmax-of-one (weight 1.0) → bit-comparable to
    the dense model holding the same expert weights."""
    cfg1 = ModelConfig.tiny(dtype="float32", num_splits=1, num_experts=1,
                            num_experts_per_tok=1)
    p1 = llama.init_params(cfg1, jax.random.PRNGKey(3), dtype=jnp.float32)
    cfgd = ModelConfig.tiny(dtype="float32", num_splits=1)
    pd = jax.tree.map(lambda x: x, p1)
    pd["layers"] = dict(pd["layers"])
    pd["layers"]["w_gate_up"] = pd["layers"].pop("moe_gate_up")[:, 0]
    pd["layers"]["w_down"] = pd["layers"].pop("moe_down")[:, 0]
    del pd["layers"]["moe_router"]
    prompts = [[1, 2, 3], [7, 8, 9, 1]]
    o1 = Engine(p1, cfg1, num_slots=2, steps_per_round=2).generate(
        prompts, max_new_tokens=8)
    od = Engine(pd, cfgd, num_slots=2, steps_per_round=2).generate(
        prompts, max_new_tokens=8)
    assert o1 == od


def test_moe_engine_serving_roundtrip():
    cfg = ModelConfig.tiny(**MOE_CFG)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = Engine(params, cfg, num_slots=3, steps_per_round=2)
    outs = eng.generate([[1, 2, 3, 4], [5, 6], [9, 9, 9]], max_new_tokens=6)
    assert all(len(o) == 6 for o in outs)
    assert eng.stats.finished == 3


def test_moe_expert_parallel_engine_matches_single_chip(mesh8):
    """EP: experts sharded over the model axis (2 experts/chip on a 4-wide
    axis), batch over data — greedy streams match the single-chip engine."""
    cfg = ModelConfig.tiny(**MOE_CFG)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompts = [[1, 2, 3, 4], [5, 6]]
    ref = Engine(params, cfg, num_slots=2, steps_per_round=2).generate(
        prompts, max_new_tokens=6)
    eng = Engine(params, cfg, num_slots=2, steps_per_round=2, mesh=mesh8)
    assert eng.generate(prompts, max_new_tokens=6) == ref


def test_moe_fully_quantized_serves_and_matches_sharded(mesh8):
    """quantize_model_weights on an MoE model quantizes wqkv/wo AND the
    expert stacks (per-expert {"w","scale"} dicts); the fully-quantized model
    serves, and the EP-sharded engine's token streams match single-chip."""
    cfg = ModelConfig.tiny(**MOE_CFG)
    params = llama.quantize_model_weights(
        llama.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    )
    assert isinstance(params["layers"]["wqkv"], dict)
    assert isinstance(params["layers"]["moe_gate_up"], dict)
    # per-expert per-output-channel scales: (L, E, 2I)
    L, E = cfg.num_layers, cfg.num_experts
    assert params["layers"]["moe_gate_up"]["scale"].shape == (
        L, E, 2 * cfg.intermediate_size
    )
    assert params["layers"]["moe_down"]["w"].dtype == jnp.int8
    prompts = [[1, 2, 3], [4, 5, 6, 7]]
    ref = Engine(params, cfg, num_slots=2, steps_per_round=2).generate(
        prompts, max_new_tokens=5)
    assert all(len(o) == 5 for o in ref)
    eng = Engine(params, cfg, num_slots=2, steps_per_round=2, mesh=mesh8)
    assert eng.generate(prompts, max_new_tokens=5) == ref


def test_quantized_experts_match_dequantized_oracle(rng):
    """The stacked per-expert quant_matmul path == the dense MoE path run on
    the DEQUANTIZED expert weights (same math, kernel dequant fused)."""
    from starflashattention_tpu.core import quant

    cfg = ModelConfig.tiny(**MOE_CFG)
    h, inter, e = 64, cfg.intermediate_size, cfg.num_experts
    L = 2
    router = jnp.asarray(rng.standard_normal((L, h, e)), jnp.float32)
    wg = jnp.asarray(rng.standard_normal((L, e, h, 2 * inter)), jnp.float32)
    wd = jnp.asarray(rng.standard_normal((L, e, inter, h)), jnp.float32)
    wg_q = llama._quantize_stacked(wg + 0, "int8")
    wd_q = llama._quantize_stacked(wd + 0, "int8")
    x = jnp.asarray(rng.standard_normal((5, h)), jnp.float32)

    for lidx in range(L):
        out_q = llama._moe_mlp(
            x, {"moe_router": router[lidx]}, cfg,
            layers={"moe_gate_up": wg_q, "moe_down": wd_q},
            lidx=jnp.int32(lidx),
        )
        lp_deq = {
            "moe_router": router[lidx],
            "moe_gate_up": quant.dequantize_weight(
                {"w": wg_q["w"][lidx], "scale": wg_q["scale"][lidx]}
            ),
            "moe_down": quant.dequantize_weight(
                {"w": wd_q["w"][lidx], "scale": wd_q["scale"][lidx]}
            ),
        }
        out_d = llama._moe_mlp(x, lp_deq, cfg)
        np.testing.assert_allclose(
            np.asarray(out_q), np.asarray(out_d), atol=2e-4, rtol=2e-4
        )


def test_quantized_moe_pp_dryrun():
    """Quantized expert stacks compose with pipeline parallelism: the
    {"w","scale"} (L, E, ...) stacks pipe their leading axis like any layer
    param and the PP step's logits match single-chip."""
    from starflashattention_tpu.cache import contiguous
    from starflashattention_tpu.parallel import pp
    from starflashattention_tpu.parallel.mesh import make_mesh

    cfg = ModelConfig.tiny(
        dtype="float32", num_splits=1, num_experts=2, num_experts_per_tok=1,
        num_layers=4,
    )
    params = llama.quantize_model_weights(
        llama.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    )
    cos, sin = llama.rope_tables(cfg)
    b = 4
    cache = contiguous.init_cache(
        cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    tok = jnp.ones((b,), jnp.int32)
    ref_logits, _ = llama.decode_step(
        params, jax.tree.map(lambda x: x + 0 if hasattr(x, "dtype") else x, cache),
        tok, cos, sin, cfg,
    )

    mesh = make_mesh({"pipe": 4}, devices=jax.devices()[:4])
    pcache = pp.shard_cache_pp(cache, mesh)
    step = pp.make_pp_decode_step(mesh, cfg, params, num_microbatches=2)
    logits, _ = step(pp.shard_params_pp(params, mesh), pcache, tok, cos, sin)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), atol=1e-5, rtol=1e-5
    )


def test_mixtral_preset():
    m = ModelConfig.mixtral_8x7b()
    assert m.num_experts == 8 and m.num_experts_per_tok == 2
    assert m.num_kv_heads == 8 and m.intermediate_size == 14336
    m.attention()


# ---------------------------------------------------------------------------
# Cross-ecosystem: tiny random HF Mixtral vs our prefill/decode logits.
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from starflashattention_tpu.cache import contiguous  # noqa: E402
from starflashattention_tpu.models import checkpoint  # noqa: E402


def test_mixtral_checkpoint_matches_hf_forward():
    hf_cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=1e6,
        tie_word_embeddings=False, sliding_window=None,
        attn_implementation="eager",
    )
    torch.manual_seed(3)
    model = transformers.MixtralForCausalLM(hf_cfg).eval()
    cfg = checkpoint.config_from_hf(hf_cfg)
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    params = checkpoint.load_hf_state_dict(model.state_dict(), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, (2, 9))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()

    cos, sin = llama.rope_tables(cfg)
    cache = contiguous.init_cache(
        cfg.num_layers, 2, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    ours, cache = llama.prefill(
        params, cache, jnp.asarray(toks, jnp.int32),
        jnp.full((2,), 9, jnp.int32), cos, sin, cfg,
    )
    np.testing.assert_allclose(np.asarray(ours), hf_logits[:, -1], atol=5e-4, rtol=5e-3)

    nxt = hf_logits[:, -1].argmax(-1)
    with torch.no_grad():
        hf2 = model(
            torch.from_numpy(np.concatenate([toks, nxt[:, None]], axis=1))
        ).logits.numpy()[:, -1]
    ours2, _ = llama.decode_step(
        params, cache, jnp.asarray(nxt, jnp.int32), cos, sin, cfg
    )
    np.testing.assert_allclose(np.asarray(ours2), hf2, atol=5e-4, rtol=5e-3)


def test_init_params_quantize_matches_posthoc_structure():
    """init_params(quantize=...) generates the big stacks layer-by-layer
    directly in quantized form (the only way Mixtral-geometry fits in HBM:
    dense bf16 init at depth 8 is ~23 GB vs 16 GB on a v5e) — the resulting
    pytree must match quantize_model_weights(init_params(...), consume=True)
    in structure, shapes, and dtypes, and must serve."""
    cfg = ModelConfig.tiny(**MOE_CFG)
    direct = llama.init_params(cfg, jax.random.PRNGKey(0), quantize="int8")
    posthoc = llama.quantize_model_weights(
        llama.init_params(cfg, jax.random.PRNGKey(0)), "int8", consume=True)
    assert jax.tree.structure(direct) == jax.tree.structure(posthoc)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(direct),
        jax.tree_util.tree_leaves_with_path(posthoc),
    ):
        assert p1 == p2 and l1.shape == l2.shape and l1.dtype == l2.dtype
    # dense family takes the same path through w_gate_up/w_down
    cfg_d = ModelConfig.tiny(dtype="float32", num_splits=1)
    d_direct = llama.init_params(cfg_d, jax.random.PRNGKey(1), quantize="int8")
    d_post = llama.quantize_model_weights(
        llama.init_params(cfg_d, jax.random.PRNGKey(1)), "int8", consume=True)
    assert jax.tree.structure(d_direct) == jax.tree.structure(d_post)
    outs = Engine(direct, cfg, num_slots=2, steps_per_round=2).generate(
        [[1, 2, 3], [4, 5]], max_new_tokens=4)
    assert all(len(o) == 4 for o in outs)
