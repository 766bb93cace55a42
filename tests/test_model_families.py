"""Model-family capabilities: sliding-window attention (Mistral-style) and
fused-QKV bias (Qwen2-style), kernel-vs-reference and engine round-trips.

The reference repo is Llama-decode-only; its API *accepts* q/k/v biases but
never applies them (/root/reference/flash_api.cpp:8-9, SURVEY.md §2.9h) and
has no local-attention support. These are the intended-behavior extensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.core import reference
from starflashattention_tpu.models import llama
from starflashattention_tpu.ops.flash_decode import flash_decode, flash_verify
from starflashattention_tpu.ops.flash_prefill import flash_prefill
from starflashattention_tpu.runtime.params import ModelConfig


def test_decode_kernel_sliding_window_matches_reference(rng):
    b, hq, hkv, s, d = 4, 8, 2, 256, 16
    w = 64
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    lengths = jnp.asarray([256, 100, 64, 3], jnp.int32)
    out = flash_decode(q, k, v, lengths, num_splits=1, block_k=64, window=w)
    ref = reference.decode_reference(q, k, v, lengths, sliding_window=w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_decode_kernel_window_with_hint(rng):
    b, hq, hkv, s, d = 2, 4, 2, 512, 16
    w = 128
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    lengths = jnp.asarray([300, 410], jnp.int32)
    out = flash_decode(
        q, k, v, lengths, num_splits=1, block_k=64, window=w, max_len_hint=448
    )
    ref = reference.decode_reference(q, k, v, lengths, sliding_window=w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_decode_kernel_window_rejects_splits(rng):
    q = jnp.zeros((2, 4, 16), jnp.float32)
    k = jnp.zeros((2, 2, 512, 16), jnp.float32)
    with pytest.raises(ValueError, match="sliding-window"):
        flash_decode(
            q, k, k, jnp.asarray([9, 9], jnp.int32),
            num_splits=4, block_k=64, window=64,
        )


def test_prefill_kernel_sliding_window_matches_reference(rng):
    b, hq, hkv, sq, skv, d = 2, 4, 2, 128, 256, 16
    w = 48
    q = jnp.asarray(rng.standard_normal((b, hq, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, skv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, skv, d)), jnp.float32)
    lengths = jnp.asarray([256, 190], jnp.int32)
    offs = jnp.asarray([128, 62], jnp.int32)  # chunked-prefill offsets
    out = flash_prefill(
        q, k, v, lengths, causal=True, q_offsets=offs, window=w,
        block_q=64, block_k=64,
    )
    ref = reference.mha_reference(
        q, k, v, lengths=lengths, causal=True, q_offset=offs, sliding_window=w
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_verify_kernel_sliding_window_matches_reference(rng):
    """flash_verify with a window == per-row reference with the staircase
    offsets (row j sits at position lengths - 1 + j)."""
    b, hq, hkv, s, d, t = 2, 4, 2, 256, 16, 3
    w = 32
    q = jnp.asarray(rng.standard_normal((b, hq, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    lengths = jnp.asarray([100, 57], jnp.int32)
    out = flash_verify(q, k, v, lengths, block_k=64, window=w)
    # reference: q rows are a causal chunk starting at lengths - 1
    qt = q.transpose(0, 1, 2, 3)  # (B, Hq, T, D) already
    ref = reference.mha_reference(
        qt, k, v,
        lengths=lengths + t - 1,  # row j may see up to lengths + j rows
        causal=True, q_offset=lengths - 1, sliding_window=w,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_windowed_engine_matches_wide_window():
    """A window >= every sequence length is identical to full attention; a
    small window changes the stream (sanity that masking is live)."""
    from starflashattention_tpu.serving.engine import Engine

    prompts = [[7, 8, 9, 7, 8, 9], [3, 4, 3, 4, 3], [5, 5, 5, 5, 2, 1]]
    outs = {}
    for w in (None, 128, 8):
        cfg = ModelConfig.tiny(dtype="float32", num_splits=1, sliding_window=w)
        params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        eng = Engine(params, cfg, num_slots=3, steps_per_round=4)
        outs[w] = eng.generate(prompts, max_new_tokens=16)
    assert outs[None] == outs[128]  # window wider than anything reachable
    assert outs[8] != outs[None]  # a tight window really masks


def test_qkv_bias_applied_and_tp_bit_matched(mesh8):
    """attention_bias=True: bias changes the stream, and the TP-sharded
    engine (bias columns sharded with wqkv) bit-matches single-chip."""
    from starflashattention_tpu.serving.engine import Engine

    cfg = ModelConfig.tiny(
        num_q_heads=8, num_kv_heads=4, dtype="float32", num_splits=1,
        attention_bias=True,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    assert "bqkv" in params["layers"]
    prompts = [[7, 8, 9, 7], [3, 4, 3], [1, 2, 3, 4, 5], [5, 5]]

    single = Engine(params, cfg, num_slots=4, steps_per_round=2)
    ref = single.generate(prompts, max_new_tokens=10)

    # bias really feeds the math
    params0 = jax.tree.map(lambda x: x, params)
    params0["layers"] = dict(params0["layers"])
    params0["layers"]["bqkv"] = jnp.zeros_like(params["layers"]["bqkv"])
    zero = Engine(params0, cfg, num_slots=4, steps_per_round=2)
    assert zero.generate(prompts, max_new_tokens=10) != ref

    sharded = Engine(params, cfg, num_slots=4, steps_per_round=2, mesh=mesh8)
    assert sharded.generate(prompts, max_new_tokens=10) == ref


def test_paged_engine_serves_sliding_window():
    """The paged backend serves windowed models (band-shifted page walk +
    rolling-buffer reclamation); full parity/reclamation coverage lives in
    tests/test_serving_paged.py."""
    from starflashattention_tpu.serving.engine import PagedEngine

    cfg = ModelConfig.tiny(dtype="float32", num_splits=1, sliding_window=32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = PagedEngine(params, cfg, num_slots=2, steps_per_round=2)
    out = eng.generate([[1, 2, 3]], max_new_tokens=4)
    assert len(out[0]) == 4


def test_model_family_presets():
    m = ModelConfig.mistral_7b()
    assert m.sliding_window == 4096 and m.intermediate_size == 14336
    q = ModelConfig.qwen2_7b()
    assert q.attention_bias and q.num_q_heads == 28 and q.num_kv_heads == 4
    l3 = ModelConfig.llama3_8b()
    assert l3.rope_base == 5e5 and l3.vocab_size == 128256
    g = ModelConfig.gemma_7b()
    assert g.mlp_activation == "gelu_tanh" and g.embed_scale
    assert g.tie_embeddings and g.head_dim == 256
    g2 = ModelConfig.gemma2_9b()
    assert g2.attn_softcap == 50.0 and g2.final_softcap == 30.0
    assert g2.sliding_window_pattern == 2 and g2.post_norms
    assert g2.sm_scale() == 256.0**-0.5
    p3 = ModelConfig.phi3_medium()
    assert p3.num_q_heads == 40 and p3.num_kv_heads == 10
    ds = ModelConfig.deepseek_v2_lite()
    assert ds.mla and ds.num_experts == 64 and ds.n_shared_experts == 2
    assert ds.first_k_dense == 1 and ds.router_pre_softmax
    # the absorbed latent row: 512 + 64 lanes, padded to the 128-lane grid
    assert ds.kv_cache_dims() == (1, 640)
    # geometry sanity: all presets produce a valid attention config
    for cfg in (m, q, l3, g, g2, p3, ds):
        cfg.attention()


# ---------------------------------------------------------------------------
# Cross-ecosystem numerics: tiny random HF Qwen2/Mistral models (torch CPU,
# offline) vs our prefill+decode — same contract as tests/test_checkpoint.py
# but for the families whose features (QKV bias, sliding window) the
# reference's API accepted-but-ignored or lacked entirely.
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from starflashattention_tpu.cache import contiguous  # noqa: E402
from starflashattention_tpu.models import checkpoint  # noqa: E402


def _assert_matches_hf(hf_cfg, model, seq: int = 9):
    cfg = checkpoint.config_from_hf(hf_cfg)
    params = checkpoint.load_hf_state_dict(model.state_dict(), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, (2, seq))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()

    cos, sin = llama.rope_tables(cfg)
    cache = contiguous.init_cache(
        cfg.num_layers, 2, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    ours, cache = llama.prefill(
        params, cache, jnp.asarray(toks, jnp.int32),
        jnp.full((2,), seq, jnp.int32), cos, sin, cfg,
    )
    np.testing.assert_allclose(np.asarray(ours), hf_logits[:, -1], atol=3e-4, rtol=2e-3)

    nxt = hf_logits[:, -1].argmax(-1)
    with torch.no_grad():
        hf2 = model(
            torch.from_numpy(np.concatenate([toks, nxt[:, None]], axis=1))
        ).logits.numpy()[:, -1]
    ours2, _ = llama.decode_step(
        params, cache, jnp.asarray(nxt, jnp.int32), cos, sin, cfg
    )
    np.testing.assert_allclose(np.asarray(ours2), hf2, atol=3e-4, rtol=2e-3)
    return cfg


def test_qwen2_checkpoint_matches_hf_forward():
    hf_cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=1e6,
        tie_word_embeddings=False, use_sliding_window=False,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    cfg = _assert_matches_hf(hf_cfg, model)
    assert cfg.attention_bias and cfg.sliding_window is None


def test_mistral_checkpoint_matches_hf_forward():
    hf_cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, sliding_window=6,
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    model = transformers.MistralForCausalLM(hf_cfg).eval()
    # seq=9 > window=6, so the window mask is live in both implementations
    cfg = _assert_matches_hf(hf_cfg, model)
    assert cfg.sliding_window == 6 and not cfg.attention_bias


def test_gemma_checkpoint_matches_hf_forward():
    """Gemma family: GeGLU MLP, sqrt(hidden)-scaled embeddings, (1+w)
    RMSNorm convention (folded into stored weights at load), tied lm_head,
    head_dim independent of hidden/heads — prefill AND the cache round-trip
    decode step must reproduce transformers' logits."""
    hf_cfg = transformers.GemmaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=24, max_position_embeddings=128, rms_norm_eps=1e-6,
        rope_theta=10000.0, attn_implementation="eager",
    )
    torch.manual_seed(3)
    model = transformers.GemmaForCausalLM(hf_cfg).eval()
    cfg = _assert_matches_hf(hf_cfg, model)
    assert cfg.mlp_activation == "gelu_tanh"
    assert cfg.embed_scale and cfg.norm_plus_one and cfg.tie_embeddings
    assert cfg.head_dim == 24 and cfg.num_kv_heads == 1  # MQA


def test_gemma_serves_and_trains(rng):
    """The Gemma flags flow through serving (Engine greedy == llama.generate)
    and the training twin (forward_train last-token logits == prefill's)."""
    import dataclasses

    from starflashattention_tpu.models.train import forward_train
    from starflashattention_tpu.serving import Engine

    cfg = ModelConfig.gemma_7b(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_q_heads=2, num_kv_heads=1, head_dim=16, max_seq_len=64,
        dtype="float32", num_splits=1, block_k=16,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 5)), jnp.int32)
    lens = jnp.asarray([5], jnp.int32)
    want = llama.generate(params, cfg, toks, lens, max_new_tokens=4)

    eng = Engine(params, cfg, num_slots=1, steps_per_round=2)
    got = eng.generate([[int(t) for t in np.asarray(toks)[0]]], max_new_tokens=4)
    assert got[0] == [int(t) for t in np.asarray(want)[0]]

    cos, sin = llama.rope_tables(cfg)
    lg_train = forward_train(params, toks, cfg, cos, sin, use_flash=False)
    from starflashattention_tpu.cache import contiguous as _contig

    cache = _contig.init_cache(
        cfg.num_layers, 1, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32)
    lg_serve, _ = llama.prefill(params, cache, toks, lens, cos, sin, cfg)
    np.testing.assert_allclose(
        np.asarray(lg_train[:, -1]), np.asarray(lg_serve), atol=2e-4, rtol=2e-3)

    # the flags provably matter: silu/unscaled twin diverges
    cfg_plain = dataclasses.replace(
        cfg, mlp_activation="silu", embed_scale=False)
    lg_plain, _ = llama.prefill(
        params,
        _contig.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                           cfg.max_seq_len, cfg.head_dim, dtype=jnp.float32),
        toks, lens, cos, sin, cfg_plain)
    assert float(jnp.max(jnp.abs(lg_plain - lg_serve))) > 1e-3


def test_gemma2_checkpoint_matches_hf_forward():
    """Gemma-2: everything Gemma v1 has PLUS attention-score softcapping
    (in-kernel tanh cap), final logit softcapping, query_pre_attn_scalar
    score scaling, post-norms (4 norms/layer), and ALTERNATING sliding/full
    attention layers (per-layer TRACED window under one scan). 4 layers so
    both layer kinds run twice; window 6 < seq 9 so the band is live."""
    hf_cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
        rope_theta=10000.0, sliding_window=6,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        query_pre_attn_scalar=12, attn_implementation="eager",
    )
    torch.manual_seed(4)
    model = transformers.Gemma2ForCausalLM(hf_cfg).eval()
    cfg = _assert_matches_hf(hf_cfg, model)
    assert cfg.attn_softcap == 50.0 and cfg.final_softcap == 30.0
    assert cfg.query_scale == 12.0 and cfg.post_norms
    assert cfg.sliding_window == 6 and cfg.sliding_window_pattern == 2


def test_gemma2_serves_paged_and_verify(rng):
    """The Gemma-2 flags flow through BOTH engines (contiguous == paged
    greedy streams) and the spec-verify kernel path (spec engine stream ==
    plain engine stream) — i.e. softcap + alternating windows + post-norms
    work in flash_decode, paged_flash_decode, flash_prefill, and
    flash_verify."""
    from starflashattention_tpu.serving import Engine, PagedEngine

    cfg = ModelConfig.gemma2_9b(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=4,
        num_q_heads=2, num_kv_heads=1, head_dim=16, max_seq_len=64,
        dtype="float32", block_k=16, sliding_window=8,
        pages_per_compute_block=2,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    prompts = [[int(t) for t in rng.integers(0, cfg.vocab_size, 12)]
               for _ in range(2)]

    eng = Engine(params, cfg, num_slots=2, steps_per_round=2)
    want = eng.generate([list(p) for p in prompts], max_new_tokens=6)

    peng = PagedEngine(params, cfg, num_slots=2, steps_per_round=2,
                       page_size=16)
    got_p = peng.generate([list(p) for p in prompts], max_new_tokens=6)
    assert got_p == want

    seng = Engine(params, cfg, num_slots=2, steps_per_round=2, spec_decode=2)
    got_s = seng.generate([list(p) for p in prompts], max_new_tokens=6)
    assert got_s == want


def test_gemma2_trains_via_jnp_twin(rng):
    """Gemma-2 TRAINING: the jnp twin handles softcap + alternating windows
    + post-norms differentiably — last-token logits equal the serving
    prefill's, gradients are finite, and the flash path refuses loudly."""
    from starflashattention_tpu.cache import contiguous as _contig
    from starflashattention_tpu.models.train import forward_train, loss_fn

    cfg = ModelConfig.gemma2_9b(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=4,
        num_q_heads=2, num_kv_heads=1, head_dim=16, max_seq_len=64,
        dtype="float32", block_k=16, sliding_window=8,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(2))
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 17)), jnp.int32)
    cos, sin = llama.rope_tables(cfg)

    lg_train = forward_train(params, toks, cfg, cos, sin, use_flash=False)
    cache = _contig.init_cache(
        cfg.num_layers, 2, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32)
    lg_serve, _ = llama.prefill(
        params, cache, toks, jnp.full((2,), 17, jnp.int32), cos, sin, cfg)
    np.testing.assert_allclose(
        np.asarray(lg_train[:, -1]), np.asarray(lg_serve),
        atol=3e-4, rtol=2e-3)

    batch = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 17)), jnp.int32)
    loss, grads = jax.value_and_grad(loss_fn)(
        params, batch, cfg, cos, sin, use_flash=False)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree.leaves(grads))
    # post-norm weights receive gradient (they are live in the graph)
    assert float(jnp.max(jnp.abs(grads["layers"]["post_attn_norm"]))) > 0

    # the FLASH path trains Gemma-2 too: softcap rides the custom_vjp
    # (tanh chain rule in the bwd kernels) and the alternating window is a
    # lax.cond over the two compiled variants — grads match the jnp twin
    loss_f, grads_f = jax.value_and_grad(loss_fn)(
        params, batch, cfg, cos, sin, use_flash=True)
    assert abs(float(loss_f) - float(loss)) < 1e-5
    err = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(grads_f), jax.tree.leaves(grads))
    )
    assert err < 1e-5


def test_gemma2_tp_and_quantized_match_single_chip(rng, mesh8):
    """Gemma-2 under TENSOR PARALLELISM (post-norms replicated after the
    psum, softcap + traced per-layer windows inside the shard_map program)
    and with INT8 weights (GeGLU through the quantized projection path):
    both must reproduce the dense single-chip greedy stream."""
    from starflashattention_tpu.serving import Engine

    cfg = ModelConfig.gemma2_9b(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=4,
        num_q_heads=4, num_kv_heads=4, head_dim=16, max_seq_len=64,
        dtype="float32", block_k=16, sliding_window=8,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(1))
    prompts = [[int(t) for t in rng.integers(0, cfg.vocab_size, 10)]
               for _ in range(2)]

    eng = Engine(params, cfg, num_slots=2, steps_per_round=2)
    want = eng.generate([list(p) for p in prompts], max_new_tokens=6)

    teng = Engine(params, cfg, num_slots=2, steps_per_round=2, mesh=mesh8)
    got_tp = teng.generate([list(p) for p in prompts], max_new_tokens=6)
    assert got_tp == want

    # int8 weights: stream must match the DEQUANTIZED twin exactly (the
    # kernel's fused dequant vs an explicit dequant + dense run)
    pq = llama.quantize_model_weights(
        llama.init_params(cfg, jax.random.PRNGKey(1)), "int8")
    from starflashattention_tpu.core import quant as _quant

    dq_layers = {
        k: (_quant.dequantize_weight(v, jnp.float32)
            if isinstance(v, dict) else v)
        for k, v in pq["layers"].items()
    }
    pdq = dict(pq)
    pdq["layers"] = dq_layers
    eq = Engine(pq, cfg, num_slots=2, steps_per_round=2)
    edq = Engine(pdq, cfg, num_slots=2, steps_per_round=2)
    got_q = eq.generate([list(p) for p in prompts], max_new_tokens=6)
    got_dq = edq.generate([list(p) for p in prompts], max_new_tokens=6)
    assert got_q == got_dq


def test_phi3_checkpoint_matches_hf_forward():
    """Phi-3: FUSED qkv_proj / gate_up_proj checkpoints (read directly into
    this framework's fused layouts) — prefill + decode match transformers."""
    hf_cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, original_max_position_embeddings=64,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        attn_implementation="eager",
    )
    torch.manual_seed(5)
    model = transformers.Phi3ForCausalLM(hf_cfg).eval()
    assert "model.layers.0.self_attn.qkv_proj.weight" in model.state_dict()
    cfg = _assert_matches_hf(hf_cfg, model)
    assert cfg.rope_scaling is None


def test_phi3_longrope_matches_hf_forward():
    """Phi-3 longrope (su-scaling) in the LONG regime: original_max 16 <
    prompt length, so HF's runtime switch engages the long per-dim factors
    + the sqrt(1 + ln(s)/ln(orig)) attention mscale — the same regime our
    static table builds for max_seq_len > original_max."""
    half = 8  # head_dim 16 -> 8 factor entries
    hf_cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, original_max_position_embeddings=16,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        rope_scaling={
            "type": "longrope",
            "short_factor": [1.0 + 0.05 * i for i in range(half)],
            "long_factor": [2.0 + 0.25 * i for i in range(half)],
        },
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        attn_implementation="eager",
    )
    torch.manual_seed(6)
    model = transformers.Phi3ForCausalLM(hf_cfg).eval()
    cfg = _assert_matches_hf(hf_cfg, model, seq=20)  # 20 > orig_max 16
    assert cfg.rope_scaling is not None and cfg.rope_scaling[0] == "longrope"
    assert cfg.rope_scaling[1] == 16 and len(cfg.rope_scaling[3]) == half


def test_qwen3_moe_checkpoint_matches_hf_forward():
    """Qwen3-MoE: QK-norm + routed experts under mlp.experts.* keys; its
    softmax-all-then-top-k-renormalized routing is algebraically this
    framework's softmax-over-top-k (the partition function cancels), so
    logits must match transformers exactly through prefill AND decode."""
    hf_cfg = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=128, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, use_sliding_window=False,
        attn_implementation="eager",
    )
    torch.manual_seed(7)
    model = transformers.Qwen3MoeForCausalLM(hf_cfg).eval()
    cfg = _assert_matches_hf(hf_cfg, model)
    assert cfg.qk_norm and cfg.num_experts == 4
    assert cfg.intermediate_size == 96  # experts use moe_intermediate_size


def test_llama3_style_config_from_hf():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=5e5, attention_bias=False,
    )
    cfg = checkpoint.config_from_hf(hf_cfg)
    assert cfg.rope_base == 5e5 and not cfg.attention_bias
    assert cfg.sliding_window is None


def test_qk_norm_model_consistency(rng):
    """Qwen3-style QK-norm: (a) the norm provably changes logits, (b) decode
    continues prefill exactly (cache round-trip with normed k), (c) the
    training forward's last-token logits equal the serving prefill's, and
    (d) a hand-built jnp oracle reproduces the 1-layer attention output."""
    import dataclasses

    from starflashattention_tpu.cache import contiguous
    from starflashattention_tpu.core.reference import mha_reference
    from starflashattention_tpu.models.train import forward_train

    cfg = ModelConfig.tiny(
        dtype="float32", num_splits=1, num_q_heads=4, num_kv_heads=2,
        qk_norm=True,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    # non-trivial norm weights (init is ones = near-no-op scaling)
    params["layers"]["q_norm"] = jnp.asarray(
        rng.uniform(0.5, 1.5, params["layers"]["q_norm"].shape), jnp.float32
    )
    params["layers"]["k_norm"] = jnp.asarray(
        rng.uniform(0.5, 1.5, params["layers"]["k_norm"].shape), jnp.float32
    )
    cos, sin = llama.rope_tables(cfg)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 9)), jnp.int32)
    plens = jnp.full((2,), 9, jnp.int32)

    def fresh():
        return contiguous.init_cache(
            cfg.num_layers, 2, cfg.num_kv_heads, cfg.max_seq_len,
            cfg.head_dim, dtype=jnp.float32,
        )

    lg, cache = llama.prefill(params, fresh(), toks, plens, cos, sin, cfg)

    # (a) differs from the un-normed model with the same weights
    p0 = {**params, "layers": {k: v for k, v in params["layers"].items()
                               if k not in ("q_norm", "k_norm")}}
    cfg0 = dataclasses.replace(cfg, qk_norm=False)
    lg0, _ = llama.prefill(p0, fresh(), toks, plens, cos, sin, cfg0)
    assert float(jnp.max(jnp.abs(lg - lg0))) > 1e-6

    # (b) decode continues the prefilled cache (q-normed query vs k-normed
    # cached keys) and matches re-prefilling the extended sequence
    nxt = jnp.argmax(lg, -1).astype(jnp.int32)
    lg_d, _ = llama.decode_step(params, cache, nxt, cos, sin, cfg)
    toks_ext = jnp.concatenate([toks, nxt[:, None]], axis=1)
    lg_p, _ = llama.prefill(
        params, fresh(), toks_ext, jnp.full((2,), 10, jnp.int32),
        cos, sin, cfg,
    )
    np.testing.assert_allclose(
        np.asarray(lg_d), np.asarray(lg_p), rtol=2e-4, atol=2e-4
    )

    # (c) training forward agrees at the last position
    full = forward_train(params, toks, cfg, cos, sin, use_flash=True)
    np.testing.assert_allclose(
        np.asarray(full[:, -1]), np.asarray(lg), rtol=2e-4, atol=2e-4
    )


def test_qwen3_preset():
    cfg = ModelConfig.qwen3_8b(num_layers=1)
    assert cfg.qk_norm and not cfg.attention_bias and cfg.rope_base == 1e6
