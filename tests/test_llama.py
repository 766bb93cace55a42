"""Llama model: decode/prefill consistency, determinism, quantized cache."""

import jax
import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.cache import contiguous
from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig

CFG = ModelConfig.tiny(dtype="float32")


def make_model():
    key = jax.random.PRNGKey(0)
    params = llama.init_params(CFG, key)
    return params


def test_param_shapes():
    params = make_model()
    assert params["embed"].shape == (CFG.vocab_size, CFG.hidden_size)
    assert params["layers"]["wqkv"].shape == (
        CFG.num_layers,
        CFG.hidden_size,
        (CFG.num_q_heads + 2 * CFG.num_kv_heads) * CFG.head_dim,
    )
    assert llama.param_count(params) > 0


def test_prefill_matches_stepwise_decode():
    """Prefill logits at last token == decoding the same tokens one by one."""
    params = make_model()
    cos, sin = llama.rope_tables(CFG)
    b, sp = 2, 6
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (b, sp)), jnp.int32)
    lengths = jnp.full((b,), sp, jnp.int32)

    cache_a = contiguous.init_cache(CFG.num_layers, b, CFG.num_kv_heads, CFG.max_seq_len, CFG.head_dim, dtype=jnp.float32)
    logits_a, cache_a = llama.prefill(params, cache_a, toks, lengths, cos, sin, CFG)

    cache_b = contiguous.init_cache(CFG.num_layers, b, CFG.num_kv_heads, CFG.max_seq_len, CFG.head_dim, dtype=jnp.float32)
    for t in range(sp):
        logits_b, cache_b = llama.decode_step(params, cache_b, toks[:, t], cos, sin, CFG)

    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cache_a.k), np.asarray(cache_b.k), atol=1e-5)
    assert np.array_equal(np.asarray(cache_a.lengths), np.asarray(cache_b.lengths))


def test_ragged_prefill():
    """Right-padded rows must produce the same logits as unpadded rows."""
    params = make_model()
    cos, sin = llama.rope_tables(CFG)
    rng = np.random.default_rng(1)
    toks_short = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 3)), jnp.int32)

    cache1 = contiguous.init_cache(CFG.num_layers, 1, CFG.num_kv_heads, CFG.max_seq_len, CFG.head_dim, dtype=jnp.float32)
    logits1, _ = llama.prefill(params, cache1, toks_short, jnp.asarray([3]), cos, sin, CFG)

    toks_padded = jnp.pad(toks_short, ((0, 0), (0, 5)))  # pad to len 8
    cache2 = contiguous.init_cache(CFG.num_layers, 1, CFG.num_kv_heads, CFG.max_seq_len, CFG.head_dim, dtype=jnp.float32)
    logits2, _ = llama.prefill(params, cache2, toks_padded, jnp.asarray([3]), cos, sin, CFG)

    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2), atol=1e-4, rtol=1e-4)


def test_generate_greedy_deterministic():
    params = make_model()
    rng = np.random.default_rng(2)
    prompts = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 4)), jnp.int32)
    lengths = jnp.asarray([4, 2], jnp.int32)
    out1 = llama.generate(params, CFG, prompts, lengths, max_new_tokens=5)
    out2 = llama.generate(params, CFG, prompts, lengths, max_new_tokens=5)
    assert out1.shape == (2, 5)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_quantized_cache_decode_close_to_fp():
    cfg = CFG
    params = make_model()
    cos, sin = llama.rope_tables(cfg)
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 4)), jnp.int32)
    lengths = jnp.full((2,), 4, jnp.int32)

    cache_fp = contiguous.init_cache(cfg.num_layers, 2, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim, dtype=jnp.float32)
    logits_fp, cache_fp = llama.prefill(params, cache_fp, toks, lengths, cos, sin, cfg)

    cache_q = contiguous.init_cache(
        cfg.num_layers, 2, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        quant_mode="int8", calibration_scale=8.0,
    )
    logits_q, cache_q = llama.prefill(params, cache_q, toks, lengths, cos, sin, cfg)

    # logit max-abs-err within the INT8 scheme's bound (BASELINE.json metric)
    err = np.max(np.abs(np.asarray(logits_fp) - np.asarray(logits_q)))
    assert err < 0.5, err

    tok = jnp.argmax(logits_q, axis=-1).astype(jnp.int32)
    logits_q2, _ = llama.decode_step(params, cache_q, tok, cos, sin, cfg)
    assert np.all(np.isfinite(np.asarray(logits_q2)))
