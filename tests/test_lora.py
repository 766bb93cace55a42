"""LoRA adapters (models/lora): no-op init, merge equivalence, frozen-base
training, serving round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.cache import contiguous
from starflashattention_tpu.models import llama, lora, train
from starflashattention_tpu.runtime.params import ModelConfig


def _setup(rng, **cfg_kw):
    cfg = ModelConfig.tiny(dtype="float32", **cfg_kw)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    cos, sin = llama.rope_tables(cfg)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    return cfg, params, cos, sin, tokens


def test_zero_init_is_exact_noop(rng):
    cfg, params, cos, sin, tokens = _setup(rng)
    ad = lora.init_lora(cfg, jax.random.PRNGKey(1), rank=4)
    base = train.forward_train(params, tokens, cfg, cos, sin)
    with_ad = train.forward_train(params, tokens, cfg, cos, sin, lora=ad)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(with_ad))


def test_merge_matches_runtime_adapter(rng):
    cfg, params, cos, sin, tokens = _setup(rng)
    ad = lora.init_lora(cfg, jax.random.PRNGKey(1), rank=4)
    # give b real values so the adapter does something
    ad["layers"] = jax.tree.map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
        ad["layers"],
    )
    runtime = train.forward_train(params, tokens, cfg, cos, sin, lora=ad)
    merged = lora.merge(params, ad, cfg)
    folded = train.forward_train(merged, tokens, cfg, cos, sin)
    np.testing.assert_allclose(
        np.asarray(runtime), np.asarray(folded), atol=2e-3
    )


def test_adapter_training_freezes_base(rng):
    cfg, params, cos, sin, tokens = _setup(rng)
    batch = jnp.concatenate([tokens, tokens[:, :1]], axis=1)
    ad = lora.init_lora(cfg, jax.random.PRNGKey(1), rank=4)
    params0 = jax.tree.map(lambda x: x + 0, params)

    grad_fn = jax.value_and_grad(lora.loss_fn, argnums=1)
    losses = []
    for _ in range(6):
        loss, g = grad_fn(params, ad, batch, cfg, cos, sin)
        ad = jax.tree.map(lambda p, gi: p - 0.5 * gi, ad, g)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # base untouched (adapter-only optimization)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # both factors moved (b leaves its zero init after step 1)
    assert float(jnp.abs(ad["layers"]["wqkv"]["b"]).max()) > 0


def test_merged_adapter_serves(rng):
    """Fine-tune -> merge -> the stock serving prefill runs the adapted
    model (last-token logits equal the training twin's)."""
    cfg, params, cos, sin, tokens = _setup(rng)
    ad = lora.init_lora(cfg, jax.random.PRNGKey(1), rank=4)
    ad["layers"] = jax.tree.map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
        ad["layers"],
    )
    merged = lora.merge(params, ad, cfg)
    b, s = tokens.shape
    want = train.forward_train(merged, tokens, cfg, cos, sin)[:, -1, :]
    cache = contiguous.init_cache(
        cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    got, _ = llama._prefill_core(
        merged, cache, tokens, jnp.full((b,), s, jnp.int32), cos, sin, cfg
    )
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=2e-3)


def test_merge_refuses_quantized_base(rng):
    cfg, params, cos, sin, _ = _setup(rng)
    ad = lora.init_lora(cfg, jax.random.PRNGKey(1), rank=4)
    qparams = llama.quantize_model_weights(params)
    with pytest.raises(ValueError, match="quantized"):
        lora.merge(qparams, ad, cfg)


def test_moe_targets_validated(rng):
    cfg, *_ = _setup(rng, num_experts=4, num_experts_per_tok=2)
    with pytest.raises(ValueError, match="not adaptable"):
        lora.init_lora(cfg, jax.random.PRNGKey(1), targets=("w_gate_up",))
    # attention-only adaptation works on MoE models
    ad = lora.init_lora(cfg, jax.random.PRNGKey(1), targets=("wqkv", "wo"))
    assert set(ad["layers"]) == {"wqkv", "wo"}
