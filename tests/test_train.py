"""Training path (models/train): flash vs jnp twins, serving consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.cache import contiguous
from starflashattention_tpu.models import llama, train
from starflashattention_tpu.runtime.params import ModelConfig


def _setup(rng, **cfg_kw):
    cfg = ModelConfig.tiny(dtype="float32", **cfg_kw)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    cos, sin = llama.rope_tables(cfg)
    b, s = 2, 16
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    return cfg, params, cos, sin, tokens


def test_flash_matches_jnp_forward(rng):
    cfg, params, cos, sin, tokens = _setup(rng)
    lf = train.forward_train(params, tokens, cfg, cos, sin, use_flash=True)
    lj = train.forward_train(params, tokens, cfg, cos, sin, use_flash=False)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lj), atol=2e-4)


def test_flash_matches_jnp_grads(rng):
    cfg, params, cos, sin, tokens = _setup(rng)
    batch = jnp.concatenate([tokens, tokens[:, :1]], axis=1)

    gf = jax.grad(train.loss_fn)(params, batch, cfg, cos, sin, use_flash=True)
    gj = jax.grad(train.loss_fn)(params, batch, cfg, cos, sin, use_flash=False)

    flat_f, _ = jax.tree.flatten(gf)
    flat_j, _ = jax.tree.flatten(gj)
    for a, b in zip(flat_f, flat_j):
        scale = float(jnp.abs(b).max()) + 1e-9
        assert float(jnp.abs(a - b).max()) / scale < 5e-4


def test_remat_matches_no_remat(rng):
    cfg, params, cos, sin, tokens = _setup(rng)
    batch = jnp.concatenate([tokens, tokens[:, :1]], axis=1)
    g1 = jax.grad(train.loss_fn)(params, batch, cfg, cos, sin, remat=True)
    g2 = jax.grad(train.loss_fn)(params, batch, cfg, cos, sin, remat=False)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_train_forward_matches_serving_prefill(rng):
    """The training twin must produce the SAME model function the serving
    engine runs: last-token logits equal _prefill_core's (fresh cache)."""
    cfg, params, cos, sin, tokens = _setup(rng)
    b, s = tokens.shape
    logits_all = train.forward_train(params, tokens, cfg, cos, sin)
    cache = contiguous.init_cache(
        cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    lengths = jnp.full((b,), s, jnp.int32)
    logits_serv, _ = llama._prefill_core(
        params, cache, tokens, lengths, cos, sin, cfg
    )
    np.testing.assert_allclose(
        np.asarray(logits_all[:, -1, :]), np.asarray(logits_serv), atol=2e-3
    )


def test_moe_train_grads_finite(rng):
    cfg, params, cos, sin, tokens = _setup(
        rng, num_experts=4, num_experts_per_tok=2
    )
    batch = jnp.concatenate([tokens, tokens[:, :1]], axis=1)
    loss, grads = jax.value_and_grad(train.loss_fn)(
        params, batch, cfg, cos, sin
    )
    assert np.isfinite(float(loss))
    assert all(bool(jnp.isfinite(g).all()) for g in jax.tree.leaves(grads))
    # routed-expert weights actually receive gradient
    assert float(jnp.abs(grads["layers"]["moe_gate_up"]).max()) > 0


def test_train_step_lowers_loss(rng):
    cfg, params, cos, sin, tokens = _setup(rng)
    batch = jnp.concatenate([tokens, tokens[:, :1]], axis=1)
    opt = jax.tree.map(jnp.zeros_like, params)
    losses = []
    for _ in range(8):
        params, opt, loss = train.train_step(
            params, opt, batch, cfg, cos, sin, 0.2
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]
