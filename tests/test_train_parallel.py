"""TP x DP sharded training (parallel/train) vs single-device autodiff.

The oracle is jax.grad of the SAME loss on one device: the Megatron-sharded
program (column-permuted fused layouts, per-layer psums, f-operator
backward) must reproduce those gradients exactly (up to fp32 reduction
order) — grads of permuted params are the permuted grads.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from starflashattention_tpu.models import llama
from starflashattention_tpu.models.train import loss_fn
from starflashattention_tpu.parallel import tp
from starflashattention_tpu.parallel.train import (
    init_opt_state,
    make_tp_dp_train_step,
    make_tp_dp_value_and_grad,
)
from starflashattention_tpu.runtime.params import ModelConfig


def _setup(rng, **cfg_kw):
    cfg = ModelConfig.tiny(
        dtype="float32", num_q_heads=8, num_kv_heads=4, **cfg_kw
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    cos, sin = llama.rope_tables(cfg)
    b, s = 4, 16  # batch divisible by data axis (2)
    batch = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s + 1)), jnp.int32)
    return cfg, params, cos, sin, batch


def _ref_grads(params, batch, cfg, cos, sin, mesh):
    """Single-device oracle on CANONICAL params; the grads are re-indexed
    into the TP column-permuted layout for comparison (permutation is a
    linear reindexing, so grad(permuted params) == permute(grad(params)))."""
    loss, grads = jax.value_and_grad(loss_fn)(params, batch, cfg, cos, sin)
    return loss, tp.permute_params_for_tp(grads, cfg, mesh.shape["model"])


@pytest.mark.parametrize("moe", [False, True])
def test_sharded_grads_match_single_device(rng, mesh8, moe):
    kw = {"num_experts": 4, "num_experts_per_tok": 2} if moe else {}
    cfg, params, cos, sin, batch = _setup(rng, **kw)
    loss_ref, grads_ref = _ref_grads(params, batch, cfg, cos, sin, mesh8)

    sharded_params = tp.shard_params(params, mesh8, cfg)
    vg, _ = make_tp_dp_value_and_grad(mesh8, cfg)
    loss_sh, grads_sh = vg(sharded_params, batch, cos, sin)

    assert abs(float(loss_sh) - float(loss_ref)) < 1e-5
    flat_ref = jax.tree_util.tree_leaves_with_path(grads_ref)
    flat_sh = jax.tree.leaves(grads_sh)
    assert len(flat_ref) == len(flat_sh)
    for (path, a), b in zip(flat_ref, flat_sh):
        scale = float(jnp.abs(a).max()) + 1e-9
        err = float(jnp.abs(a - np.asarray(b)).max()) / scale
        assert err < 1e-4, (jax.tree_util.keystr(path), err)


def test_sharded_train_step_lowers_loss(rng, mesh8):
    cfg, params, cos, sin, batch = _setup(rng)
    sharded_params = tp.shard_params(params, mesh8, cfg)
    opt = optax.adam(1e-2)
    opt_state = init_opt_state(opt, sharded_params)
    step = make_tp_dp_train_step(mesh8, cfg, opt)
    losses = []
    for _ in range(6):
        sharded_params, opt_state, loss = step(
            sharded_params, opt_state, batch, cos, sin
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_trained_sharded_params_serve(rng, mesh8):
    """Round-trip: params trained on the mesh drop straight into the
    sharded serving step (same layouts, no resharding)."""
    cfg, params, cos, sin, batch = _setup(rng)
    cfg_serve = dataclasses.replace(cfg, num_splits=1)
    sharded_params = tp.shard_params(params, mesh8, cfg)
    opt = optax.sgd(1e-2)
    opt_state = init_opt_state(opt, sharded_params)
    step = make_tp_dp_train_step(mesh8, cfg, opt)
    sharded_params, _, _ = step(sharded_params, opt_state, batch, cos, sin)

    from starflashattention_tpu.cache import contiguous

    cache = tp.shard_cache(
        contiguous.init_cache(
            cfg.num_layers, 4, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
            dtype=jnp.float32,
        ),
        mesh8,
    )
    decode = tp.make_tp_decode_step(mesh8, cfg_serve)
    logits, _ = decode(
        sharded_params, cache, jnp.zeros((4,), jnp.int32), cos, sin
    )
    assert bool(jnp.isfinite(logits).all())
