"""Context-parallel training (parallel/train.make_cp_train_step) vs the
single-device oracle: sequence-sharded activations + ring attention must
reproduce the full-sequence loss and parameter updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from starflashattention_tpu.models import llama
from starflashattention_tpu.models.train import loss_fn, loss_tokens
from starflashattention_tpu.parallel import make_mesh
from starflashattention_tpu.parallel.train import init_opt_state, make_cp_train_step
from starflashattention_tpu.runtime.params import ModelConfig


def _setup(rng, s=64, b=4, **cfg_kw):
    cfg = ModelConfig.tiny(
        dtype="float32", num_q_heads=8, num_kv_heads=4, **cfg_kw
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    cos, sin = llama.rope_tables(cfg)
    batch = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s + 1)), jnp.int32)
    return cfg, params, cos, sin, batch


def _tree_err(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return max(
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
        for x, y in zip(la, lb)
    )


def test_cp_step_matches_single_device(rng):
    cfg, params, cos, sin, batch = _setup(rng)
    mesh = make_mesh({"seq": 4}, devices=jax.devices()[:4])
    opt = optax.sgd(1e-2)

    # single-device oracle step
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        params, batch, cfg, cos, sin
    )
    state0 = opt.init(params)
    updates, _ = opt.update(grads_ref, state0, params)
    params_ref = optax.apply_updates(params, updates)

    step = make_cp_train_step(mesh, cfg, opt)
    params_cp, _, loss_cp = step(params, init_opt_state(opt, params), batch, cos, sin)

    assert abs(float(loss_cp) - float(loss_ref)) < 1e-5
    assert _tree_err(params_cp, params_ref) < 1e-5


def test_cp_dp_step_matches_single_device(rng):
    cfg, params, cos, sin, batch = _setup(rng, b=4, s=32)
    mesh = make_mesh({"data": 2, "seq": 2, "model": 2})
    # model axis unused here; CP x DP over the first two axes
    opt = optax.sgd(1e-2)

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        params, batch, cfg, cos, sin
    )
    state0 = opt.init(params)
    updates, _ = opt.update(grads_ref, state0, params)
    params_ref = optax.apply_updates(params, updates)

    step = make_cp_train_step(mesh, cfg, opt, data_axis="data")
    params_cp, _, loss_cp = step(params, init_opt_state(opt, params), batch, cos, sin)

    assert abs(float(loss_cp) - float(loss_ref)) < 1e-5
    assert _tree_err(params_cp, params_ref) < 1e-5


def test_cp_sliding_window(rng):
    cfg, params, cos, sin, batch = _setup(rng, sliding_window=24)
    mesh = make_mesh({"seq": 4}, devices=jax.devices()[:4])
    opt = optax.sgd(1e-2)
    loss_ref = loss_fn(params, batch, cfg, cos, sin)
    step = make_cp_train_step(mesh, cfg, opt)
    _, _, loss_cp = step(params, init_opt_state(opt, params), batch, cos, sin)
    assert abs(float(loss_cp) - float(loss_ref)) < 1e-5


def test_cp_requires_flash():
    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    cos, sin = llama.rope_tables(cfg)
    inp = jnp.zeros((1, 8), jnp.int32)
    with pytest.raises(ValueError, match="context-parallel"):
        # seq_axis_name without flash must be rejected before tracing
        loss_tokens(
            params, inp, inp, cfg, cos, sin,
            use_flash=False, seq_axis_name="seq",
        )


def test_tp_cp_step_matches_single_device(rng):
    from starflashattention_tpu.parallel import tp
    from starflashattention_tpu.parallel.train import make_tp_cp_train_step

    cfg, params, cos, sin, batch = _setup(rng, b=2, s=32)
    mesh = make_mesh({"seq": 2, "model": 4})
    opt = optax.sgd(1e-2)

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        params, batch, cfg, cos, sin
    )
    state0 = opt.init(params)
    updates, _ = opt.update(grads_ref, state0, params)
    params_ref = tp.permute_params_for_tp(
        optax.apply_updates(params, updates), cfg, mesh.shape["model"]
    )

    sharded = tp.shard_params(params, mesh, cfg)
    step = make_tp_cp_train_step(mesh, cfg, opt)
    params_cp, _, loss_cp = step(sharded, init_opt_state(opt, sharded), batch, cos, sin)

    assert abs(float(loss_cp) - float(loss_ref)) < 1e-5
    # permuted layouts: compare leaves (permutation is a linear reindexing,
    # so updated permuted params == permute(updated params))
    la = jax.tree.leaves(params_cp)
    lb = jax.tree.leaves(params_ref)
    assert len(la) == len(lb)
    err = max(
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
        for x, y in zip(la, lb)
    )
    assert err < 1e-5


def test_grad_accum_matches_full_batch(rng):
    """grad_accum=2 microbatching reproduces the full-batch update exactly
    (mean loss is linear in equal microbatch means) — CP and TP x DP.

    Both step variants run on the SAME params, so the donated default would
    delete them after the first call — this is exactly the use case the
    builders' ``donate=False`` escape hatch exists for.
    """
    from starflashattention_tpu.parallel import tp
    from starflashattention_tpu.parallel.train import make_tp_dp_train_step

    cfg, params, cos, sin, batch = _setup(rng, b=4, s=32)
    mesh_cp = make_mesh({"seq": 4}, devices=jax.devices()[:4])
    opt = optax.sgd(1e-2)

    p1, _, l1 = make_cp_train_step(mesh_cp, cfg, opt, donate=False)(
        params, init_opt_state(opt, params), batch, cos, sin
    )
    p2, _, l2 = make_cp_train_step(mesh_cp, cfg, opt, grad_accum=2, donate=False)(
        params, init_opt_state(opt, params), batch, cos, sin
    )
    assert abs(float(l1) - float(l2)) < 1e-6
    assert _tree_err(p1, p2) < 1e-6

    mesh = make_mesh({"data": 2, "model": 4})
    sharded = tp.shard_params(params, mesh, cfg)
    s1, _, m1 = make_tp_dp_train_step(mesh, cfg, opt, donate=False)(
        sharded, init_opt_state(opt, sharded), batch, cos, sin
    )
    s2, _, m2 = make_tp_dp_train_step(mesh, cfg, opt, grad_accum=2, donate=False)(
        sharded, init_opt_state(opt, sharded), batch, cos, sin
    )
    assert abs(float(m1) - float(m2)) < 1e-6
    assert _tree_err(s1, s2) < 1e-6


def test_gemma2_cp_step_matches_single_device(rng):
    """Gemma-2 under CONTEXT-PARALLEL ring training: softcap rides the ring
    chunks' flash forward/backward and the alternating window is a lax.cond
    per layer — loss and updated params match the single-device oracle."""
    cfg = ModelConfig.gemma2_9b(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=4,
        num_q_heads=2, num_kv_heads=1, head_dim=16, max_seq_len=128,
        dtype="float32", block_k=16, sliding_window=16,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    cos, sin = llama.rope_tables(cfg)
    batch = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 65)), jnp.int32)
    mesh = make_mesh({"seq": 4}, devices=jax.devices()[:4])
    opt = optax.sgd(1e-2)

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        params, batch, cfg, cos, sin, use_flash=True)
    state0 = opt.init(params)
    updates, _ = opt.update(grads_ref, state0, params)
    params_ref = optax.apply_updates(params, updates)

    step = make_cp_train_step(mesh, cfg, opt, donate=False)
    params_cp, _, loss_cp = step(
        params, init_opt_state(opt, params), batch, cos, sin)
    assert abs(float(loss_cp) - float(loss_ref)) < 1e-5
    assert _tree_err(params_cp, params_ref) < 1e-5


def test_donated_step_consumes_inputs(rng):
    """The donation contract is real: the default (donate=True) step deletes
    its params/opt_state inputs, and threading the returned pair through a
    second step works."""
    cfg, params, cos, sin, batch = _setup(rng)
    mesh = make_mesh({"seq": 4}, devices=jax.devices()[:4])
    opt = optax.sgd(1e-2)
    step = make_cp_train_step(mesh, cfg, opt)

    state = init_opt_state(opt, params)
    p1, st1, _ = step(params, state, batch, cos, sin)
    # inputs were donated -> deleted
    assert all(x.is_deleted() for x in jax.tree.leaves(params))
    # the returned pair threads into the next call cleanly
    p2, st2, loss2 = step(p1, st1, batch, cos, sin)
    assert np.isfinite(float(loss2))
