"""Sharded training: Megatron-TP × data-parallel grad and step builders.

The reference has zero distributed code (SURVEY.md §2: no NCCL/MPI anywhere)
and zero training; this composes the framework's two new capabilities —
the differentiable flash path (ops/flash_bwd) and the TP weight layouts
(parallel/tp) — into training over a ('data', 'model') mesh:

- params live in the SAME sharded layouts serving uses (tp.param_specs /
  tp.shard_params, column-permuted fused projections included), so a model
  can train and then serve without a resharding step;
- inside the shard_map each chip runs the per-shard training forward
  (models/train.forward_train(axis_name='model')) on its batch rows — the
  same 2-psums-per-layer program as sharded serving, made backward-exact
  by the Megatron "f" operator (models/train._f);
- gradients are pmean'd over 'data' only: the f-operator already leaves
  replicated-param grads (norms, embed, router) bit-identically replicated
  across 'model', and model-sharded grads stay with their weight shard.

The optimizer runs OUTSIDE the shard_map on the global (sharded) arrays —
optax updates are elementwise, so XLA keeps every update local to the
shard that owns the weight (no resharding, no gather).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from starflashattention_tpu.models.train import loss_fn, loss_tokens
from starflashattention_tpu.parallel import tp
from starflashattention_tpu.parallel.tp import DATA, MODEL
from starflashattention_tpu.runtime.params import ModelConfig


def make_tp_dp_value_and_grad(
    mesh: Mesh, cfg: ModelConfig, *, use_flash: bool = True,
    remat: bool = True, grad_accum: int = 1,
):
    """Jitted ``(params, batch, cos, sin) -> (loss, grads)`` over the mesh.

    ``params`` must be sharded via :func:`tp.shard_params` (train dtype,
    unquantized); ``batch`` is (B, S+1) int32 with B divisible by the data
    axis. ``loss`` is the global batch mean; ``grads`` match ``params``'
    sharding exactly.
    """
    tp._check(cfg, mesh)
    shard_cfg = tp._shard_cfg(cfg, mesh)
    p_specs = tp.param_specs(cfg)

    def vg(params, batch, cos, sin):
        return jax.value_and_grad(loss_fn)(
            params, batch, shard_cfg, cos, sin,
            use_flash=use_flash, remat=remat, axis_name=MODEL,
        )

    def core(params, batch, cos, sin):
        if grad_accum > 1:
            loss, grads = _accumulate(vg, grad_accum)(
                params, batch, consts=(cos, sin)
            )
        else:
            loss, grads = vg(params, batch, cos, sin)
        # equal-sized data shards -> mean of shard means == global mean
        loss = jax.lax.pmean(loss, DATA)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, DATA), grads)
        return loss, grads

    sharded = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(p_specs, P(DATA), P(), P()),
        out_specs=(P(), p_specs),
        check_vma=False,
    )
    return jax.jit(sharded), sharded


def make_tp_dp_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    optimizer,
    *,
    use_flash: bool = True,
    remat: bool = True,
    grad_accum: int = 1,
    donate: bool = True,
):
    """Jitted ``(params, opt_state, batch, cos, sin) -> (params, opt_state,
    loss)`` — one optimizer step over the ('data', 'model') mesh.

    ``optimizer`` is any optax GradientTransformation; init its state with
    :func:`init_opt_state` so it inherits the parameter sharding.

    DONATION CONTRACT: with ``donate=True`` (the default) the step CONSUMES
    ``params`` and ``opt_state`` — their buffers are reused in place for the
    updated values, and the input arrays are deleted after the call. Thread
    the returned ``(params, opt_state)`` into the next call; touching the
    originals raises ``RuntimeError: Array has been deleted``. Pass
    ``donate=False`` to keep inputs alive (e.g. to run two step variants on
    the same params), at the cost of a second in-flight copy of the weights
    and optimizer state.
    """
    _, sharded = make_tp_dp_value_and_grad(
        mesh, cfg, use_flash=use_flash, remat=remat, grad_accum=grad_accum
    )
    import optax

    def step(params, opt_state, batch, cos, sin):
        loss, grads = sharded(params, batch, cos, sin)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def init_opt_state(optimizer, params):
    """optax state with moments sharded like their parameters.

    optax's init builds moments with ``zeros_like(param)``, which inherits
    each parameter's NamedSharding — Adam/momentum state lands on the shard
    that owns the weight with no explicit spec tree needed.
    """
    return optimizer.init(params)


SEQ = "seq"


def _accumulate(value_and_grad_fn, accum_steps: int):
    """Microbatch gradient accumulation: split the batch's LEADING axis
    into ``accum_steps`` equal microbatches, lax.scan the grad fn over
    them, and average — same math as the full batch (the loss is a mean,
    and a mean of equal-sized microbatch means is the batch mean), with
    peak activation memory divided by ``accum_steps``."""
    import jax.numpy as jnp

    def fn(params, *batch_args, consts=()):
        micro = [
            jnp.reshape(a, (accum_steps, a.shape[0] // accum_steps) + a.shape[1:])
            for a in batch_args
        ]

        def body(carry, mb):
            loss_acc, grads_acc = carry
            loss, grads = value_and_grad_fn(params, *mb, *consts)
            return (
                loss_acc + loss,
                jax.tree.map(jnp.add, grads_acc, grads),
            ), None

        zero_l = jnp.zeros((), jnp.float32)
        zero_g = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )
        (loss, grads), _ = jax.lax.scan(body, (zero_l, zero_g), tuple(micro))
        inv = 1.0 / accum_steps
        return loss * inv, jax.tree.map(lambda g: g * inv, grads)

    return fn


def make_cp_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    optimizer,
    *,
    seq_axis: str = SEQ,
    data_axis: str | None = None,
    remat: bool = True,
    grad_accum: int = 1,
    donate: bool = True,
):
    """Context-parallel (× optional data-parallel) training step: one
    optimizer step with the batch's SEQUENCE dim sharded over ``seq_axis``
    and ring attention (parallel/ring.py) carrying the cross-chunk
    attention — the long-context training mode, where one chip cannot hold
    even the O(S) activations of a full sequence.

    Params (and optimizer state) stay fully replicated — CP shards
    activations, not weights; every non-attention op (norms, projections,
    SwiGLU, loss) is per-token and runs unchanged on the chunk. The only
    communication is the ring's KV rotation (forward and backward) plus one
    scalar/grad pmean per step.

    ``(params, opt_state, batch, cos, sin) -> (params, opt_state, loss)``
    with ``batch`` (B, S+1) int32 and S divisible by the seq-axis size
    (times the data-axis size for B, if given).

    DONATION CONTRACT: with ``donate=True`` (default) the step CONSUMES
    ``params`` and ``opt_state`` (buffers reused in place; inputs deleted) —
    thread the returned pair forward. ``donate=False`` keeps inputs alive.
    """
    import optax

    axes = [a for a in (data_axis, seq_axis) if a is not None]

    def vg(params, inp, tgt, cos, sin):
        return jax.value_and_grad(loss_tokens)(
            params, inp, tgt, cfg, cos, sin,
            use_flash=True, remat=remat, seq_axis_name=seq_axis,
        )

    def core(params, inp, tgt, cos, sin):
        if grad_accum > 1:
            # microbatch over the BATCH rows (each chip's local rows);
            # sequence stays whole so the ring sees full chunks
            loss, grads = _accumulate(
                lambda p, i, t, c, s: vg(p, i, t, c, s), grad_accum
            )(params, inp, tgt, consts=(cos, sin))
        else:
            loss, grads = vg(params, inp, tgt, cos, sin)
        # equal chunks: global mean = mean of chunk means; replicated params
        # need the pmean over every activation-sharding axis
        for ax in axes:
            loss = jax.lax.pmean(loss, ax)
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, ax), grads)
        return loss, grads

    tok_spec = P(data_axis, seq_axis)
    sharded = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(P(), tok_spec, tok_spec, P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(params, opt_state, batch, cos, sin):
        # slice BEFORE sharding: a chunk's last target is the next chunk's
        # first input token (see models/train.loss_tokens)
        inp, tgt = batch[:, :-1], batch[:, 1:]
        loss, grads = sharded(params, inp, tgt, cos, sin)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_tp_cp_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    optimizer,
    *,
    seq_axis: str = SEQ,
    data_axis: str | None = None,
    remat: bool = True,
    donate: bool = True,
):
    """3D training: Megatron TP (``model``) × context parallelism
    (``seq_axis``, ring attention) × optional data parallelism — long
    sequences AND wide models on one mesh.

    Params live in the serving TP layouts (tp.shard_params), replicated over
    the seq/data axes; the ring rotates the HEAD-SHARDED KV chunks, so the
    two decompositions compose without any relayout. Grad math: the TP axis
    is handled by the Megatron f/g explicit-vjp operators inside
    forward_train; the seq/data axes pmean replicated-param grads (each
    chip's local grad is a partial sum over loss terms — the ring backward
    routes dk/dv cotangents home before autodiff reaches the projections,
    so the pmean of locals reconstructs the exact global gradient; asserted
    against the single-device oracle in tests/test_train_cp.py).

    DONATION CONTRACT: with ``donate=True`` (default) the step CONSUMES
    ``params`` and ``opt_state`` (buffers reused in place; inputs deleted) —
    thread the returned pair forward. ``donate=False`` keeps inputs alive.
    """
    import optax

    tp._check(cfg, mesh)
    shard_cfg = tp._shard_cfg(cfg, mesh)
    p_specs = tp.param_specs(cfg)
    axes = [a for a in (data_axis, seq_axis) if a is not None]

    def core(params, inp, tgt, cos, sin):
        loss, grads = jax.value_and_grad(loss_tokens)(
            params, inp, tgt, shard_cfg, cos, sin,
            use_flash=True, remat=remat,
            axis_name=MODEL, seq_axis_name=seq_axis,
        )
        for ax in axes:
            loss = jax.lax.pmean(loss, ax)
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, ax), grads)
        return loss, grads

    tok_spec = P(data_axis, seq_axis)
    sharded = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(p_specs, tok_spec, tok_spec, P(), P()),
        out_specs=(P(), p_specs),
        check_vma=False,
    )

    def step(params, opt_state, batch, cos, sin):
        inp, tgt = batch[:, :-1], batch[:, 1:]
        loss, grads = sharded(params, inp, tgt, cos, sin)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())
