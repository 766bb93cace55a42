"""Training-mode forward + loss for the Llama-family models.

The reference is inference-only (SURVEY.md §2: no backward, no training);
this module is the framework's training path, built from the same blocks
the serving path uses (rms_norm / RoPE / SwiGLU / fused-QKV layouts from
models/llama.py) so a trained checkpoint drops straight into the engine.

Attention is differentiable flash (ops/flash_bwd.flash_attention: Pallas
forward + FA2 backward, O(S) memory) by default, with a plain-jnp fallback
(``use_flash=False``) that materializes the (B, H, S, S) score tensor —
the two produce matching gradients (tests/test_train.py) and the jnp twin
doubles as the spec.

TPU notes: per-layer ``jax.checkpoint`` (remat) is on by default — decode
weights dominate HBM, so recomputing layer activations in the backward
trades cheap MXU FLOPs for the memory that sets the max trainable batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from starflashattention_tpu.models import llama
from starflashattention_tpu.ops.flash_bwd import flash_attention
from starflashattention_tpu.runtime.params import ModelConfig


def _f(x, axis_name: str | None):
    """Megatron's "f" operator: identity forward, psum backward.

    Inside a shard_map with column-parallel weights, the cotangent of a
    replicated activation is only the LOCAL shard's contribution (each chip
    holds a different weight slice); the true gradient is the sum over the
    model axis. Placing this at the entry of every column-parallel branch
    makes the norm/embedding gradients come out full AND bit-identically
    replicated (each shard performs the same psum), so the parameter update
    stays consistent without a separate grad all-reduce pass.

    All collectives on the training path live inside custom_vjp pairs (_f,
    _g, _gather_vocab) ON PURPOSE: the sharded program runs under
    ``shard_map(..., check_vma=False)``, where JAX's automatic transposition
    of a raw psum is not replication-aware and produces wrong gradients —
    with explicit vjps nothing is ever transposed automatically.
    """
    if axis_name is None:
        return x

    @jax.custom_vjp
    def ident(x):
        return x

    ident.defvjp(
        lambda x: (x, None),
        lambda _, g: (jax.lax.psum(g, axis_name),),
    )
    return ident(x)


def _g(x, axis_name: str | None):
    """Megatron's "g" operator: psum forward, identity backward (the
    row-parallel output reduction; its cotangent is already replicated
    because the loss is computed from replicated activations)."""
    if axis_name is None:
        return x

    @jax.custom_vjp
    def red(x):
        return jax.lax.psum(x, axis_name)

    red.defvjp(
        lambda x: (jax.lax.psum(x, axis_name), None),
        lambda _, g: (g,),
    )
    return red(x)


def _gather_vocab(local, axis_name: str):
    """all_gather of vocab-sharded logit slices with an explicit vjp: the
    backward takes this shard's slice of the (replicated) cotangent."""
    v_local = local.shape[-1]

    @jax.custom_vjp
    def gather(x):
        return jax.lax.all_gather(x, axis_name, axis=x.ndim - 1, tiled=True)

    def fwd(x):
        return gather(x), None

    def bwd(_, g):
        off = jax.lax.axis_index(axis_name) * v_local
        return (jax.lax.dynamic_slice_in_dim(g, off, v_local, axis=g.ndim - 1),)

    gather.defvjp(fwd, bwd)
    return gather(local)


def _attn_jnp(q, k, v, cfg: ModelConfig, lidx=None):
    """Plain-jnp causal attention twin (the executable spec). Handles the
    full Gemma-2 surface — query_scale, softcapping, and the per-layer
    alternating window (``lidx``, a traced scan index) — differentiably, so
    Gemma-2 TRAINS through this twin while the flash path lacks a softcap
    backward."""
    b, _, s, _ = q.shape
    g = cfg.num_q_heads // cfg.num_kv_heads
    kq = jnp.repeat(k, g, axis=1)
    vq = jnp.repeat(v, g, axis=1)
    scale = cfg.sm_scale() or cfg.head_dim**-0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, kq) * scale
    if cfg.attn_softcap is not None:
        scores = cfg.attn_softcap * jnp.tanh(scores / cfg.attn_softcap)
    pos = jnp.arange(s)
    mask = pos[None, :] <= pos[:, None]
    if cfg.sliding_window is not None:
        window = cfg.sliding_window
        if cfg.sliding_window_pattern != 1 and lidx is not None:
            window = llama._layer_window(cfg, lidx)
        in_band = pos[None, :] > pos[:, None] - window
        if cfg.attention_sinks:
            in_band = in_band | (pos[None, :] < cfg.attention_sinks)
        mask = mask & in_band
    scores = jnp.where(mask[None, None], scores, -1e30)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, axis=-1), vq)


def _windowed_attn(fn, cfg: ModelConfig, lidx, q, k, v):
    """Apply ``fn`` (a partial'd flash/ring attention taking (q, k, v,
    window=, sinks=)) with the config's window — as a lax.cond over the two
    compiled variants when layers alternate (Gemma-2: window is a STATIC
    kernel parameter, so the per-layer choice selects between programs)."""
    if cfg.sliding_window is not None and cfg.sliding_window_pattern != 1:
        sliding = jax.lax.rem(lidx + 1, cfg.sliding_window_pattern) != 0
        return jax.lax.cond(
            sliding,
            lambda q, k, v: fn(q, k, v, window=cfg.sliding_window,
                               sinks=cfg.attention_sinks),
            lambda q, k, v: fn(q, k, v),
            q, k, v,
        )
    return fn(q, k, v, window=cfg.sliding_window, sinks=cfg.attention_sinks)


def forward_train(
    params,
    tokens: jax.Array,  # (B, S) int32
    cfg: ModelConfig,
    cos: jax.Array,
    sin: jax.Array,
    *,
    use_flash: bool = True,
    remat: bool = True,
    axis_name: str | None = None,
    seq_axis_name: str | None = None,
    lora: dict | None = None,
) -> jax.Array:
    """All-position logits (B, S, V) — the training twin of the serving
    prefill (models/llama._prefill_core), cache-free and differentiable.

    ``axis_name`` runs the Megatron-sharded form inside a shard_map: params
    hold this chip's column/row slices (parallel/tp.param_specs layouts,
    ``cfg`` = the per-shard geometry from tp._shard_cfg), activations are
    replicated, one psum completes each row-parallel projection, and the
    :func:`_f` operator makes the backward exact (see its docstring).

    ``seq_axis_name`` runs CONTEXT-PARALLEL: ``tokens`` is this chip's
    contiguous chunk of the global sequence (chip i owns positions
    [i*S_local, (i+1)*S_local)), positions/RoPE use the global offsets, and
    attention is ring attention over the axis (parallel/ring.py) — params
    stay replicated, activations are sequence-sharded, and the only
    communication is the KV rotation. Composes with ``axis_name`` (TP): the
    ring rotates head-sharded KV chunks just the same.
    """
    from starflashattention_tpu.models.lora import delta as _lora_delta

    if seq_axis_name is not None and not use_flash:
        raise ValueError(
            "context-parallel training requires the flash path "
            "(use_flash=True): the jnp attention twin is single-device"
        )

    b, s = tokens.shape
    x = llama._embed_tokens(params, tokens, cfg)
    pos0 = 0
    if seq_axis_name is not None:
        pos0 = jax.lax.axis_index(seq_axis_name) * s
    pos = jnp.broadcast_to(pos0 + jnp.arange(s)[None, :], (b, s))
    lscale = None if lora is None else lora["scale"]

    def layer_body(x, xs):
        lp, ll, lidx = xs
        h = _f(llama.rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps), axis_name)
        qkv = jnp.dot(h, lp["wqkv"]) + _lora_delta(h, ll, "wqkv", lscale)
        if cfg.attention_bias:
            qkv = qkv + lp["bqkv"]
        q, k, v = llama._split_heads_prefill(qkv, cfg)
        q, k = llama._apply_qk_norm(q, k, lp, cfg)
        q = llama.apply_rope(q, pos[:, None, :], cos, sin, style=cfg.rope_style)
        k = llama.apply_rope(k, pos[:, None, :], cos, sin, style=cfg.rope_style)
        if seq_axis_name is not None:
            from starflashattention_tpu.parallel.ring import ring_attention

            ra = functools.partial(
                ring_attention, axis_name=seq_axis_name,
                sm_scale=cfg.sm_scale(), softcap=cfg.attn_softcap,
            )
            o = _windowed_attn(ra, cfg, lidx, q, k, v)
        elif use_flash:
            fa = functools.partial(
                flash_attention, sm_scale=cfg.sm_scale(),
                softcap=cfg.attn_softcap,
            )
            o = _windowed_attn(fa, cfg, lidx, q, k, v)
        else:
            o = _attn_jnp(q, k, v, cfg, lidx=lidx)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, -1)
        attn_out = _g(jnp.dot(o, lp["wo"]) + _lora_delta(o, ll, "wo", lscale),
                      axis_name)
        x = llama._residual_add(x, attn_out, lp, "post_attn_norm",
                                cfg.rms_norm_eps)

        h = _f(llama.rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps), axis_name)
        if cfg.num_experts:
            mlp = _moe_mlp_train(h, lp, cfg, axis_name)
        else:
            gu = jnp.dot(h, lp["w_gate_up"]) + _lora_delta(
                h, ll, "w_gate_up", lscale
            )
            gate, up = jnp.split(gu, 2, axis=-1)
            act = llama._gate_act(cfg)(gate) * up
            mlp = jnp.dot(act, lp["w_down"]) + _lora_delta(
                act, ll, "w_down", lscale
            )
        return llama._residual_add(
            x, _g(mlp, axis_name), lp, "post_mlp_norm", cfg.rms_norm_eps
        ), None

    if remat:
        layer_body = jax.checkpoint(layer_body)
    xs = (
        llama._scan_xs_layers(params["layers"]),
        None if lora is None else lora["layers"],
        jnp.arange(cfg.num_layers),
    )
    x, _ = jax.lax.scan(layer_body, x, xs)
    # output head: same math as the serving llama._logits, but with the
    # vocab-shard gather as an explicit-vjp collective (see _f docstring)
    xn = llama.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    if axis_name is not None and cfg.lm_head_sharded:
        xn = _f(xn, axis_name)  # vocab shards are column-parallel in V
        local = jnp.dot(xn, head, preferred_element_type=jnp.float32)
        local = _gather_vocab(local, axis_name)
    else:
        local = jnp.dot(xn, head, preferred_element_type=jnp.float32)
    if cfg.final_softcap is not None:
        local = cfg.final_softcap * jnp.tanh(local / cfg.final_softcap)
    return local


def _moe_mlp_train(h, lp, cfg: ModelConfig, axis_name: str | None = None):
    """Dense-compute MoE for training: top-k routing weights softmaxed
    (Mixtral semantics, matching llama._moe_mlp), experts evaluated densely
    and mixed — differentiable, fine at the tiny scales trainable offline.

    Under TP (``axis_name``) the expert stacks hold this chip's E/T experts
    (parallel/tp.param_specs: experts shard whole); the router is replicated
    with the GLOBAL expert count, so the top-k weights are scattered to a
    dense (B, S, E) map and each chip applies its local slice — the caller's
    psum completes the routed sum. Returns the LOCAL contribution.
    """
    e_global = cfg.num_experts
    # The f-operator on the router WEIGHT (not an activation): each shard's
    # routing-score cotangent covers only its expert slice, so the
    # replicated router's grad is partial per shard and needs the psum —
    # but psum-ing an activation here would double-count the router path
    # through ``h`` (whose own f already sums branch cotangents).
    router_w = _f(lp["moe_router"], axis_name)
    router = jnp.dot(h.astype(jnp.float32), router_w.astype(jnp.float32))
    top_w, top_i = jax.lax.top_k(router, cfg.num_experts_per_tok)
    top_w = jax.nn.softmax(top_w, axis=-1).astype(h.dtype)
    # dense (B, S, E) routing weights (zero off the top-k)
    w_full = jnp.sum(
        jax.nn.one_hot(top_i, e_global, dtype=h.dtype) * top_w[..., None], axis=-2
    )
    e_local = lp["moe_gate_up"].shape[0]
    off = 0
    if axis_name is not None:
        off = jax.lax.axis_index(axis_name) * e_local
    w_local = jax.lax.dynamic_slice_in_dim(w_full, off, e_local, axis=-1)
    # (E_l, B, S, 2I) gate-up for every local expert, then the weighted mix
    gu = jnp.einsum("bsd,edi->ebsi", h, lp["moe_gate_up"])
    gate, up = jnp.split(gu, 2, axis=-1)
    act = jax.nn.silu(gate) * up
    down = jnp.einsum("ebsi,eid->ebsd", act, lp["moe_down"])  # (E_l, B, S, D)
    return jnp.einsum("ebsd,bse->bsd", down, w_local)


def loss_tokens(params, inp, tgt, cfg: ModelConfig, cos, sin, *,
                use_flash=True, remat=True, axis_name: str | None = None,
                seq_axis_name: str | None = None, lora: dict | None = None):
    """Next-token cross-entropy with inputs/targets as separate (B, S)
    arrays — the shardable form (context parallelism splits the sequence, so
    the target of a chunk's last position lives in the NEXT chunk; slicing
    inp/tgt from (B, S+1) must happen before the sequence is sharded)."""
    logits = forward_train(
        params, inp, cfg, cos, sin, use_flash=use_flash, remat=remat,
        axis_name=axis_name, seq_axis_name=seq_axis_name, lora=lora,
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def loss_fn(params, batch, cfg: ModelConfig, cos, sin, *, use_flash=True,
            remat=True, axis_name: str | None = None, lora: dict | None = None):
    """Next-token cross-entropy over (B, S+1) token batches."""
    return loss_tokens(
        params, batch[:, :-1], batch[:, 1:], cfg, cos, sin,
        use_flash=use_flash, remat=remat, axis_name=axis_name, lora=lora,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "use_flash", "remat"))
def train_step(params, opt_state, batch, cfg: ModelConfig, cos, sin, lr,
               *, use_flash: bool = True, remat: bool = True):
    """One SGD-with-momentum step (optimizer-free helper for quick runs;
    benchmarks/train_tiny.py uses optax for the real tiny-model training)."""
    loss, grads = jax.value_and_grad(loss_fn)(
        params, batch, cfg, cos, sin, use_flash=use_flash, remat=remat
    )
    new_m = jax.tree.map(lambda m, g: 0.9 * m + g, opt_state, grads)
    new_p = jax.tree.map(lambda p, m: p - lr * m, params, new_m)
    return new_p, new_m, loss
