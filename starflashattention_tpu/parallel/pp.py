"""Pipeline-parallel decode: layer stages over a ``pipe`` mesh axis.

The reference is single-GPU (SURVEY.md §2: zero distributed code); PP is a
new capability mandated by the multi-chip design. TPU-first shape:

- The layer stack's leading (L, ...) axis shards over ``pipe`` — each stage
  holds L/P contiguous layers of the params AND of the KV-cache table. No
  weight ever moves; only the (mb, H) activation crosses stages, over ICI via
  ``lax.ppermute`` (the collective-permute XLA maps onto neighbor links).
- GPipe-style microbatching inside ONE jitted program: the batch splits into
  M microbatches and a ``lax.scan`` over T = M + P - 1 ticks runs the classic
  schedule — at tick t, stage s works on microbatch t - s, so all stages are
  busy in the steady state (bubble fraction (P-1)/T).
- Each (stage, tick) runs literally the single-chip per-layer program
  (models/llama._decode_layer). The per-stage KV table views its
  (L_local, B, ...) block as (L_local·M, mb, ...) — a free reshape — and the
  kernel's layer index becomes ``lidx·M + mb_idx``, so the existing
  scalar-prefetch table indexing in flash_decode/cache_append addresses the
  (layer, microbatch) pair directly; no per-tick table slicing.
- Idle ticks (pipeline fill/drain) run the same program on a clamped
  microbatch but write their KV append to the sacrificial last cache row
  (S-1, never inside any sequence's ``lengths``) and attend zero rows, so
  they cannot corrupt state; their activations flow only through lanes that
  are ignored downstream.
- Logits: the last stage computes the LM head for each finished microbatch
  into a (B, V) accumulator; a final psum over ``pipe`` (zeros elsewhere)
  replicates them — bit-identical to the single-chip values.

Composes with quantized weights (the {"w","scale"} stacks shard their
leading L axis like any layer param), with quantized KV (per-layer scale
tables shard the same way), with MoE expert stacks, and with TENSOR
PARALLELISM on a 2D ``(pipe, model)`` mesh: each stage's layers are
additionally Megatron-sharded over ``model`` exactly as in parallel/tp.py
(heads + MLP columns split, 2 psums/layer within the stage), so a 7B-class
model can pipeline across hosts while tensor-sharding inside each host's
ICI domain.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from starflashattention_tpu.cache.contiguous import KVCache
from starflashattention_tpu.models import llama
from starflashattention_tpu.parallel import tp as tp_mod
from starflashattention_tpu.runtime.params import ModelConfig

PIPE = "pipe"
MODEL = tp_mod.MODEL


def _tp_size(mesh: Mesh) -> int:
    return mesh.shape[MODEL] if MODEL in mesh.axis_names else 1


def _leading_pipe_spec(x):
    """P(pipe, None, ...) matching the array's rank (leading L axis)."""
    return P(PIPE, *([None] * (x.ndim - 1)))


def pp_param_specs(params: dict, cfg: ModelConfig | None = None,
                   mesh: Mesh | None = None) -> dict:
    """Spec pytree: every stacked layer param (incl. quantized {"w","scale"}
    stacks and MoE expert stacks) shards its leading L axis over ``pipe``;
    embed / lm_head / norms replicate (stage 0 and P-1 read them).

    On a 2D (pipe, model) mesh the layer specs COMBINE: dim 0 pipe + the
    Megatron dims from tp.param_specs (wqkv columns, wo rows, experts, ...).
    """
    if mesh is not None and _tp_size(mesh) > 1:
        base = tp_mod.param_specs(
            cfg,
            weight_quant=tp_mod._params_are_weight_quant(params),
            lm_head_quant=tp_mod._params_have_quant_lm_head(params),
        )
        layer_specs = jax.tree.map(
            lambda s: P(PIPE, *tuple(s)[1:]), base["layers"],
            is_leaf=lambda x: isinstance(x, P),
        )
        specs = {k: v for k, v in base.items() if k != "layers"}
        specs["layers"] = layer_specs
        return specs
    layer_specs = jax.tree.map(_leading_pipe_spec, params["layers"])
    specs = {k: jax.tree.map(lambda _: P(), v) for k, v in params.items()}
    specs["layers"] = layer_specs
    return specs


def _cache_specs(quantized: bool, tp: int) -> KVCache:
    hkv = MODEL if tp > 1 else None
    return KVCache(
        k=P(PIPE, None, hkv, None, None),
        v=P(PIPE, None, hkv, None, None),
        lengths=P(),
        k_scales=P(PIPE, hkv) if quantized else None,
        v_scales=P(PIPE, hkv) if quantized else None,
    )


def shard_params_pp(params: dict, mesh: Mesh, cfg: ModelConfig | None = None) -> dict:
    """Place params for the PP (or PP×TP) step. With a ``model`` axis in the
    mesh this applies the one-time TP column permutation first (tp.py)."""
    if _tp_size(mesh) > 1:
        params = tp_mod.permute_params_for_tp(params, cfg, _tp_size(mesh))
    specs = pp_param_specs(params, cfg, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_cache_pp(cache: KVCache, mesh: Mesh) -> KVCache:
    specs = _cache_specs(cache.k_scales is not None, _tp_size(mesh))
    if cache.k_scales is None:
        specs = dataclasses.replace(specs, k_scales=None, v_scales=None)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs
    )


def make_pp_decode_step(
    mesh: Mesh,
    cfg: ModelConfig,
    params_example: dict,
    num_microbatches: int | None = None,
    max_len_hint: int | None = None,
):
    """Build ``step(params, cache, tokens, cos, sin) -> (logits, cache)``
    pipelined over ``mesh['pipe']`` stages; if the mesh also has a ``model``
    axis, each stage is Megatron-sharded over it (PP×TP).

    ``params_example`` fixes the param pytree structure for the specs (dense
    vs quantized stacks). ``num_microbatches`` defaults to the stage count
    (a full pipeline); the batch must divide by it.
    """
    stages = mesh.shape[PIPE]
    if cfg.num_layers % stages:
        raise ValueError(
            f"num_layers {cfg.num_layers} not divisible by pipe axis {stages}"
        )
    if cfg.first_k_dense:
        raise NotImplementedError(
            "DeepSeek first_k_dense does not compose with PP yet (the "
            "k-leading dense_mlp side stack does not shard over the pipe "
            "axis like the L-leading stacks)"
        )
    m = num_microbatches or stages
    l_local = cfg.num_layers // stages
    tp = _tp_size(mesh)
    if tp > 1:
        tp_mod._check(cfg, mesh)
        scfg = tp_mod._shard_cfg(cfg, mesh)
        axis_name = MODEL
    else:
        scfg, axis_name = cfg, None

    def core(params, cache, tokens, cos, sin):
        b = tokens.shape[0]
        assert b % m == 0, (b, m)
        mb = b // m
        stage = jax.lax.axis_index(PIPE)
        layers = params["layers"]  # leading axis = l_local (local view)
        s_cap = cache.k.shape[3]

        pos_full = cache.lengths  # (B,) replicated
        att_full = pos_full + 1
        # (L_local, B, ...) -> (L_local*M, mb, ...): free reshape; kernel
        # layer index (lidx*M + mb_idx) addresses the (layer, microbatch)
        # pair through the existing table indexing.
        def flat(t):
            return t.reshape(l_local * m, mb, *t.shape[2:])

        k_flat, v_flat = flat(cache.k), flat(cache.v)

        xs_layers = llama._scan_xs_layers(layers)
        lidx_local = jnp.arange(l_local)

        def tick(carry, t):
            k_all, v_all, x_prev, acc = carry
            mb_idx = t - stage
            valid = (mb_idx >= 0) & (mb_idx < m)
            mb_c = jnp.clip(mb_idx, 0, m - 1)
            row0 = mb_c * mb

            tok_mb = jax.lax.dynamic_slice_in_dim(tokens, row0, mb)
            pos_mb = jax.lax.dynamic_slice_in_dim(pos_full, row0, mb)
            att_mb = jax.lax.dynamic_slice_in_dim(att_full, row0, mb)
            # Idle ticks: append to the sacrificial last row and attend
            # nothing — state-neutral by construction.
            pos_mb = jnp.where(valid, pos_mb, s_cap - 1)
            att_mb = jnp.where(valid, att_mb, 0)

            x0 = llama._embed_tokens(params, tok_mb, scfg)
            x = jnp.where(stage == 0, x0, x_prev.astype(x0.dtype))

            body = functools.partial(
                llama._decode_layer, layers=layers, cfg=scfg, cos=cos, sin=sin,
                pos=pos_mb, att_lengths=att_mb,
                k_scales_tab=cache.k_scales, v_scales_tab=cache.v_scales,
                axis_name=axis_name, max_len_hint=max_len_hint,
            )

            def layer_body(c, layer_in):
                lp, lidx = layer_in
                # Gemma-2 alternating windows key off the GLOBAL layer
                # index; param/cache indexing stays stage-local
                return body(
                    c, lp, lidx, lidx * m + mb_c,
                    global_lidx=stage * l_local + lidx,
                ), None

            (x, k_all, v_all), _ = jax.lax.scan(
                layer_body, (x, k_all, v_all), (xs_layers, lidx_local)
            )

            logits_mb = llama._logits(x, params, scfg, axis_name=axis_name)
            upd = jax.lax.dynamic_update_slice_in_dim(acc, logits_mb, row0, 0)
            acc = jnp.where(valid & (stage == stages - 1), upd, acc)

            # hand the finished microbatch to the next stage (no wraparound:
            # stage 0 always sources from the embedding)
            x_next = jax.lax.ppermute(
                x, PIPE, [(i, i + 1) for i in range(stages - 1)]
            )
            return (k_all, v_all, x_next, acc), None

        h = cfg.hidden_size
        x0 = jnp.zeros((mb, h), params["embed"].dtype)
        acc0 = jnp.zeros((b, cfg.vocab_size), jnp.float32)
        (k_flat, v_flat, _, acc), _ = jax.lax.scan(
            tick, (k_flat, v_flat, x0, acc0), jnp.arange(m + stages - 1)
        )
        logits = jax.lax.psum(acc, PIPE)  # last stage holds them; rest zeros

        def unflat(t):
            return t.reshape(l_local, b, *t.shape[2:])

        cache_out = dataclasses.replace(
            cache, k=unflat(k_flat), v=unflat(v_flat), lengths=pos_full + 1
        )
        return logits, cache_out

    c_specs = _cache_specs(cfg.quant_mode != "none", tp)
    p_specs = pp_param_specs(params_example, cfg, mesh)
    sharded = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(p_specs, c_specs, P(), P(), P()),
        out_specs=(P(), c_specs),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))
