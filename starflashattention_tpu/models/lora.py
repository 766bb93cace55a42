"""LoRA (low-rank adaptation) fine-tuning for the Llama-family models.

The reference has no training at all (SURVEY.md); with the differentiable
flash path (ops/flash_bwd) in place, LoRA is the production fine-tuning
story: train two small (in, r) x (r, out) factors per projection while the
base weights stay frozen — the optimizer state is O(r·(in+out)) per matrix
instead of O(in·out), which is what makes 7B-class adaptation fit a single
16 GB chip. After training, :func:`merge` folds ``a @ b`` into the dense
weights so serving runs the UNMODIFIED engine (zero runtime overhead, all
quantization / TP / paging paths apply to the merged checkpoint).

Standard LoRA parameterization (arXiv:2106.09685): ``w_eff = w + (α/r)·a@b``
with ``a ~ N(0, 1/in)`` and ``b = 0`` — adapters start as an exact no-op.

Scope: training composes with the single-chip and data-parallel paths
(adapters replicated). Tensor-parallel LoRA training would need the a/b
factors column-permuted with their fused base layouts (parallel/tp) — not
wired; fine-tune single-chip/DP, then merge and serve with any sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from starflashattention_tpu.runtime.params import ModelConfig

# projections that accept adapters, with (in, out) shapes derived from cfg
_TARGETS = ("wqkv", "wo", "w_gate_up", "w_down")


def _target_shapes(cfg: ModelConfig) -> dict:
    h, d = cfg.hidden_size, cfg.head_dim
    hq, hkv, inter = cfg.num_q_heads, cfg.num_kv_heads, cfg.intermediate_size
    shapes = {
        "wqkv": (h, (hq + 2 * hkv) * d),
        "wo": (hq * d, h),
    }
    if not cfg.num_experts:
        shapes["w_gate_up"] = (h, 2 * inter)
        shapes["w_down"] = (inter, h)
    return shapes


def init_lora(
    cfg: ModelConfig,
    key: jax.Array,
    rank: int = 8,
    *,
    alpha: float | None = None,
    targets: tuple[str, ...] = _TARGETS,
    dtype=jnp.float32,
) -> dict:
    """Adapter pytree: {"layers": {name: {"a": (L, in, r), "b": (L, r, out)}},
    "scale": α/r}. ``b = 0`` -> the adapted model starts EXACTLY at the base
    model (tests assert bit-equality of the initial forward)."""
    if alpha is None:
        alpha = float(2 * rank)
    shapes = _target_shapes(cfg)
    unknown = [t for t in targets if t not in shapes]
    if unknown:
        raise ValueError(
            f"LoRA targets {unknown} not adaptable for this config "
            f"(available: {sorted(shapes)}; MoE expert stacks are frozen)"
        )
    L = cfg.num_layers
    layers = {}
    for name in targets:
        fan_in, fan_out = shapes[name]
        key, ka = jax.random.split(key)
        layers[name] = {
            "a": (jax.random.normal(ka, (L, fan_in, rank), dtype)
                  / jnp.sqrt(jnp.asarray(fan_in, dtype))),
            "b": jnp.zeros((L, rank, fan_out), dtype),
        }
    return {"layers": layers, "scale": jnp.asarray(alpha / rank, dtype)}


def delta(x: jax.Array, ll: dict | None, name: str, scale) -> jax.Array | float:
    """Adapter contribution ``(α/r)·(x @ a) @ b`` for one layer slice ``ll``
    (as produced by the training scan), or 0.0 when the projection has no
    adapter — shaped for direct addition to the base projection output."""
    if ll is None or name not in ll:
        return 0.0
    a, b = ll[name]["a"], ll[name]["b"]
    # compute in the ADAPTER's precision (f32 factors on a bf16 model is the
    # standard recipe), return in the activation dtype so the residual
    # stream's type is unchanged
    d = (jnp.dot(jnp.dot(x.astype(a.dtype), a), b) * scale).astype(x.dtype)
    return d


def merge(params: dict, lora: dict, cfg: ModelConfig) -> dict:
    """Fold adapters into dense base weights: ``w + (α/r)·a@b`` per layer.

    The result is a plain params pytree — serve, quantize, or shard it like
    any base checkpoint. Refuses quantized bases (merge BEFORE
    quantize_model_weights; folding into int8/int4 payloads would silently
    re-quantize through the adapter)."""
    out = dict(params)
    out["layers"] = dict(params["layers"])
    scale = lora["scale"]
    for name, ab in lora["layers"].items():
        w = out["layers"][name]
        if isinstance(w, dict):
            raise ValueError(
                f"cannot merge LoRA into quantized weight {name!r}; merge "
                "into the dense checkpoint first, then quantize"
            )
        upd = jnp.einsum("lir,lro->lio", ab["a"], ab["b"]) * scale
        out["layers"][name] = (w + upd.astype(w.dtype)).astype(w.dtype)
    return out


def loss_fn(base_params, lora, batch, cfg, cos, sin, *, use_flash=True,
            remat=True):
    """Adapter-only training loss: grads w.r.t. ``lora`` (argnums=1) leave
    the frozen base untouched."""
    from starflashattention_tpu.models import train

    frozen = jax.lax.stop_gradient(base_params)
    return train.loss_fn(
        frozen, batch, cfg, cos, sin,
        use_flash=use_flash, remat=remat, lora=lora,
    )


# ---------------------------------------------------------------------------
# Multi-LoRA serving (S-LoRA-style): N adapters resident, per-request select
# ---------------------------------------------------------------------------


def stack_adapters(loras: list[dict]) -> dict:
    """Stack N trained adapters for multi-adapter serving.

    Returns ``{"layers": {name: {"a": (L, N, in, r_max), "b": (L, N, r_max,
    out)}}, "scale": (N,)}`` — the LAYER axis leads so the model's
    scan-over-layers slices it like any other stacked layer param.
    Heterogeneous ranks are zero-padded to the largest (padding b with zeros
    leaves each adapter's delta exactly unchanged); every adapter must
    target the same projections (train them with the same ``targets``).
    """
    if not loras:
        raise ValueError("stack_adapters needs at least one adapter")
    names = sorted(loras[0]["layers"])
    for lr in loras[1:]:
        if sorted(lr["layers"]) != names:
            raise ValueError(
                f"adapters target different projections: {names} vs "
                f"{sorted(lr['layers'])}"
            )
    r_max = max(lr["layers"][names[0]]["a"].shape[-1] for lr in loras)
    layers = {}
    for name in names:
        a_s, b_s = [], []
        for lr in loras:
            a, b = lr["layers"][name]["a"], lr["layers"][name]["b"]
            r = a.shape[-1]
            if r < r_max:
                a = jnp.pad(a, ((0, 0), (0, 0), (0, r_max - r)))
                b = jnp.pad(b, ((0, 0), (0, r_max - r), (0, 0)))
            # fold each adapter's own alpha/r scale into b so one stacked
            # tree serves adapters trained at different scales
            a_s.append(a)
            b_s.append(b * lr["scale"])
        layers[name] = {
            "a": jnp.stack(a_s, axis=1),  # (L, N, in, r)
            "b": jnp.stack(b_s, axis=1),  # (L, N, r, out)
        }
    return {"layers": layers}


def num_adapters(stack: dict) -> int:
    "N from a stacked tree (axis 1 of any factor)."
    return next(iter(stack["layers"].values()))["a"].shape[1]


def delta_multi(x: jax.Array, ml: dict | None, name: str, sel) -> jax.Array | float:
    """Per-request adapter contribution for one layer of a STACKED tree.

    ``x`` is (B, in) (decode) or (B, S, in) (prefill); ``ml`` the layer
    slice ``{name: {"a": (N, in, r), "b": (N, r, out)}}``; ``sel`` a (B, N)
    one-hot selector (an all-zero row = base model, delta 0). Computes every
    adapter's low-rank product then selects — at serving ranks (r <= 64)
    and adapter counts (N <= 16) this is B·N·r·(in+out) FLOPs, noise next
    to the base projection, and involves no gather (MXU-friendly).
    """
    if ml is None or name not in ml:
        return 0.0
    a, b = ml[name]["a"], ml[name]["b"]
    xa = x.astype(a.dtype)
    sel = sel.astype(a.dtype)
    y = jnp.einsum("...i,nir->...nr", xa, a)
    y = jnp.einsum("...nr,nro->...no", y, b)
    if x.ndim == 2:
        d = jnp.einsum("bno,bn->bo", y, sel)
    else:
        d = jnp.einsum("bsno,bn->bso", y, sel)
    return d.astype(x.dtype)


def adapter_onehot(idx, n: int) -> jax.Array:
    """(B,) adapter ids (−1 = base model) → (B, N) f32 one-hot selector."""
    idx = jnp.asarray(idx, jnp.int32)
    return (idx[:, None] == jnp.arange(n)[None, :]).astype(jnp.float32)
