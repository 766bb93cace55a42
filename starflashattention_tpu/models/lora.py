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
