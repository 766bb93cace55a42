"""KV-cache quantization: symmetric INT8 and FP8 (e4m3) with per-head scales.

New capability mandated by BASELINE.json (the reference is FP16-only); the
scheme is per-KV-head symmetric scaling so the Pallas kernels can fold a
single scalar multiply per (head,) into the post-matmul score/output — the
dequant never materializes an fp copy in HBM.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp

QuantMode = Literal["none", "int8", "fp8"]

INT8_MAX = 127.0
FP8_MAX = 448.0  # float8_e4m3fn max normal


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantizedTensor:
    """Quantized payload + per-head fp32 scales.

    ``values``: int8 or float8_e4m3fn, same shape as the source.
    ``scales``: fp32, shape = source shape reduced to the head axis, i.e. for a
    cache of shape (B, Hkv, S, D) the scales are (Hkv,). ``dequant = values *
    scales[head]``.
    """

    values: jax.Array
    scales: jax.Array

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype


def _per_head_absmax(x: jax.Array, head_axis: int) -> jax.Array:
    axes = tuple(i for i in range(x.ndim) if i != head_axis)
    return jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes)


def _scale_shape(x_ndim: int, head_axis: int, scales: jax.Array) -> jax.Array:
    shape = [1] * x_ndim
    shape[head_axis] = scales.shape[0]
    return scales.reshape(shape)


def quantize_int8(x: jax.Array, head_axis: int = 1) -> QuantizedTensor:
    """Symmetric per-head INT8 quantization: scale = absmax / 127."""
    absmax = _per_head_absmax(x, head_axis)
    scales = jnp.where(absmax == 0.0, 1.0, absmax / INT8_MAX)
    inv = 1.0 / _scale_shape(x.ndim, head_axis, scales)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -INT8_MAX, INT8_MAX)
    return QuantizedTensor(values=q.astype(jnp.int8), scales=scales)


def _to_fp8(scaled: jax.Array) -> jax.Array:
    """Cast to e4m3fn with SATURATION: the format has no inf, so an
    out-of-range cast produces NaN — one 6-sigma outlier under fixed
    calibration scales would poison every later attention output."""
    return jnp.clip(scaled, -FP8_MAX, FP8_MAX).astype(jnp.float8_e4m3fn)


def quantize_fp8(x: jax.Array, head_axis: int = 1) -> QuantizedTensor:
    """Per-head FP8-e4m3 quantization: scale maps absmax to FP8_MAX."""
    absmax = _per_head_absmax(x, head_axis)
    scales = jnp.where(absmax == 0.0, 1.0, absmax / FP8_MAX)
    inv = 1.0 / _scale_shape(x.ndim, head_axis, scales)
    q = x.astype(jnp.float32) * inv
    return QuantizedTensor(values=_to_fp8(q), scales=scales)


def quantize(x: jax.Array, mode: QuantMode, head_axis: int = 1):
    if mode == "none":
        return x
    if mode == "int8":
        return quantize_int8(x, head_axis)
    if mode == "fp8":
        return quantize_fp8(x, head_axis)
    raise ValueError(f"unknown quant mode {mode!r}")


def dequantize(qt: QuantizedTensor, head_axis: int = 1, dtype=jnp.float32) -> jax.Array:
    """Reference dequant (kernels fold this into their matmuls instead)."""
    scale = _scale_shape(qt.values.ndim, head_axis, qt.scales)
    return (qt.values.astype(jnp.float32) * scale).astype(dtype)


def quantize_weight(w: jax.Array, mode: QuantMode = "int8") -> dict:
    """Weight-only quantization with PER-OUTPUT-CHANNEL scales.

    ``w``: (..., H, O) — scales reduce over the contraction axis (-2), shape
    (..., O), so ``dequant = w_q * scale[..., None, :]`` and the scale folds
    into the matmul output (ops/quant_matmul.py). Returns
    ``{"w": quantized, "scale": fp32}`` — the pytree form model weights take
    when quantized (models/llama.quantize_model_weights).
    """
    if mode == "none":
        raise ValueError("quantize_weight requires int8 or fp8")
    qmax = INT8_MAX if mode == "int8" else FP8_MAX
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.where(absmax == 0.0, 1.0, absmax / qmax)
    scaled = w.astype(jnp.float32) / scale[..., None, :]
    if mode == "int8":
        q = jnp.clip(jnp.round(scaled), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    else:
        q = _to_fp8(scaled)
    return {"w": q, "scale": scale}


def dequantize_weight(wq: dict, dtype=jnp.float32) -> jax.Array:
    """Reference dequant (the kernel folds this into its output write)."""
    return (wq["w"].astype(jnp.float32) * wq["scale"][..., None, :]).astype(dtype)


def quantize_value(x: jax.Array, scales: jax.Array, mode: QuantMode, head_axis: int = 1) -> jax.Array:
    """Quantize new K/V rows with EXISTING per-head scales (cache append path:
    the cache's scales are fixed at allocation/calibration time so appended
    tokens quantize against them without a rescan)."""
    if mode == "none":
        return x
    inv = 1.0 / _scale_shape(x.ndim, head_axis, scales)
    scaled = x.astype(jnp.float32) * inv
    if mode == "int8":
        return jnp.clip(jnp.round(scaled), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    if mode == "fp8":
        return _to_fp8(scaled)
    raise ValueError(f"unknown quant mode {mode!r}")
