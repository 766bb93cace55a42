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


WeightQuantMode = Literal["int8", "fp8", "int4"]


def quantize_weight(w: jax.Array, mode: WeightQuantMode = "int8") -> dict:
    """Weight-only quantization with PER-OUTPUT-CHANNEL scales.

    ``w``: (..., H, O) — scales reduce over the contraction axis (-2), shape
    (..., O), so ``dequant = w_q * scale[..., None, :]`` and the scale folds
    into the matmul output (ops/quant_matmul.py). Returns
    ``{"w": quantized, "scale": fp32}`` — the pytree form model weights take
    when quantized (models/llama.quantize_model_weights).

    ``mode="int4"`` routes to the nibble-packed GROUPED scheme below (its
    dict has (..., G, O) scales — see is_int4_weight).
    """
    if mode == "int4":
        return quantize_weight_int4(w)
    if mode == "none":
        raise ValueError("quantize_weight requires int8, fp8, or int4")
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
    if is_int4_weight(wq):
        return dequantize_weight_int4(wq, dtype)
    return (wq["w"].astype(jnp.float32) * wq["scale"][..., None, :]).astype(dtype)


# ---------------------------------------------------------------------------
# INT4 weights: nibble-packed, GROUPED contraction-axis scales
# ---------------------------------------------------------------------------

INT4_MAX = 7.0  # symmetric ±7; -8 stays unused so dequant is scale-symmetric
# Contraction rows per scale group (divides every 7B/MoE H). Default g128,
# not g256: measured on the trained checkpoint (benchmarks/quant_accuracy.py
# real_checkpoint + exp_int4_group_sweep_accuracy_real), g256 costs +55% ppl
# vs +24.7% at g128 for only ~5% kernel slowdown at the 7B decode shapes
# (exp_int4_group_sweep_kernel) — the accuracy-per-byte trade favors g128.
INT4_GROUP = 128


def default_int4_group(h: int, cap: int = INT4_GROUP) -> int:
    """Largest group ≤ ``cap`` that divides ``h`` evenly (tiny test
    geometries have h < 256). Must be even: nibbles pair within a group."""
    g = min(cap, h)
    while h % g or g % 2:
        g -= 1
    return g


def quantize_weight_int4(w: jax.Array, group: int | None = None) -> dict:
    """4-bit weight-only quantization, two values per int8 byte, with
    per-(group, output-channel) scales.

    ``w``: (..., H, O) → ``{"w": int8 (..., H/2, O), "scale": f32 (..., G, O)}``
    with G = H/group. Per-column-only scales (the int8 scheme) are too coarse
    at 4 bits; grouping along the contraction axis is the standard fix and
    costs 4·H·O/group bytes — ~0.2% of the packed weight at group 256.

    Packing pairs rows WITHIN a group: byte r of group g holds row
    ``g·group + r`` in its low nibble and row ``g·group + group/2 + r`` in
    its high nibble. Consequences the kernel and TP sharding rely on:
    - one packed block maps to one contiguous activation slice (the group),
      so the kernel consumes x in natural column order, and
    - a row-shard cut at any group boundary never splits a byte
      (parallel/tp.py shards w_down/wo along H in H/tp chunks; any tp with
      (H/tp) % group == 0 keeps byte pairs intact).
    """
    *lead, h, o = w.shape
    # `group` is a CAP: each tensor uses the largest even divisor of its own
    # contraction dim ≤ group (model layers have different contraction dims;
    # a fixed size cannot divide all of them).
    group = default_int4_group(h, group or INT4_GROUP)
    assert h % group == 0 and group % 2 == 0, (h, group)
    g, half = h // group, group // 2
    wg = w.astype(jnp.float32).reshape(*lead, g, group, o)
    absmax = jnp.max(jnp.abs(wg), axis=-2)  # (..., G, O)
    scale = jnp.where(absmax == 0.0, 1.0, absmax / INT4_MAX)
    q = jnp.clip(jnp.round(wg / scale[..., None, :]), -INT4_MAX, INT4_MAX)
    q = q.astype(jnp.int8)
    lo, hi = q[..., :half, :], q[..., half:, :]
    # low nibble stored BIASED (+8, unsigned 1..15): the kernel then unpacks
    # both nibbles with bf16 LANE ops only — hi = floor(p/16) (arithmetic
    # shift semantics survive the float divide: lo+8 >= 0), lo = p-16·hi-8 —
    # avoiding the int8→int32 relayout a shift-based sign extension costs on
    # the VPU (measured 478 vs 727 GB/s effective stream).
    packed = ((lo + jnp.int8(8)) & jnp.int8(0x0F)) | (hi << 4)
    return {"w": packed.reshape(*lead, h // 2, o), "scale": scale}


def unpack_int4(packed: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(lo, hi) int32 nibbles — the fp reference unpack (the kernel does the
    same arithmetic in bf16; exact: all intermediates are ≤8-bit integers)."""
    p = packed.astype(jnp.int32)
    hi = p >> 4  # arithmetic: int8 sign lives in bit 7
    lo = (p & 15) - 8
    return lo, hi


def is_int4_weight(wq: dict) -> bool:
    """int8/fp8 weights carry (..., O) scales; int4 carries (..., G, O) —
    same rank as the packed payload. That rank difference IS the format tag
    (a non-array marker in the pytree would confuse jit flattening)."""
    return (
        isinstance(wq, dict) and "w" in wq
        and wq["scale"].ndim == wq["w"].ndim
    )


def dequantize_weight_int4(wq: dict, dtype=jnp.float32) -> jax.Array:
    """Reference unpack+dequant (the kernel fuses this into its matmul)."""
    packed, scale = wq["w"], wq["scale"]
    *lead, hp, o = packed.shape
    g = scale.shape[-2]
    half = hp // g
    lo, hi = unpack_int4(packed.reshape(*lead, g, half, o))
    q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
    w = q * scale[..., None, :]
    return w.reshape(*lead, 2 * hp, o).astype(dtype)


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
