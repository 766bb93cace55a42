"""Rotary position embeddings (RoPE).

Capability parity with the reference's RoPE subsystem
(/root/reference/src/flash_attn.cu:161-257 device transforms;
:512-538 cos/sin table precompute; examples/python/testFlashDecoder.py:7-58
half-split golden variant), re-expressed as vectorized jnp on the VPU.

Two rotation conventions exist in the reference:
  * ``interleaved`` — adjacent element pairs (x[2i], x[2i+1]) are rotated
    (the CUDA kernel's convention, flash_attn.cu:167-189).
  * ``half``        — the vector is split in halves and (x[i], x[i+D/2]) pairs
    are rotated (the PyTorch golden model's ``rotate_half`` convention,
    testFlashDecoder.py:28-35; this is the HF-Llama convention).
Both are supported; ``half`` is the default because the golden model defines
the numerics contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def llama3_scaled_inv_freq(
    inv_freq: jax.Array,
    factor: float = 8.0,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    original_max_position: int = 8192,
) -> jax.Array:
    """Llama-3.1 frequency warping (HF ``rope_scaling.rope_type="llama3"``).

    Long wavelengths (> orig_ctx / low_freq_factor) slow down by ``factor``
    (position interpolation), short ones (< orig_ctx / high_freq_factor)
    keep the pretrained frequencies, and the band between interpolates
    smoothly — the recipe that stretches an 8k-pretrained base to 128k.
    """
    wavelen = 2.0 * jnp.pi / inv_freq
    low_wl = original_max_position / low_freq_factor
    high_wl = original_max_position / high_freq_factor
    smooth = (original_max_position / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    mid = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
    out = jnp.where(wavelen > low_wl, inv_freq / factor, inv_freq)
    return jnp.where(
        (wavelen <= low_wl) & (wavelen >= high_wl), mid, out
    )


def rope_table(
    max_seq_len: int,
    rotary_dim: int,
    base: float = 10000.0,
    dtype: jnp.dtype = jnp.float32,
    scaling: tuple | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Precompute cos/sin tables shaped ``(max_seq_len, rotary_dim // 2)``.

    freq(i) = pos / base**(2i / rotary_dim) — matches the reference's
    rotary_table_kernel (flash_attn.cu:512-529).

    ``scaling``: optional RoPE frequency warp, as a hashable tuple so it
    rides a frozen config: ``("llama3", factor, low_freq_factor,
    high_freq_factor, original_max_position)`` (Llama-3.1-style),
    ``("linear", factor)`` (classic position interpolation), or
    ``("longrope", original_max_position, target_max_position,
    short_factors, long_factors)`` (Phi-3-style per-dim rescale: factors are
    length-rotary_dim/2 tuples). The regime AND the
    sqrt(1 + ln(target/orig)/ln(orig)) attention mscale derive from
    ``target_max_position`` — the CHECKPOINT's max_position_embeddings, not
    this table's length — matching HF's attention_factor exactly even when
    the serving table is shorter than the checkpoint's full range. A
    long-context deployment (target > orig) uses the long factors + mscale
    for every prompt (the static-table form of HF's runtime switch).
    """
    if rotary_dim % 2:
        raise ValueError(f"rotary_dim must be even, got {rotary_dim}")
    inv_freq = 1.0 / (base ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim))
    mscale = 1.0
    if scaling is not None:
        kind = scaling[0]
        if kind == "llama3":
            inv_freq = llama3_scaled_inv_freq(inv_freq, *scaling[1:])
        elif kind == "linear":
            inv_freq = inv_freq / float(scaling[1])
        elif kind == "longrope":
            import math as _math

            _, orig_max, target_max, short_f, long_f = scaling
            for name, f in (("short", short_f), ("long", long_f)):
                if len(f) != rotary_dim // 2:
                    raise ValueError(
                        f"longrope {name}_factors length {len(f)} != "
                        f"rotary_dim/2 ({rotary_dim // 2})"
                    )
            long_regime = target_max > orig_max
            factors = long_f if long_regime else short_f
            inv_freq = inv_freq / jnp.asarray(factors, jnp.float32)
            if long_regime:
                # attention mscale folds into BOTH tables (cos and sin scale
                # the rotated q/k identically, so scores scale by mscale^2 —
                # exactly HF's attention_factor semantics). Derived from the
                # CHECKPOINT's target length, not this table's.
                mscale = _math.sqrt(
                    1.0 + _math.log(target_max / orig_max) / _math.log(orig_max)
                )
        else:
            raise ValueError(
                f"unknown rope scaling {kind!r} "
                "(supported: llama3, linear, longrope)"
            )
    pos = jnp.arange(max_seq_len, dtype=jnp.float32)
    angles = pos[:, None] * inv_freq[None, :]  # (S, rot/2)
    return (
        (jnp.cos(angles) * mscale).astype(dtype),
        (jnp.sin(angles) * mscale).astype(dtype),
    )


@functools.partial(jax.jit, static_argnames=("style",))
def apply_rope(
    x: jax.Array,
    positions: jax.Array,
    cos_table: jax.Array,
    sin_table: jax.Array,
    style: str = "half",
) -> jax.Array:
    """Rotate the leading ``rotary_dim`` features of ``x`` by position.

    Args:
      x: ``(..., D)``; only the first ``2 * cos_table.shape[-1]`` features
        rotate, the rest pass through (reference rotates only
        ``rotary_embedding_dim`` features, flash_attn.cu:668-689).
      positions: integer array broadcastable to ``x.shape[:-1]``.
      cos_table / sin_table: from :func:`rope_table`.
      style: ``"half"`` or ``"interleaved"``.
    """
    half = cos_table.shape[-1]
    rot = 2 * half
    d = x.shape[-1]
    if rot > d:
        raise ValueError(f"rotary_dim {rot} exceeds head_dim {d}")
    positions = jnp.asarray(positions)
    # Right-pad positions with singleton dims so a leading-batch positions
    # array, e.g. (B,) against x of (B, H, D), broadcasts over the head dims.
    if positions.ndim < x.ndim - 1:
        positions = positions.reshape(
            positions.shape + (1,) * (x.ndim - 1 - positions.ndim)
        )
    cos = cos_table[positions].astype(jnp.float32)  # (..., half)
    sin = sin_table[positions].astype(jnp.float32)

    xr = x[..., :rot].astype(jnp.float32)
    if style == "half":
        x1, x2 = xr[..., :half], xr[..., half:]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        rotated = jnp.concatenate([r1, r2], axis=-1)
    elif style == "interleaved":
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        rotated = jnp.stack([r1, r2], axis=-1).reshape(xr.shape)
    else:
        raise ValueError(f"unknown rope style: {style!r}")

    rotated = rotated.astype(x.dtype)
    if rot == d:
        return rotated
    return jnp.concatenate([rotated, x[..., rot:]], axis=-1)
