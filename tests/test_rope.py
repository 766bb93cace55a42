"""RoPE tests, including a port-free cross-check against the HF-Llama-style
rotate_half convention used by the reference's golden model
(testFlashDecoder.py:28-58) and the interleaved convention used by its CUDA
kernel (flash_attn.cu:167-189)."""

import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.core.rope import apply_rope, rope_table


def numpy_rope_half(x, pos, rot_dim, base=10000.0):
    half = rot_dim // 2
    inv_freq = 1.0 / (base ** (np.arange(0, rot_dim, 2) / rot_dim))
    ang = np.asarray(pos)[..., None] * inv_freq  # (..., half)
    cos, sin = np.cos(ang), np.sin(ang)
    x1, x2 = x[..., :half], x[..., half:rot_dim]
    out = x.copy()
    out[..., :half] = x1 * cos - x2 * sin
    out[..., half:rot_dim] = x2 * cos + x1 * sin
    return out


def numpy_rope_interleaved(x, pos, rot_dim, base=10000.0):
    half = rot_dim // 2
    inv_freq = 1.0 / (base ** (np.arange(0, rot_dim, 2) / rot_dim))
    ang = np.asarray(pos)[..., None] * inv_freq
    cos, sin = np.cos(ang), np.sin(ang)
    out = x.copy()
    x1, x2 = x[..., 0:rot_dim:2], x[..., 1:rot_dim:2]
    out[..., 0:rot_dim:2] = x1 * cos - x2 * sin
    out[..., 1:rot_dim:2] = x2 * cos + x1 * sin
    return out


def test_table_matches_formula():
    cos, sin = rope_table(16, 8)
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, 8, 2) / 8))
    ang = np.arange(16)[:, None] * inv_freq
    np.testing.assert_allclose(np.asarray(cos), np.cos(ang), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), np.sin(ang), rtol=1e-6)


def test_half_style(rng):
    x = rng.standard_normal((2, 3, 5, 64), dtype=np.float32)
    pos = rng.integers(0, 100, size=(2, 3, 5))
    cos, sin = rope_table(128, 64)
    got = apply_rope(jnp.array(x), jnp.array(pos), cos, sin, style="half")
    expect = numpy_rope_half(x, pos, 64)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-5, atol=2e-5)


def test_interleaved_style(rng):
    x = rng.standard_normal((4, 32), dtype=np.float32)
    pos = np.arange(4)
    cos, sin = rope_table(8, 32)
    got = apply_rope(jnp.array(x), jnp.array(pos), cos, sin, style="interleaved")
    expect = numpy_rope_interleaved(x, pos, 32)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-5, atol=2e-5)


def test_partial_rotary_dim(rng):
    # Only the first rotary_dim features rotate (flash_attn.cu:668-689 analog).
    x = rng.standard_normal((3, 128), dtype=np.float32)
    pos = np.array([5, 9, 0])
    cos, sin = rope_table(16, 64)
    got = np.asarray(apply_rope(jnp.array(x), jnp.array(pos), cos, sin))
    np.testing.assert_allclose(got[:, 64:], x[:, 64:])  # passthrough
    expect = numpy_rope_half(x[:, :64], pos, 64)
    np.testing.assert_allclose(got[:, :64], expect, rtol=2e-5, atol=2e-5)


def test_leading_batch_positions_broadcast_over_heads(rng):
    # Decode ergonomics: positions (B,) against x (B, H, D) must broadcast.
    x = rng.standard_normal((2, 4, 32), dtype=np.float32)
    pos = np.array([3, 7])
    cos, sin = rope_table(16, 32)
    got = np.asarray(apply_rope(jnp.array(x), jnp.array(pos), cos, sin))
    expect = numpy_rope_half(x, pos[:, None], 32)
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)


def test_position_zero_is_identity(rng):
    x = rng.standard_normal((2, 32), dtype=np.float32)
    cos, sin = rope_table(4, 32)
    got = apply_rope(jnp.array(x), jnp.zeros((2,), jnp.int32), cos, sin)
    np.testing.assert_allclose(np.asarray(got), x, rtol=1e-6)
