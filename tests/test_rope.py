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


def test_llama3_rope_scaling_matches_hf_formula():
    """rope_table(scaling=("llama3", ...)) == an independent transcription
    of HF's Llama-3.1 frequency warp; linear scaling == plain position
    interpolation; unknown kinds rejected."""
    import numpy as np
    import pytest

    from starflashattention_tpu.core.rope import rope_table

    dim, base, S = 64, 500000.0, 256
    factor, lo_f, hi_f, orig = 8.0, 1.0, 4.0, 8192
    cos, sin = rope_table(
        S, dim, base=base, scaling=("llama3", factor, lo_f, hi_f, orig)
    )

    # independent numpy transcription of the HF recipe (float32 end to end
    # — the table is built in f32, and cos at angle ~200 amplifies any
    # dtype difference far past table precision)
    inv = (1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float32) / np.float32(dim)))).astype(np.float32)
    wavelen = (2 * np.pi / inv).astype(np.float32)
    scaled = np.empty_like(inv)
    for i, (f, wl) in enumerate(zip(inv, wavelen)):
        if wl > orig / lo_f:
            scaled[i] = f / factor
        elif wl < orig / hi_f:
            scaled[i] = f
        else:
            s = (orig / wl - lo_f) / (hi_f - lo_f)
            scaled[i] = (1 - s) * f / factor + s * f
    ang = (np.arange(S, dtype=np.float32)[:, None] * scaled[None, :]).astype(np.float32)
    np.testing.assert_allclose(np.asarray(cos), np.cos(ang), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sin), np.sin(ang), atol=2e-5)

    cos_l, _ = rope_table(S, dim, base=base, scaling=("linear", 4.0))
    cos_p, _ = rope_table(S, dim, base=base)
    # linear scaling at position 4p == unscaled at position p
    np.testing.assert_allclose(
        np.asarray(cos_l)[4 * 10], np.asarray(cos_p)[10], atol=1e-5
    )
    with pytest.raises(ValueError, match="unknown rope scaling"):
        rope_table(S, dim, scaling=("yarn", 2.0))


def test_llama31_preset_serves():
    """The llama31_8b preset (trimmed) runs the decode path with warped
    tables — the scaling changes logits vs the unwarped twin."""
    import dataclasses

    import jax
    import numpy as np

    from starflashattention_tpu.cache import contiguous
    from starflashattention_tpu.models import llama
    from starflashattention_tpu.runtime.params import ModelConfig

    cfg = ModelConfig.llama31_8b(
        num_layers=1, vocab_size=128, hidden_size=64, num_q_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=128, max_seq_len=128,
        dtype="float32",
    )
    assert cfg.rope_scaling[0] == "llama3"
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    cos, sin = llama.rope_tables(cfg)
    cache = contiguous.init_cache(
        cfg.num_layers, 1, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    toks = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    lg, _ = llama.prefill(params, cache, toks, jnp.asarray([8], jnp.int32),
                          cos, sin, cfg)
    cfg0 = dataclasses.replace(cfg, rope_scaling=None)
    cos0, sin0 = llama.rope_tables(cfg0)
    cache0 = contiguous.init_cache(
        cfg.num_layers, 1, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    lg0, _ = llama.prefill(params, cache0, toks, jnp.asarray([8], jnp.int32),
                           cos0, sin0, cfg0)
    assert np.isfinite(np.asarray(lg)).all()
    assert float(jnp.max(jnp.abs(lg - lg0))) > 1e-6


def test_longrope_mscale_uses_checkpoint_target_not_table_length():
    """The attention mscale must derive from the CHECKPOINT's
    max_position_embeddings (scaling[2]), not the serving table's length —
    a capped table (config_from_hf caps max_seq_len at 8192) must still
    scale like HF's attention_factor for the full-range checkpoint."""
    import math

    import jax.numpy as jnp

    from starflashattention_tpu.core.rope import rope_table

    half = 8
    short = tuple(1.0 for _ in range(half))
    long = tuple(2.0 for _ in range(half))
    orig, target, table_len = 16, 256, 64  # table SHORTER than target
    cos, sin = rope_table(
        table_len, 2 * half, scaling=("longrope", orig, target, short, long)
    )
    want = math.sqrt(1.0 + math.log(target / orig) / math.log(orig))
    # pos 0: angles are 0 -> cos row is exactly the mscale
    assert abs(float(cos[0, 0]) - want) < 1e-6
    # long regime selected: frequencies divided by the long factors (2.0) —
    # pos*inv/2 at pos 2 equals the unscaled table's pos 1
    cos1, _ = rope_table(
        table_len, 2 * half, scaling=("longrope", orig, orig, short, short)
    )
    assert abs(float(cos1[0, 0]) - 1.0) < 1e-6  # short regime: no mscale
