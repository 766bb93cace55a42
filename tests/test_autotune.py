"""runtime/autotune.py: geometry enumeration, measured pick, memoization.

The reference's knobs are hardcoded per-GPU (flash_api.cpp:35-40 and the
"tuned for 3090" TODO at flash_attn.cu:1024); the tuner replaces that with an
on-device sweep, so the tests check the sweep's *contract* (valid geometries,
winner comes from the candidate set, cache hit skips re-measurement) rather
than any particular winner.
"""

import numpy as np
import pytest

from starflashattention_tpu.runtime.autotune import (
    DecodeAutotuner,
    DecodeConfig,
    candidate_decode_configs,
    default_decode_config,
)


def test_candidates_tile_exactly():
    for s in (512, 2048, 8192):
        cands = candidate_decode_configs(s, num_kv_heads=8, head_dim=128)
        assert cands
        for c in cands:
            assert s % (c.num_splits * c.block_k) == 0


def test_candidates_respect_vmem_budget():
    # 32 KV heads × block 1024 × 128 × 2B × 4 = 32 MiB > budget → excluded
    cands = candidate_decode_configs(8192, num_kv_heads=32, head_dim=128)
    assert all(4 * 32 * c.block_k * 128 * 2 <= 24 << 20 for c in cands)


def test_default_config_valid():
    for b, s in [(1, 1024), (64, 8192), (2, 512)]:
        c = default_decode_config(b, s)
        assert s % (c.num_splits * c.block_k) == 0


def test_autotuner_measures_and_memoizes(rng, tmp_path):
    import jax.numpy as jnp

    b, hq, hkv, s, d = 2, 4, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    lengths = jnp.asarray([200, 256], jnp.int32)

    path = tmp_path / "tune.json"
    tuner = DecodeAutotuner(cache_path=path)
    cfg = tuner.best(q, k, v, lengths)
    assert isinstance(cfg, DecodeConfig)
    assert s % (cfg.num_splits * cfg.block_k) == 0
    assert path.exists()

    # Second tuner instance: loads from disk, must not re-measure.
    tuner2 = DecodeAutotuner(cache_path=path)
    tuner2._measure = None  # would raise if called
    assert tuner2.best(q, k, v, lengths) == cfg


def test_degenerate_cache_length_raises(rng):
    import jax.numpy as jnp

    from starflashattention_tpu.ops.flash_decode import flash_decode

    b, hq, hkv, d = 1, 2, 1, 64
    s = 509  # prime: no tiling exists
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    lengths = jnp.asarray([100], jnp.int32)
    with pytest.raises(ValueError, match="multiple of 512"):
        flash_decode(q, k, v, lengths)


def test_autotuner_paged_and_prefill_memoize(rng, tmp_path):
    import jax.numpy as jnp

    from starflashattention_tpu.runtime.autotune import PagedConfig, PrefillConfig

    path = tmp_path / "tune.json"
    tuner = DecodeAutotuner(cache_path=path)

    # paged: B=2, Hkv=2, 4 pages/seq of 16 tokens
    b, hq, hkv, d, ps, pps = 2, 4, 2, 64, 16, 4
    num_pages = b * pps + 1
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((hkv, num_pages, ps, d)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((hkv, num_pages, ps, d)), jnp.float32)
    pt = jnp.arange(1, 1 + b * pps, dtype=jnp.int32).reshape(b, pps)
    lengths = jnp.asarray([30, 64], jnp.int32)
    pcfg = tuner.best_paged(q, kp, vp, pt, lengths)
    assert isinstance(pcfg, PagedConfig)
    assert pps % pcfg.pages_per_compute_block == 0

    # prefill
    sq, s = 32, 64
    qp = jnp.asarray(rng.standard_normal((b, hq, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    fcfg = tuner.best_prefill(qp, k, v, jnp.asarray([30, 64], jnp.int32))
    assert isinstance(fcfg, PrefillConfig)

    # reload from disk: typed entries survive the round-trip, no re-measure
    tuner2 = DecodeAutotuner(cache_path=path)
    tuner2._measure = None
    assert tuner2.best_paged(q, kp, vp, pt, lengths) == pcfg
    assert tuner2.best_prefill(qp, k, v, jnp.asarray([30, 64], jnp.int32)) == fcfg
