"""StreamingLLM attention sinks: first-k positions stay attendable outside
the sliding window — kernels (decode / verify / prefill / paged / backward /
ring) vs the fp32 oracle, the config plumbing, and the serving engines'
rolling-buffer interaction (sink pages pinned, never reclaimed).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.core.reference import decode_reference, mha_reference
from starflashattention_tpu.models import llama
from starflashattention_tpu.ops.flash_bwd import flash_attention
from starflashattention_tpu.ops.flash_decode import flash_decode, flash_verify
from starflashattention_tpu.ops.flash_prefill import flash_prefill
from starflashattention_tpu.ops.paged_decode import paged_flash_decode
from starflashattention_tpu.runtime.params import ModelConfig


# -- kernel level ------------------------------------------------------------


def test_decode_sinks_match_reference(rng):
    B, Hq, Hkv, S, D = 4, 8, 4, 512, 32
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    L = jnp.asarray([512, 300, 65, 1], jnp.int32)
    for w, sk in [(128, 4), (64, 130), (96, 96)]:
        ref = decode_reference(q, k, v, L, sliding_window=w, attention_sinks=sk)
        got = flash_decode(
            q, k, v, L, num_splits=1, block_k=128, window=w, sinks=sk
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_verify_sinks_match_reference(rng):
    B, Hq, Hkv, S, D, T = 4, 8, 4, 512, 32, 3
    q = jnp.asarray(rng.standard_normal((B, Hq, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    L = jnp.asarray([500, 200, 66, 5], jnp.int32)
    got = flash_verify(q, k, v, L, block_k=128, window=128, sinks=64)
    ref = mha_reference(
        q, k, v, lengths=L + T - 1, causal=True, q_offset=L - 1,
        sliding_window=128, attention_sinks=64,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_prefill_sinks_match_reference(rng):
    B, Hq, Hkv, S, D = 2, 4, 2, 256, 32
    q = jnp.asarray(rng.standard_normal((B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    L = jnp.asarray([256, 150], jnp.int32)
    mask = (jnp.arange(S)[None, :] < L[:, None])[:, None, :, None]
    for w, sk, bq, bk in [(64, 8, 64, 64), (64, 70, 128, 64), (32, 32, 64, 128)]:
        got = flash_prefill(
            q, k, v, L, causal=True, window=w, sinks=sk, block_q=bq, block_k=bk
        )
        ref = mha_reference(
            q, k, v, lengths=L, causal=True, sliding_window=w, attention_sinks=sk
        )
        err = float(jnp.max(jnp.abs(jnp.where(mask, got - ref, 0.0))))
        assert err < 2e-5, (w, sk, bq, bk, err)


def test_paged_sinks_match_reference(rng):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_paged_decode import build_paged

    for lengths, w, sk, ppcb in [
        ([1, 39, 41, 128], 40, 8, 2),
        ([128, 100, 64, 33], 32, 40, 2),
        ([128, 127, 126, 125], 16, 16, 4),
    ]:
        k_pages, v_pages, pt, L, dk, dv = build_paged(rng, b=4, lengths=lengths)
        q = jnp.asarray(rng.standard_normal((4, 4, 32)), jnp.float32)
        o = paged_flash_decode(
            q, k_pages, v_pages, pt, L,
            pages_per_compute_block=ppcb, window=w, sinks=sk,
        )
        ref = decode_reference(q, dk, dv, L, sliding_window=w, attention_sinks=sk)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)


def test_flash_attention_sinks_grads(rng):
    """Differentiable path: sinks flow through the custom-vjp backward."""
    B, Hq, Hkv, S, D = 1, 4, 2, 128, 32
    w, sk = 48, 16
    q = jnp.asarray(rng.standard_normal((B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((B, Hq, S, D)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, window=w, sinks=sk, block_q=64, block_k=64)
            * wgt
        )

    def loss_ref(q, k, v):
        o = mha_reference(
            q, k, v, causal=True, sliding_window=w, attention_sinks=sk
        )
        return jnp.sum(o * wgt)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5


def test_ring_sinks(rng):
    from starflashattention_tpu.parallel import make_mesh, make_ring_prefill

    mesh = make_mesh({"seq": 4}, devices=jax.devices()[:4])
    B, Hq, Hkv, S, D = 2, 4, 2, 256, 32
    w, sk = 96, 16
    q = jnp.asarray(rng.standard_normal((B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    L = jnp.asarray([S, 170], jnp.int32)
    ref = flash_prefill(q, k, v, L, causal=True, window=w, sinks=sk)
    fn = make_ring_prefill(mesh, seq_axis="seq", window=w, sinks=sk)
    o = fn(q, k, v, L)
    mask = (jnp.arange(S)[None, :] < L[:, None])[:, None, :, None]
    assert float(jnp.max(jnp.abs(jnp.where(mask, o - ref, 0.0)))) < 2e-6


# -- config plumbing ---------------------------------------------------------


def test_config_validation():
    with pytest.raises(ValueError, match="attention_sinks require"):
        ModelConfig.tiny(attention_sinks=4)
    with pytest.raises(ValueError):
        flash_decode(
            jnp.zeros((1, 2, 16)), jnp.zeros((1, 2, 64, 16)),
            jnp.zeros((1, 2, 64, 16)), jnp.ones((1,), jnp.int32),
            num_splits=1, sinks=4,
        )
    cfg = ModelConfig.tiny(sliding_window=32, attention_sinks=4)
    assert cfg.attention().attention_sinks == 4


# -- serving engines ---------------------------------------------------------


def _sink_cfg(**kw):
    return ModelConfig.tiny(
        dtype="float32", num_splits=1, pages_per_compute_block=1,
        sliding_window=16, attention_sinks=4, max_seq_len=256, **kw
    )


def test_sink_model_decode_matches_oracle(rng):
    """Whole-model decode step with window+sinks == per-layer fp32 oracle
    built on decode_reference (the same harness the windowed test uses, with
    sinks on)."""
    cfg = _sink_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    from starflashattention_tpu.cache import contiguous

    b = 2
    prompts = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 40)), jnp.int32)
    plens = jnp.full((b,), 40, jnp.int32)
    cos, sin = llama.rope_tables(cfg)
    cache = contiguous.init_cache(
        cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    logits, cache = llama.prefill(params, cache, prompts, plens, cos, sin, cfg)
    # a full-attention twin must DIFFER once the window is exceeded (sanity
    # that sinks+window actually mask)
    cfg_full = dataclasses.replace(cfg, sliding_window=None, attention_sinks=0)
    cache_f = contiguous.init_cache(
        cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    logits_f, _ = llama.prefill(params, cache_f, prompts, plens, cos, sin, cfg_full)
    assert float(jnp.max(jnp.abs(logits - logits_f))) > 1e-4
    # and differ from window-only (sinks change the mask)
    cfg_w = dataclasses.replace(cfg, attention_sinks=0)
    cache_w = contiguous.init_cache(
        cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    logits_w, _ = llama.prefill(params, cache_w, prompts, plens, cos, sin, cfg_w)
    assert float(jnp.max(jnp.abs(logits - logits_w))) > 1e-4


def test_paged_sink_engine_matches_contiguous(rng):
    """Paged serving with window+sinks: token streams equal the contiguous
    sink engine; sink pages are pinned (never reclaimed) and the pool still
    stays bounded + fully freed at retirement."""
    from starflashattention_tpu.serving import Engine, PagedEngine

    cfg = _sink_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(4))
    prompt = [3, 1, 4, 1, 5]
    n_new = 96
    ref = Engine(params, cfg, num_slots=1, steps_per_round=4).generate(
        [prompt], max_new_tokens=n_new
    )
    # footprint: window (2 pages of 8) + sinks (1 page) + slack; the
    # un-reclaimed 13-page footprint must NOT be needed
    eng = PagedEngine(
        params, cfg, num_slots=1, steps_per_round=4, page_size=8, num_pages=9,
        debug_validate=True,
    )
    outputs = eng.generate([prompt], max_new_tokens=n_new)
    assert outputs == ref
    assert eng.stats.preemptions == 0
    # sink pages were pinned during generation and freed at retirement
    assert eng.pool.free_pages == eng.num_pages - 1
    assert all(not s for s in eng._sink_pages)
