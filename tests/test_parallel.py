"""Multi-chip sharding on the virtual 8-device CPU mesh (SURVEY.md §4).

TP decode/prefill must match the single-chip model bit-for-bit (same math,
different layout); the sequence-sharded cross-chip split-KV decode must match
the dense reference.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.cache import contiguous
from starflashattention_tpu.core.reference import decode_reference
from starflashattention_tpu.models import llama
from starflashattention_tpu.parallel import (
    make_mesh,
    make_seq_sharded_decode,
    make_tp_decode_step,
    make_tp_prefill,
    shard_cache,
    shard_params,
)
from starflashattention_tpu.runtime.params import ModelConfig

CFG = ModelConfig.tiny(num_q_heads=8, num_kv_heads=4, dtype="float32")


@pytest.fixture
def mesh24():
    return make_mesh({"data": 2, "model": 4})


def test_make_mesh_shapes():
    m = make_mesh({"data": 2, "model": -1})
    assert m.shape["data"] == 2 and m.shape["model"] == 4
    with pytest.raises(ValueError):
        make_mesh({"data": 3, "model": 4})


def test_tp_decode_matches_single_chip(mesh24, rng):
    b = 4
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    cos, sin = llama.rope_tables(CFG)
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (b,)), jnp.int32)

    cache_1 = contiguous.init_cache(CFG.num_layers, b, CFG.num_kv_heads, CFG.max_seq_len, CFG.head_dim, dtype=jnp.float32)
    logits_1, cache_1 = llama.decode_step(params, cache_1, toks, cos, sin, CFG)

    step = make_tp_decode_step(mesh24, CFG)
    cache_n = contiguous.init_cache(CFG.num_layers, b, CFG.num_kv_heads, CFG.max_seq_len, CFG.head_dim, dtype=jnp.float32)
    cache_n = shard_cache(cache_n, mesh24)
    params_n = shard_params(params, mesh24, CFG)
    logits_n, cache_n = step(params_n, cache_n, toks, cos, sin)

    np.testing.assert_allclose(np.asarray(logits_n), np.asarray(logits_1), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(cache_n.k), np.asarray(cache_1.k), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(cache_n.lengths), np.asarray(cache_1.lengths))


def test_tp_prefill_then_decode(mesh24, rng):
    b, sp = 2, 6
    params = llama.init_params(CFG, jax.random.PRNGKey(1))
    cos, sin = llama.rope_tables(CFG)
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (b, sp)), jnp.int32)
    plens = jnp.asarray([sp, 3], jnp.int32)

    cache_1 = contiguous.init_cache(CFG.num_layers, b, CFG.num_kv_heads, CFG.max_seq_len, CFG.head_dim, dtype=jnp.float32)
    logits_1, cache_1 = llama.prefill(params, cache_1, toks, plens, cos, sin, CFG)

    pre = make_tp_prefill(mesh24, CFG)
    step = make_tp_decode_step(mesh24, CFG)
    cache_n = shard_cache(
        contiguous.init_cache(CFG.num_layers, b, CFG.num_kv_heads, CFG.max_seq_len, CFG.head_dim, dtype=jnp.float32),
        mesh24,
    )
    params_n = shard_params(params, mesh24, CFG)
    logits_n, cache_n = pre(params_n, cache_n, toks, plens, cos, sin)
    np.testing.assert_allclose(np.asarray(logits_n), np.asarray(logits_1), atol=2e-4, rtol=2e-4)

    tok1 = jnp.argmax(logits_1, -1).astype(jnp.int32)
    logits_1b, _ = llama.decode_step(params, cache_1, tok1, cos, sin, CFG)
    logits_nb, _ = step(params_n, cache_n, tok1, cos, sin)
    np.testing.assert_allclose(np.asarray(logits_nb), np.asarray(logits_1b), atol=2e-4, rtol=2e-4)


def test_seq_sharded_decode_matches_reference(rng):
    mesh = make_mesh({"model": 8})
    b, hq, hkv, s, d = 2, 8, 4, 512, 32
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    lengths = jnp.asarray([100, 512], jnp.int32)  # seq 0: most shards empty

    fn = make_seq_sharded_decode(mesh, num_splits=2, block_k=32)
    o = fn(q, k, v, lengths)
    ref = decode_reference(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_seq_sharded_decode_head_chunked_matches(rng):
    """head_chunks (collective/compute overlap structure) must not change
    the math — each chunk merges independently."""
    mesh = make_mesh({"model": 8})
    b, hq, hkv, s, d = 2, 8, 4, 512, 32
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    lengths = jnp.asarray([100, 512], jnp.int32)

    ref = decode_reference(q, k, v, lengths)
    for chunks in (2, 4):
        fn = make_seq_sharded_decode(
            mesh, num_splits=2, block_k=32, head_chunks=chunks
        )
        o = fn(q, k, v, lengths)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_tp_decode_quantized_weights(mesh24, rng):
    """INT8 WEIGHTS under TP must match the single-chip int8 model bit-for-bit
    (same quantized values, column-permuted; the per-output-channel scale is
    linear so it commutes with the psum). BASELINE north-star config 5."""
    b = 2
    params = llama.init_params(CFG, jax.random.PRNGKey(3))
    params_q = llama.quantize_model_weights(params, "int8")
    cos, sin = llama.rope_tables(CFG)
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (b,)), jnp.int32)

    def fresh():
        return contiguous.init_cache(
            CFG.num_layers, b, CFG.num_kv_heads, CFG.max_seq_len, CFG.head_dim,
            dtype=jnp.float32,
        )

    logits_1, cache_1 = llama.decode_step(params_q, fresh(), toks, cos, sin, CFG)

    step = make_tp_decode_step(mesh24, CFG, weight_quant=True)
    params_n = shard_params(params_q, mesh24, CFG)
    # the quantized payloads shard along the model axis
    wqkv_spec = params_n["layers"]["wqkv"]["w"].sharding.spec
    assert wqkv_spec == jax.sharding.PartitionSpec(None, None, "model")
    logits_n, cache_n = step(params_n, shard_cache(fresh(), mesh24), toks, cos, sin)
    np.testing.assert_allclose(np.asarray(logits_n), np.asarray(logits_1), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(cache_n.k), np.asarray(cache_1.k), atol=1e-5)


def test_tp_prefill_quantized_weights(mesh24, rng):
    b, sp = 2, 5
    params_q = llama.quantize_model_weights(llama.init_params(CFG, jax.random.PRNGKey(4)))
    cos, sin = llama.rope_tables(CFG)
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (b, sp)), jnp.int32)
    plens = jnp.asarray([sp, 2], jnp.int32)

    def fresh():
        return contiguous.init_cache(
            CFG.num_layers, b, CFG.num_kv_heads, CFG.max_seq_len, CFG.head_dim,
            dtype=jnp.float32,
        )

    logits_1, _ = llama.prefill(params_q, fresh(), toks, plens, cos, sin, CFG)
    pre = make_tp_prefill(mesh24, CFG, weight_quant=True)
    logits_n, _ = pre(
        shard_params(params_q, mesh24, CFG), shard_cache(fresh(), mesh24),
        toks, plens, cos, sin,
    )
    np.testing.assert_allclose(np.asarray(logits_n), np.asarray(logits_1), atol=2e-4, rtol=2e-4)


def test_tp_decode_quantized(mesh24, rng):
    cfg = dataclasses.replace(CFG, quant_mode="int8")
    b = 2
    params = llama.init_params(cfg, jax.random.PRNGKey(2))
    cos, sin = llama.rope_tables(cfg)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)

    def fresh():
        return contiguous.init_cache(
            cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
            quant_mode="int8", calibration_scale=8.0,
        )

    logits_1, _ = llama.decode_step(params, fresh(), toks, cos, sin, cfg)
    step = make_tp_decode_step(mesh24, cfg, quantized=True)
    logits_n, _ = step(shard_params(params, mesh24, cfg), shard_cache(fresh(), mesh24), toks, cos, sin)
    np.testing.assert_allclose(np.asarray(logits_n), np.asarray(logits_1), atol=2e-4, rtol=2e-4)


def test_tp_prefill_w8a8_bitmatch(mesh24, rng):
    """W8A8 prefill under TP must equal single-chip: column-parallel
    projections quantize identical full rows, and the row-parallel ones
    (w_down, wo) pmax their shard-local absmax over the model axis so every
    shard uses exactly the single-chip full-row scale. Needs >= 1024 rows
    for the W8A8 route to engage (B*Sq = 4*256)."""
    cfg = ModelConfig.tiny(
        num_q_heads=8, num_kv_heads=4, dtype="float32",
        max_seq_len=512, w8a8_prefill=True,
    )
    b, sp = 4, 256
    params_q = llama.quantize_model_weights(llama.init_params(cfg, jax.random.PRNGKey(9)))
    cos, sin = llama.rope_tables(cfg)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, sp)), jnp.int32)
    plens = jnp.asarray([sp, 100, sp, 37], jnp.int32)

    def fresh():
        return contiguous.init_cache(
            cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
            dtype=jnp.float32,
        )

    logits_1, _ = llama.prefill(params_q, fresh(), toks, plens, cos, sin, cfg)
    pre = make_tp_prefill(mesh24, cfg, weight_quant=True)
    logits_n, _ = pre(
        shard_params(params_q, mesh24, cfg), shard_cache(fresh(), mesh24),
        toks, plens, cos, sin,
    )
    np.testing.assert_allclose(
        np.asarray(logits_n), np.asarray(logits_1), atol=2e-4, rtol=2e-4
    )


def test_tp_decode_int4_weights(mesh24, rng):
    """INT4 (nibble-packed, grouped-scale) weights under TP: column shards
    split the packed payload's output axis with its (L, G, O) scale; row
    shards split packed rows at group boundaries with their groups' scales.
    Must match the single-chip int4 model (same ints, f32 accumulation)."""
    b = 2
    params = llama.init_params(CFG, jax.random.PRNGKey(11))
    params_q = llama.quantize_model_weights(params, "int4", int4_group=16)
    cos, sin = llama.rope_tables(CFG)
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (b,)), jnp.int32)

    def fresh():
        return contiguous.init_cache(
            CFG.num_layers, b, CFG.num_kv_heads, CFG.max_seq_len, CFG.head_dim,
            dtype=jnp.float32,
        )

    logits_1, _ = llama.decode_step(params_q, fresh(), toks, cos, sin, CFG)
    step = make_tp_decode_step(mesh24, CFG, weight_quant="int4")
    params_n = shard_params(params_q, mesh24, CFG)
    assert params_n["layers"]["wqkv"]["scale"].sharding.spec == (
        jax.sharding.PartitionSpec(None, None, "model"))
    assert params_n["layers"]["w_down"]["scale"].sharding.spec == (
        jax.sharding.PartitionSpec(None, "model", None))
    logits_n, _ = step(params_n, shard_cache(fresh(), mesh24), toks, cos, sin)
    np.testing.assert_allclose(
        np.asarray(logits_n), np.asarray(logits_1), atol=2e-4, rtol=2e-4)


def test_tp_int4_group_misalignment_raises(mesh24):
    """A group layout whose row-parallel group count does not divide the
    model axis is rejected with an actionable error, not silently wrong."""
    params_q = llama.quantize_model_weights(
        llama.init_params(CFG, jax.random.PRNGKey(12)), "int4",
        int4_group=128,  # w_down contraction 128 -> G=1, tp=4
    )
    with pytest.raises(ValueError, match="scale groups"):
        shard_params(params_q, mesh24, CFG)


def test_tp_prefill_w4a8_int4_bitmatch(mesh24, rng):
    """W4A8 prefill (int4 weights) under TP equals single-chip: the same
    pmax'd full-row activation scales as W8A8, int4's grouped weight scales
    shard with their rows/columns. int4_group=16 keeps row-parallel group
    counts divisible by the model axis (4)."""
    cfg = ModelConfig.tiny(
        num_q_heads=8, num_kv_heads=4, dtype="float32",
        max_seq_len=512, w8a8_prefill=True,
    )
    b, sp = 4, 256
    params_q = llama.quantize_model_weights(
        llama.init_params(cfg, jax.random.PRNGKey(10)), "int4", int4_group=16)
    cos, sin = llama.rope_tables(cfg)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, sp)), jnp.int32)
    plens = jnp.asarray([sp, 100, sp, 37], jnp.int32)

    def fresh():
        return contiguous.init_cache(
            cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
            dtype=jnp.float32,
        )

    logits_1, _ = llama.prefill(params_q, fresh(), toks, plens, cos, sin, cfg)
    pre = make_tp_prefill(mesh24, cfg, weight_quant="int4")
    logits_n, _ = pre(
        shard_params(params_q, mesh24, cfg), shard_cache(fresh(), mesh24),
        toks, plens, cos, sin,
    )
    np.testing.assert_allclose(
        np.asarray(logits_n), np.asarray(logits_1), atol=2e-4, rtol=2e-4
    )
