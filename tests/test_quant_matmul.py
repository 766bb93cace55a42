"""Weight-only quantized matmul kernel + quantized-weights model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.core import quant
from starflashattention_tpu.models import llama
from starflashattention_tpu.ops.quant_matmul import quant_matmul
from starflashattention_tpu.runtime.params import ModelConfig


@pytest.mark.parametrize("mode", ["int8", "fp8"])
def test_quant_matmul_vs_dequant(rng, mode):
    h, o, b = 256, 512, 4
    w = jnp.asarray(rng.standard_normal((h, o)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, h)), jnp.float32)
    wq = quant.quantize_weight(w, mode)
    y = quant_matmul(x, wq["w"], wq["scale"], block_h=128, block_o=256)
    ref = x @ quant.dequantize_weight(wq)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-3, rtol=1e-3)
    # quantization error vs the dense matmul is bounded by the scheme
    dense = np.asarray(x @ w)
    rel = np.abs(np.asarray(y) - dense).max() / (np.abs(dense).max() + 1e-9)
    assert rel < (0.02 if mode == "int8" else 0.1), rel


def test_quantize_weight_shapes(rng):
    w = jnp.asarray(rng.standard_normal((3, 8, 16)), jnp.float32)  # stacked layers
    wq = quant.quantize_weight(w, "int8")
    assert wq["w"].shape == (3, 8, 16) and wq["scale"].shape == (3, 16)
    deq = quant.dequantize_weight(wq)
    np.testing.assert_allclose(np.asarray(deq), np.asarray(w), atol=np.abs(np.asarray(w)).max() / 100)


def test_model_with_quantized_weights(rng):
    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = llama.quantize_model_weights(params, "int8")

    from starflashattention_tpu.cache import contiguous
    cos, sin = llama.rope_tables(cfg)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)), jnp.int32)
    lens = jnp.full((2,), 5, jnp.int32)

    def fresh():
        return contiguous.init_cache(cfg.num_layers, 2, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim, dtype=jnp.float32)

    logits_fp, cache_fp = llama.prefill(params, fresh(), toks, lens, cos, sin, cfg)
    logits_q, cache_q = llama.prefill(qparams, fresh(), toks, lens, cos, sin, cfg)
    # weight-only INT8 logit deviation stays small at tiny depth
    err = np.abs(np.asarray(logits_fp) - np.asarray(logits_q)).max()
    scale = np.abs(np.asarray(logits_fp)).max()
    assert err / scale < 0.05, (err, scale)

    tok = jnp.argmax(logits_q, -1).astype(jnp.int32)
    logits_q2, _ = llama.decode_step(qparams, cache_q, tok, cos, sin, cfg)
    assert np.all(np.isfinite(np.asarray(logits_q2)))


def test_quant_matmul_prefill_row_count(rng):
    """Thousands of rows (B*Sq at admission prefill) must row-block — an
    unblocked output window OOMs VMEM on real hardware."""
    import jax.numpy as jnp
    from starflashattention_tpu.core import quant
    from starflashattention_tpu.ops.quant_matmul import quant_matmul

    b, h, o = 1536, 64, 128
    x = jnp.asarray(rng.standard_normal((b, h)), jnp.float32)
    q = quant.quantize_weight(jnp.asarray(rng.standard_normal((h, o)), jnp.float32), "int8")
    got = quant_matmul(x, q["w"], q["scale"])
    want = (x @ q["w"].astype(jnp.float32)) * q["scale"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-4)


def test_w8a8_matches_dequant_reference():
    """Dynamic per-row activation quant + int8 weights: error bounded by the
    two quantization steps (~1% relative at unit-variance inputs)."""
    from starflashattention_tpu.ops.quant_matmul import quant_matmul_w8a8

    key = jax.random.PRNGKey(0)
    b, h, o = 24, 256, 384
    x = jax.random.normal(key, (b, h), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (h, o), jnp.float32) * 0.05
    d = quant.quantize_weight(w, "int8")

    got = quant_matmul_w8a8(x, d["w"], d["scale"])
    want = x @ (d["w"].astype(jnp.float32) * d["scale"][None, :])
    denom = jnp.abs(want).max()
    assert float(jnp.abs(got - want).max()) / float(denom) < 0.02


def test_w8a8_stacked_layer_and_out_dtype():
    from starflashattention_tpu.ops.quant_matmul import quant_matmul_w8a8

    b, h, o, L = 16, 128, 256, 3
    x = jax.random.normal(jax.random.PRNGKey(2), (b, h), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (L, h, o), jnp.float32) * 0.1
    d = quant.quantize_weight(w, "int8")
    got = quant_matmul_w8a8(
        x, d["w"], d["scale"], layer=jnp.asarray(1), out_dtype=jnp.bfloat16
    )
    assert got.dtype == jnp.bfloat16
    want = x @ (d["w"][1].astype(jnp.float32) * d["scale"][1][None, :])
    rel = float(jnp.abs(got.astype(jnp.float32) - want).max()) / float(jnp.abs(want).max())
    assert rel < 0.03


def test_w8a8_rejects_fp8_weights():
    from starflashattention_tpu.ops.quant_matmul import quant_matmul_w8a8

    x = jnp.ones((8, 128), jnp.float32)
    w = jnp.ones((128, 128), jnp.float8_e4m3fn)
    s = jnp.ones((128,), jnp.float32)
    with pytest.raises(AssertionError, match="int8"):
        quant_matmul_w8a8(x, w, s)


# ---------------------------------------------------------------------------
# INT4: nibble-packed weights, grouped scales
# ---------------------------------------------------------------------------


def test_int4_pack_roundtrip_and_bound():
    """quantize_weight_int4: packed payload is half the rows; dequant error
    is bounded by half a quant step (scale/2) per element."""
    w = jax.random.normal(jax.random.PRNGKey(0), (2, 512, 96), jnp.float32)
    d = quant.quantize_weight_int4(w)
    g = quant.INT4_GROUP  # default group (g128: accuracy-sane, see quant.py)
    n_groups = 512 // g
    assert d["w"].shape == (2, 256, 96) and d["w"].dtype == jnp.int8
    assert d["scale"].shape == (2, n_groups, 96)
    assert quant.is_int4_weight(d)
    assert not quant.is_int4_weight(quant.quantize_weight(w, "int8"))
    back = quant.dequantize_weight_int4(d)
    # per-element bound: |err| <= scale(group, col)/2
    per_elem = jnp.abs(back - w).reshape(2, n_groups, g, 96)
    bound = d["scale"][:, :, None, :] / 2 + 1e-6
    assert bool(jnp.all(per_elem <= bound))


def test_int4_matmul_matches_dequant_reference():
    from starflashattention_tpu.ops.quant_matmul import quant_matmul_int4

    b, h, o, L = 16, 512, 384, 3
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (L, h, o), jnp.float32) * 0.1
    d = quant.quantize_weight_int4(w)
    for layer in (0, 2):
        want = x @ quant.dequantize_weight_int4(d)[layer]
        got = quant_matmul_int4(x, d["w"], d["scale"], layer=jnp.asarray(layer))
        rel = float(jnp.abs(got - want).max()) / float(jnp.abs(want).max())
        assert rel < 1e-5, (layer, rel)  # kernel == reference (same ints)


def test_int4_matmul_2d_odd_group_count_and_out_dtype():
    """2D (single-layer) form; an o that leaves a ragged output block; a
    G with no even divisor (gpb falls back to 1); bf16 output write."""
    from starflashattention_tpu.ops.quant_matmul import quant_matmul_int4

    b, h, o = 8, 96, 200  # G = 96/32? default group for 96 is 96 -> G=1
    x = jax.random.normal(jax.random.PRNGKey(3), (b, h), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (h, o), jnp.float32)
    d = quant.quantize_weight_int4(w, group=32)  # G=3, odd
    got = quant_matmul_int4(x, d["w"], d["scale"], out_dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    want = x @ quant.dequantize_weight_int4(d)
    rel = float(jnp.abs(got.astype(jnp.float32) - want).max()) / float(jnp.abs(want).max())
    assert rel < 0.02


def test_int4_model_matches_dequant_twin():
    """A fully int4-quantized tiny model (incl. lm_head) produces the same
    logits as the dense model built from its dequantized weights — the
    kernel path IS the reference math on identical numbers."""
    import copy

    from starflashattention_tpu.cache import contiguous
    from starflashattention_tpu.models import llama
    from starflashattention_tpu.runtime.params import ModelConfig

    cfg = ModelConfig.tiny(dtype="float32", num_splits=1)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    p4 = llama.quantize_model_weights(
        params, "int4", lm_head="lm_head" in params)
    pd = copy.deepcopy(params)
    for name in ("wqkv", "wo", "w_gate_up", "w_down"):
        if isinstance(p4["layers"].get(name), dict):
            pd["layers"][name] = quant.dequantize_weight(p4["layers"][name])
    if isinstance(p4.get("lm_head"), dict):
        pd["lm_head"] = quant.dequantize_weight(p4["lm_head"])
    cache = contiguous.init_cache(
        cfg.num_layers, 2, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32)
    cache = contiguous.advance(cache, jnp.full((2,), 9, jnp.int32))
    cos, sin = llama.rope_tables(cfg)
    tok = jnp.array([3, 5], jnp.int32)
    l4, _ = jax.jit(lambda p, c, t: llama._decode_core(p, c, t, cos, sin, cfg))(p4, cache, tok)
    ld, _ = jax.jit(lambda p, c, t: llama._decode_core(p, c, t, cos, sin, cfg))(pd, cache, tok)
    assert float(jnp.max(jnp.abs(l4 - ld))) < 1e-3


def test_w4a8_matches_dequant_reference():
    """W4A8 (activation int8 x in-kernel nibble->int8 weights) matches the
    f32 dequant reference to combined activation+weight quant tolerance."""
    from starflashattention_tpu.ops.quant_matmul import quant_matmul_w4a8

    b, h, o, L = 512, 512, 384, 2
    x = jax.random.normal(jax.random.PRNGKey(5), (b, h), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(6), (L, h, o), jnp.float32) * 0.1
    d = quant.quantize_weight_int4(w)
    for layer in (0, 1):
        got = quant_matmul_w4a8(x, d["w"], d["scale"], layer=jnp.asarray(layer))
        want = x @ quant.dequantize_weight_int4(d)[layer]
        rel = float(jnp.abs(got - want).max()) / float(jnp.abs(want).max())
        assert rel < 0.03, (layer, rel)


def test_int4_model_prefill_routes_w4a8():
    """An int4 model with w8a8_prefill=True prefills through the W4A8 kernel
    (256+ rows) and still matches its own dequant twin within activation-
    quant tolerance; decode stays weight-only int4."""
    import copy

    from starflashattention_tpu.cache import contiguous
    from starflashattention_tpu.models import llama
    from starflashattention_tpu.runtime.params import ModelConfig

    cfg = ModelConfig.tiny(dtype="float32", num_splits=1, w8a8_prefill=True,
                           max_seq_len=256)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    p4 = llama.quantize_model_weights(params, "int4")
    pd = copy.deepcopy(params)
    for name in ("wqkv", "wo", "w_gate_up", "w_down"):
        pd["layers"][name] = quant.dequantize_weight(p4["layers"][name])
    b, sp = 2, 144  # b*sp = 288 rows >= 256: the W4A8 path engages
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (b, sp)), jnp.int32)
    plens = jnp.full((b,), sp, jnp.int32)

    def run(p):
        cache = contiguous.init_cache(
            cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len,
            cfg.head_dim, dtype=jnp.float32)
        cos, sin = llama.rope_tables(cfg)
        logits, _ = llama.prefill(p, cache, toks, plens, cos, sin, cfg)
        return np.asarray(logits, np.float32)

    l4, ld = run(p4), run(pd)
    # activation-int8 noise on top of identical int4 weight math
    assert float(np.abs(l4 - ld).max()) < 0.15, float(np.abs(l4 - ld).max())
