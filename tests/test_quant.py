"""Quantization round-trip and error-bound tests (BASELINE.json: accuracy must
match the FP16 reference within the quant scheme's stated delta)."""

import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.core import quant
from starflashattention_tpu.core.reference import decode_reference


def test_int8_roundtrip_error(rng):
    x = rng.standard_normal((2, 4, 64, 32), dtype=np.float32)
    qt = quant.quantize_int8(jnp.array(x), head_axis=1)
    assert qt.values.dtype == jnp.int8
    assert qt.scales.shape == (4,)
    deq = np.asarray(quant.dequantize(qt, head_axis=1))
    # symmetric int8: max error is scale/2 per element
    bound = np.asarray(qt.scales).reshape(1, 4, 1, 1) * 0.5 + 1e-7
    assert np.all(np.abs(deq - x) <= bound)


def test_fp8_roundtrip_error(rng):
    x = rng.standard_normal((2, 4, 16, 8), dtype=np.float32)
    qt = quant.quantize_fp8(jnp.array(x), head_axis=1)
    assert qt.values.dtype == jnp.float8_e4m3fn
    deq = np.asarray(quant.dequantize(qt, head_axis=1))
    # e4m3 has ~2 decimal digits; relative error bound ~6.25% + scale floor
    denom = np.maximum(np.abs(x), np.asarray(qt.scales).reshape(1, 4, 1, 1))
    assert np.max(np.abs(deq - x) / denom) < 0.07


def test_quantize_value_matches_full_quant(rng):
    """Appending new rows with frozen scales must agree with requantizing."""
    x = rng.standard_normal((2, 4, 8, 16), dtype=np.float32)
    qt = quant.quantize_int8(jnp.array(x), head_axis=1)
    new_rows = x[:, :, :1] * 0.5  # within range of existing scales
    qv = quant.quantize_value(jnp.array(new_rows), qt.scales, "int8", head_axis=1)
    expect = np.round(new_rows / np.asarray(qt.scales).reshape(1, 4, 1, 1))
    np.testing.assert_allclose(np.asarray(qv, dtype=np.float32), expect)


def test_int8_attention_logit_error(rng):
    """End-to-end: attention over an int8-dequantized cache stays within a
    small max-abs-err of the fp32 result (the BASELINE logit-error metric)."""
    b, hq, hkv, s, d = 2, 8, 2, 128, 64
    q = rng.standard_normal((b, hq, d), dtype=np.float32)
    k = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    lengths = np.full((b,), s, np.int32)

    o_fp = decode_reference(jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(lengths))
    kq = quant.dequantize(quant.quantize_int8(jnp.array(k)), head_axis=1)
    vq = quant.dequantize(quant.quantize_int8(jnp.array(v)), head_axis=1)
    o_q = decode_reference(jnp.array(q), kq, vq, jnp.array(lengths))
    err = np.max(np.abs(np.asarray(o_fp) - np.asarray(o_q)))
    assert err < 0.05, err


def test_fp8_out_of_range_saturates_not_nan():
    """e4m3fn has no inf: an unclamped cast of a value beyond +-448 yields
    NaN, which one 6-sigma outlier under fixed calibration scales would
    inject into every later attention output (regression: observed as NaN
    logits in the 7B fp8-KV accuracy run)."""
    import jax.numpy as jnp
    import numpy as np

    from starflashattention_tpu.core import quant

    scales = jnp.asarray([1.0 / quant.FP8_MAX], jnp.float32)  # covers |x|<=1
    x = jnp.asarray([[2.0, -3.0, 0.5]], jnp.float32).reshape(1, 1, 3)
    q = quant.quantize_value(x, scales, "fp8", head_axis=1)
    back = np.asarray(q.astype(jnp.float32)) * (1.0 / quant.FP8_MAX)
    assert np.isfinite(back).all()
    np.testing.assert_allclose(back[0, 0], [1.0, -1.0, 0.5], rtol=0.07)

    w = jnp.asarray([[1.0, 600.0], [0.5, -700.0]], jnp.float32)
    wq = quant.quantize_weight(w, "fp8")
    assert np.isfinite(np.asarray(wq["w"].astype(jnp.float32))).all()


def test_quantized_lm_head_matches_dequantized_oracle(rng):
    """_logits with an int8 {"w","scale"} head == dense matmul against the
    dequantized head (fused in-kernel dequant, per-vocab-column scales)."""
    import jax

    from starflashattention_tpu.models import llama
    from starflashattention_tpu.runtime.params import ModelConfig

    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    qparams = llama.quantize_model_weights(params, lm_head=True)
    assert isinstance(qparams["lm_head"], dict)
    assert qparams["lm_head"]["scale"].shape == (cfg.vocab_size,)

    x = jnp.asarray(rng.standard_normal((4, cfg.hidden_size)), jnp.float32)
    got = llama._logits(x, qparams, cfg)
    deq = dict(params)
    deq["lm_head"] = quant.dequantize_weight(qparams["lm_head"])
    want = llama._logits(x, deq, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)
