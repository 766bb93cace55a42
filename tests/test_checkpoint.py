"""HF checkpoint conversion + cross-ecosystem numerics validation.

Builds a RANDOM tiny HF LlamaForCausalLM (torch CPU, offline), converts its
weights, and asserts our prefill logits match the HF forward pass — an
end-to-end numerics contract against the ecosystem's golden implementation
(the asserted version of the reference's manual torch-vs-CUDA print diffing,
SURVEY.md §4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from starflashattention_tpu.cache import contiguous
from starflashattention_tpu.models import checkpoint, llama


@pytest.fixture(scope="module")
def hf_model():
    cfg_hf = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg_hf)
    model.eval()
    return cfg_hf, model


def test_config_conversion(hf_model):
    cfg_hf, _ = hf_model
    cfg = checkpoint.config_from_hf(cfg_hf)
    assert cfg.num_layers == 2 and cfg.num_kv_heads == 2 and cfg.head_dim == 16


def test_state_dict_conversion_shapes(hf_model):
    cfg_hf, model = hf_model
    cfg = checkpoint.config_from_hf(cfg_hf)
    params = checkpoint.load_hf_state_dict(model.state_dict(), cfg, dtype=jnp.float32)
    assert params["layers"]["wqkv"].shape == (2, 64, (4 + 2 * 2) * 16)


def test_logits_match_hf_forward(hf_model):
    cfg_hf, model = hf_model
    cfg = checkpoint.config_from_hf(cfg_hf)
    params = checkpoint.load_hf_state_dict(model.state_dict(), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, (2, 9))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()  # (B, S, V)

    cos, sin = llama.rope_tables(cfg)
    cache = contiguous.init_cache(
        cfg.num_layers, 2, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    ours, cache = llama.prefill(
        params, cache, jnp.asarray(toks, jnp.int32), jnp.full((2,), 9, jnp.int32),
        cos, sin, cfg,
    )
    # prefill returns last-token logits
    np.testing.assert_allclose(
        np.asarray(ours), hf_logits[:, -1], atol=2e-4, rtol=2e-3
    )

    # and the decode path continues identically: feed HF's argmax token
    nxt = hf_logits[:, -1].argmax(-1)
    with torch.no_grad():
        hf_logits2 = model(
            torch.from_numpy(np.concatenate([toks, nxt[:, None]], axis=1))
        ).logits.numpy()[:, -1]
    ours2, _ = llama.decode_step(
        params, cache, jnp.asarray(nxt, jnp.int32), cos, sin, cfg
    )
    np.testing.assert_allclose(np.asarray(ours2), hf_logits2, atol=2e-4, rtol=2e-3)


def test_native_checkpoint_roundtrip_quantized(tmp_path):
    """Orbax save/restore of the framework pytree, incl. quantized weights:
    a serving restart must not re-quantize from bf16 (nor lose bit-exactness)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from starflashattention_tpu.models import checkpoint, llama
    from starflashattention_tpu.runtime.params import ModelConfig

    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.quantize_model_weights(
        llama.init_params(cfg, jax.random.PRNGKey(0))
    )
    checkpoint.save_checkpoint(tmp_path / "ckpt", params, cfg)
    cfg2, params2 = checkpoint.load_checkpoint(tmp_path / "ckpt")
    assert cfg2 == cfg

    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        assert a.dtype == b.dtype, (a.dtype, b.dtype)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the restored pytree decodes identically
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)
    out1 = llama.generate(params, cfg, toks, lens, max_new_tokens=3)
    out2 = llama.generate(params2, cfg2, toks, lens, max_new_tokens=3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_qwen3_logits_match_hf_forward():
    """Cross-ecosystem Qwen3: QK-norm weights load from the HF state dict
    and the serving prefill reproduces transformers' logits."""
    cfg_hf = transformers.Qwen3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        use_sliding_window=False,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = transformers.Qwen3ForCausalLM(cfg_hf)
    model.eval()

    cfg = checkpoint.config_from_hf(cfg_hf)
    assert cfg.qk_norm and not cfg.attention_bias
    params = checkpoint.load_hf_state_dict(model.state_dict(), cfg, dtype=jnp.float32)
    assert params["layers"]["q_norm"].shape == (2, 16)

    from starflashattention_tpu.cache import contiguous

    toks = np.array([[1, 5, 9, 2, 7, 3]], np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(toks.astype(np.int64))).logits.numpy()

    cos, sin = llama.rope_tables(cfg)
    cache = contiguous.init_cache(
        cfg.num_layers, 1, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    lg, _ = llama.prefill(
        params, cache, jnp.asarray(toks), jnp.asarray([6], jnp.int32),
        cos, sin, cfg,
    )
    np.testing.assert_allclose(
        np.asarray(lg[0]), ref[0, -1], rtol=2e-4, atol=2e-4
    )
