"""Pipeline-parallel decode (parallel/pp.py) vs the single-chip program.

The PP step must be a pure re-scheduling: same per-layer math
(models/llama._decode_layer), same cache contents, same logits — only
distributed over `pipe` stages with GPipe microbatching. Every test asserts
EXACT token equality (the logits psum adds only zeros from non-last stages).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.cache import contiguous
from starflashattention_tpu.models import llama
from starflashattention_tpu.parallel import pp
from starflashattention_tpu.parallel.mesh import make_mesh
from starflashattention_tpu.runtime.params import ModelConfig


def _setup(cfg, b=8, prompt_len=5, key=0):
    params = llama.init_params(cfg, jax.random.PRNGKey(key), dtype=jnp.float32)
    cos, sin = llama.rope_tables(cfg)
    cache = contiguous.init_cache(
        cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    toks = (jnp.arange(b * prompt_len, dtype=jnp.int32).reshape(b, prompt_len)
            * 7 + 3) % cfg.vocab_size
    plens = jnp.full((b,), prompt_len, jnp.int32)
    logits0, cache = llama.prefill(params, cache, toks, plens, cos, sin, cfg)
    nxt = jnp.argmax(logits0, -1).astype(jnp.int32)
    return params, cache, cos, sin, nxt


def _ref_stream(params, cache, cos, sin, cfg, tok, n):
    cache = jax.tree.map(jnp.copy, cache)
    out = [tok]
    for _ in range(n):
        lg, cache = llama.decode_step(params, cache, out[-1], cos, sin, cfg)
        out.append(jnp.argmax(lg, -1).astype(jnp.int32))
    return [np.asarray(t).tolist() for t in out], lg, cache


def _pp_stream(mesh, params, cache, cos, sin, cfg, tok, n, m):
    step = pp.make_pp_decode_step(mesh, cfg, params, num_microbatches=m)
    p_s = pp.shard_params_pp(params, mesh, cfg)
    c_s = pp.shard_cache_pp(jax.tree.map(jnp.copy, cache), mesh)
    out = [tok]
    for _ in range(n):
        lg, c_s = step(p_s, c_s, out[-1], cos, sin)
        out.append(jnp.argmax(lg, -1).astype(jnp.int32))
    return [np.asarray(t).tolist() for t in out], lg, c_s


@pytest.mark.parametrize("stages,m", [(2, 2), (4, 4), (8, 4), (8, 8), (4, 2)])
def test_pp_decode_matches_single_chip(stages, m):
    cfg = ModelConfig.tiny(dtype="float32", num_splits=1, num_layers=8)
    params, cache, cos, sin, nxt = _setup(cfg)
    ref, ref_lg, ref_cache = _ref_stream(params, cache, cos, sin, cfg, nxt, 4)
    mesh = make_mesh({"pipe": stages}, devices=jax.devices()[:stages])
    got, lg, c_s = _pp_stream(mesh, params, cache, cos, sin, cfg, nxt, 4, m)
    assert got == ref
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(ref_lg), atol=1e-5, rtol=1e-5
    )
    # the cache contents match everywhere except the sacrificial LAST row
    # (S-1): pipeline fill/drain ticks park their state-neutral appends
    # there (pp.py design note); it is outside every sequence's `lengths`
    # and never read.
    # (atol covers matmul tiling noise at small microbatch row counts —
    # measured 1.7e-6 max at mb=1)
    np.testing.assert_allclose(
        np.asarray(c_s.k)[..., :-1, :], np.asarray(ref_cache.k)[..., :-1, :],
        atol=1e-5,
    )
    assert np.array_equal(np.asarray(c_s.lengths), np.asarray(ref_cache.lengths))


def test_pp_with_quantized_weights():
    """INT8 weight stacks shard their leading L axis like any layer param."""
    cfg = ModelConfig.tiny(dtype="float32", num_splits=1, num_layers=8)
    params, cache, cos, sin, nxt = _setup(cfg)
    qparams = llama.quantize_model_weights(params)
    ref, _, _ = _ref_stream(qparams, cache, cos, sin, cfg, nxt, 3)
    mesh = make_mesh({"pipe": 4}, devices=jax.devices()[:4])
    got, _, _ = _pp_stream(mesh, qparams, cache, cos, sin, cfg, nxt, 3, 4)
    assert got == ref


def test_pp_with_moe():
    """Expert stacks (L, E, ...) pipeline like dense params (each stage owns
    its layers' full expert set — PP and EP are orthogonal axes)."""
    cfg = ModelConfig.tiny(
        dtype="float32", num_splits=1, num_layers=4, num_experts=4,
        num_experts_per_tok=2,
    )
    params, cache, cos, sin, nxt = _setup(cfg)
    ref, _, _ = _ref_stream(params, cache, cos, sin, cfg, nxt, 3)
    mesh = make_mesh({"pipe": 4}, devices=jax.devices()[:4])
    got, _, _ = _pp_stream(mesh, params, cache, cos, sin, cfg, nxt, 3, 2)
    assert got == ref


def test_pp_tp_2d_mesh_matches_single_chip():
    """(pipe=2, model=4): stages pipeline the layers AND each stage is
    Megatron-sharded — dense and INT8-weight variants both match."""
    cfg = ModelConfig.tiny(
        dtype="float32", num_splits=1, num_layers=8,
        num_q_heads=8, num_kv_heads=4,
    )
    params, cache, cos, sin, nxt = _setup(cfg)
    mesh = make_mesh({"pipe": 2, "model": 4})

    ref, ref_lg, _ = _ref_stream(params, cache, cos, sin, cfg, nxt, 3)
    got, lg, _ = _pp_stream(mesh, params, cache, cos, sin, cfg, nxt, 3, 4)
    assert got == ref
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(ref_lg), atol=1e-5, rtol=1e-4
    )

    qp = llama.quantize_model_weights(params)
    refq, _, _ = _ref_stream(qp, cache, cos, sin, cfg, nxt, 3)
    gotq, _, _ = _pp_stream(mesh, qp, cache, cos, sin, cfg, nxt, 3, 2)
    assert gotq == refq


def test_pp_rejects_indivisible_layers():
    cfg = ModelConfig.tiny(dtype="float32", num_layers=3)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = make_mesh({"pipe": 2}, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="not divisible"):
        pp.make_pp_decode_step(mesh, cfg, params)


def test_pp_gemma2_alternating_windows_match_single_chip():
    """Gemma-2 under PIPELINE parallelism: the sliding/full alternation must
    key off the GLOBAL layer index (stage offset + local index) — a
    stage-local index would invert the parity on odd-offset stages. Prompt
    longer than the window so the window genuinely masks."""
    cfg = ModelConfig.gemma2_9b(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=4,
        num_q_heads=2, num_kv_heads=1, head_dim=16, max_seq_len=64,
        dtype="float32", block_k=16, sliding_window=8,
    )
    params, cache, cos, sin, nxt = _setup(cfg, prompt_len=12)
    ref, ref_lg, _ = _ref_stream(params, cache, cos, sin, cfg, nxt, 4)
    # 2 stages x 2 layers: stage 1's local layer 0 is GLOBAL layer 2
    # (sliding); a local-index bug would make it full attention
    mesh = make_mesh({"pipe": 2}, devices=jax.devices()[:2])
    got, lg, _ = _pp_stream(mesh, params, cache, cos, sin, cfg, nxt, 4, 2)
    assert got == ref
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(ref_lg), atol=1e-5, rtol=1e-5)
