"""Sharded serving: the Engine on a (data, model) mesh must reproduce the
single-chip engine's outputs exactly — continuous batching is shape- and
sharding-invariant."""

import jax
import numpy as np
import pytest

from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.serving import Engine

# kv heads divisible by model axis (4); batch divisible by data axis (2)
CFG = ModelConfig.tiny(num_q_heads=8, num_kv_heads=4, dtype="float32")


def expected_outputs(params, prompts, n_new):
    eng = Engine(params, CFG, num_slots=2, steps_per_round=3)
    return eng.generate(prompts, max_new_tokens=n_new)


def test_tp_engine_matches_single_chip(mesh8):
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompts = [[int(t) for t in rng.integers(0, CFG.vocab_size, n)] for n in (3, 7, 5)]
    n_new = 6
    expected = expected_outputs(params, prompts, n_new)

    eng = Engine(params, CFG, num_slots=2, steps_per_round=3, mesh=mesh8)
    outputs = eng.generate(prompts, max_new_tokens=n_new)
    assert outputs == expected
    assert eng.stats.finished == 3
    assert eng.stats.p50_ttft_ms() > 0


def test_tp_engine_quantized_weights(mesh8):
    """North-star composition: INT8 weights tensor-sharded + serving loop."""
    params = llama.quantize_model_weights(
        llama.init_params(CFG, jax.random.PRNGKey(1))
    )
    rng = np.random.default_rng(1)
    prompts = [[int(t) for t in rng.integers(0, CFG.vocab_size, 4)] for _ in range(3)]
    expected = expected_outputs(params, prompts, 4)

    eng = Engine(params, CFG, num_slots=2, steps_per_round=2, mesh=mesh8)
    outputs = eng.generate(prompts, max_new_tokens=4)
    assert outputs == expected


def test_tp_engine_fp8_weights_int8_kv(mesh8):
    """BASELINE config 5 verbatim: FP8 attention weights + INT8 KV cache,
    heads/KV tensor-sharded, continuous batching — must reproduce the
    single-chip engine bit-for-bit."""
    cfg = ModelConfig.tiny(num_q_heads=8, num_kv_heads=4, quant_mode="int8")
    params = llama.quantize_model_weights(
        llama.init_params(cfg, jax.random.PRNGKey(5)), "fp8"
    )
    rng = np.random.default_rng(5)
    prompts = [[int(t) for t in rng.integers(0, cfg.vocab_size, n)] for n in (4, 6, 3)]

    ref_eng = Engine(params, cfg, num_slots=2, steps_per_round=3)
    expected = ref_eng.generate(prompts, max_new_tokens=5)

    eng = Engine(params, cfg, num_slots=2, steps_per_round=3, mesh=mesh8)
    outputs = eng.generate(prompts, max_new_tokens=5)
    assert outputs == expected
    assert eng.stats.finished == 3


def test_tp_engine_slots_must_divide_data_axis(mesh8):
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="divisible by data axis"):
        Engine(params, CFG, num_slots=3, mesh=mesh8)


def test_tp_paged_engine_matches_single_chip(mesh8):
    """Sharded PAGED serving: pool sharded (heads over model, pages over
    data, per-shard allocators with local page ids) must reproduce the
    single-chip paged engine exactly."""
    from starflashattention_tpu.serving import PagedEngine

    cfg = ModelConfig.tiny(
        num_q_heads=8, num_kv_heads=4, dtype="float32", pages_per_compute_block=2
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(3)
    prompts = [[int(t) for t in rng.integers(0, cfg.vocab_size, n)] for n in (3, 7, 5, 4)]
    n_new = 5

    ref_eng = PagedEngine(params, cfg, num_slots=2, steps_per_round=2, page_size=16)
    expected = ref_eng.generate(prompts, max_new_tokens=n_new)

    eng = PagedEngine(
        params, cfg, num_slots=4, steps_per_round=2, page_size=16, mesh=mesh8
    )
    assert len(eng.pools) == 2  # one allocator per data shard
    outputs = eng.generate(prompts, max_new_tokens=n_new)
    assert outputs == expected
    for pool in eng.pools:  # all pages recycled on retirement
        assert pool.free_pages == eng.num_pages - 1


def test_tp_paged_engine_per_shard_preemption(mesh8):
    """Pool pressure on one data shard preempts within THAT shard and still
    completes every request."""
    from starflashattention_tpu.serving import PagedEngine

    cfg = ModelConfig.tiny(
        num_q_heads=8, num_kv_heads=4, dtype="float32", pages_per_compute_block=2
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(4))
    rng = np.random.default_rng(4)
    prompts = [[int(t) for t in rng.integers(0, cfg.vocab_size, 9)] for _ in range(4)]
    n_new = 12

    ref_eng = PagedEngine(params, cfg, num_slots=2, steps_per_round=3, page_size=16)
    expected = ref_eng.generate(prompts, max_new_tokens=n_new)

    # 2 slots/shard but only ~1.5 sequences' worth of pages per shard
    eng = PagedEngine(
        params, cfg, num_slots=4, steps_per_round=3, page_size=16,
        num_pages=4, mesh=mesh8,
    )
    outputs = eng.generate(prompts, max_new_tokens=n_new)
    assert outputs == expected
    assert eng.stats.preemptions > 0


def test_tp_chunked_prefill_matches(mesh8):
    """Chunked prefill composes with sharding, both cache backends."""
    from starflashattention_tpu.serving import PagedEngine

    params = llama.init_params(CFG, jax.random.PRNGKey(7))
    rng = np.random.default_rng(7)
    prompts = [[int(t) for t in rng.integers(0, CFG.vocab_size, n)] for n in (3, 9, 6)]

    expected = Engine(params, CFG, num_slots=2, steps_per_round=2).generate(
        prompts, max_new_tokens=4
    )
    eng = Engine(
        params, CFG, num_slots=2, steps_per_round=2, prefill_chunk=4, mesh=mesh8
    )
    assert eng.generate(prompts, max_new_tokens=4) == expected

    cfg_p = ModelConfig.tiny(
        num_q_heads=8, num_kv_heads=4, dtype="float32", pages_per_compute_block=2
    )
    params_p = llama.init_params(cfg_p, jax.random.PRNGKey(8))
    expected_p = PagedEngine(
        params_p, cfg_p, num_slots=2, steps_per_round=2, page_size=16
    ).generate(prompts, max_new_tokens=4)
    eng_p = PagedEngine(
        params_p, cfg_p, num_slots=2, steps_per_round=2, page_size=16,
        prefill_chunk=4, mesh=mesh8,
    )
    assert eng_p.generate(prompts, max_new_tokens=4) == expected_p


def test_tp_engine_quantized_lm_head(mesh8):
    """INT8 lm_head (vocab columns + per-column scales sharded together over
    the model axis): sharded token streams match single-chip exactly, and the
    quantized head really changes logits vs the dense head (it's live)."""
    params = llama.quantize_model_weights(
        llama.init_params(CFG, jax.random.PRNGKey(7)), lm_head=True
    )
    assert isinstance(params["lm_head"], dict)
    assert str(params["lm_head"]["w"].dtype) == "int8"
    rng = np.random.default_rng(7)
    prompts = [[int(t) for t in rng.integers(0, CFG.vocab_size, n)] for n in (5, 3, 6)]
    expected = expected_outputs(params, prompts, 5)

    eng = Engine(params, CFG, num_slots=2, steps_per_round=2, mesh=mesh8)
    assert eng.generate(prompts, max_new_tokens=5) == expected


def test_tp_engine_int4_weights(mesh8):
    """INT4 serving composition: nibble-packed grouped weights tensor-
    sharded + the continuous-batching loop; greedy streams match the
    single-chip int4 engine. int4_group=16 keeps the row-parallel group
    counts divisible by the model axis."""
    params = llama.quantize_model_weights(
        llama.init_params(CFG, jax.random.PRNGKey(7)), "int4", int4_group=16
    )
    rng = np.random.default_rng(7)
    prompts = [[int(t) for t in rng.integers(0, CFG.vocab_size, 4)] for _ in range(3)]
    expected = expected_outputs(params, prompts, 4)

    eng = Engine(params, CFG, num_slots=2, steps_per_round=2, mesh=mesh8)
    outputs = eng.generate(prompts, max_new_tokens=4)
    assert outputs == expected
