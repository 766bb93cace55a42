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


def test_tp_engine_slots_must_divide_data_axis(mesh8):
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="divisible by data axis"):
        Engine(params, CFG, num_slots=3, mesh=mesh8)
