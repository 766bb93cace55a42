"""Multi-LoRA serving: N adapters resident, per-request selection.

Oracle: a request routed to adapter i must produce EXACTLY the greedy token
stream of a base engine running ``lora.merge(params, adapter_i)`` — and a
request with no adapter must match the unmodified base model, in the same
batch, simultaneously.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.models import llama
from starflashattention_tpu.models import lora as lora_lib
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.serving import Engine, PagedEngine

CFG = ModelConfig.tiny(dtype="float32", num_splits=1)


def _rand_lora(cfg, key, rank):
    """A 'trained-looking' adapter: random b (init_lora's b=0 would make the
    delta zero and the test vacuous)."""
    lr = lora_lib.init_lora(cfg, jax.random.PRNGKey(key), rank=rank)
    lr["layers"] = {
        n: {
            "a": ab["a"],
            "b": jax.random.normal(jax.random.PRNGKey(key + 100), ab["b"].shape)
            * 0.05,
        }
        for n, ab in lr["layers"].items()
    }
    return lr


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    l1 = _rand_lora(CFG, 1, 4)
    l2 = _rand_lora(CFG, 2, 8)  # heterogeneous rank: stacking must pad
    return params, [l1, l2]


def test_stack_adapters_shapes(setup):
    _, loras = setup
    st = lora_lib.stack_adapters(loras)
    a = st["layers"]["wqkv"]["a"]
    assert a.shape[:2] == (CFG.num_layers, 2) and a.shape[-1] == 8
    assert lora_lib.num_adapters(st) == 2


def test_multi_lora_engine_matches_merged_oracles(setup):
    params, loras = setup
    rng = np.random.default_rng(0)
    prompts = [
        [int(t) for t in rng.integers(0, CFG.vocab_size, n)] for n in (6, 11, 4)
    ]
    adapters = [0, 1, None]

    eng = Engine(params, CFG, num_slots=4, steps_per_round=3,
                 lora_adapters=loras)
    outs = eng.generate(prompts, max_new_tokens=6, adapters=adapters)

    for i, (prompt, aid) in enumerate(zip(prompts, adapters)):
        p_i = params if aid is None else lora_lib.merge(params, loras[aid], CFG)
        ref = Engine(p_i, CFG, num_slots=2, steps_per_round=3).generate(
            [prompt], max_new_tokens=6
        )
        assert outs[i] == ref[0], (i, aid)


def test_multi_lora_with_sampling_and_chunked_prefill(setup):
    """Adapters compose with per-request sampling and chunked prefill:
    sampled streams equal the merged-model engine's with the same seed."""
    from starflashattention_tpu.core.sampling import SamplingParams

    params, loras = setup
    prompt = [5, 3, 8, 1, 9, 2, 7]
    sp = SamplingParams(temperature=1.0, top_k=16, seed=11)

    eng = Engine(params, CFG, num_slots=2, steps_per_round=2,
                 enable_sampling=True, prefill_chunk=4, lora_adapters=loras)
    out = eng.generate([prompt], max_new_tokens=5, sampling=[sp], adapters=[1])

    merged = lora_lib.merge(params, loras[1], CFG)
    ref = Engine(merged, CFG, num_slots=2, steps_per_round=2,
                 enable_sampling=True).generate(
        [prompt], max_new_tokens=5, sampling=[sp]
    )
    assert out == ref


def test_multi_lora_guards(setup):
    params, loras = setup
    with pytest.raises(ValueError, match="out of range"):
        Engine(params, CFG, num_slots=2, lora_adapters=loras).generate(
            [[1, 2]], max_new_tokens=2, adapters=[5]
        )
    with pytest.raises(NotImplementedError, match="spec_decode"):
        Engine(params, CFG, num_slots=2, spec_decode=2, lora_adapters=loras)


def test_multi_lora_paged_matches_contiguous(setup):
    """PagedEngine serves the same per-adapter streams as the contiguous
    multi-LoRA engine (adapters thread through the paged cores + chunked
    continuation path)."""
    params, loras = setup
    rng = np.random.default_rng(5)
    prompts = [
        [int(t) for t in rng.integers(0, CFG.vocab_size, n)] for n in (7, 13)
    ]
    adapters = [1, None]
    ref = Engine(params, CFG, num_slots=2, steps_per_round=3,
                 lora_adapters=loras).generate(
        prompts, max_new_tokens=6, adapters=adapters
    )
    eng = PagedEngine(params, CFG, num_slots=2, steps_per_round=3,
                      page_size=16, lora_adapters=loras, debug_validate=True)
    outs = eng.generate(prompts, max_new_tokens=6, adapters=adapters)
    assert outs == ref
    assert eng.pool.free_pages == eng.num_pages - 1


def test_multi_lora_tp_matches_single_chip(setup):
    """Mesh-sharded multi-LoRA: the (data=2, model=4) engine serves the
    same per-adapter streams as the single-chip multi-LoRA engine — the
    stacked b factors are column-permuted/sharded with their base weights
    and the row-parallel a shards ride the existing psums (tp.shard_lora)."""
    from starflashattention_tpu.parallel import make_mesh

    params, loras = setup
    cfg = ModelConfig.tiny(
        dtype="float32", num_splits=1, num_q_heads=8, num_kv_heads=4
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    loras = [_rand_lora(cfg, 1, 4), _rand_lora(cfg, 2, 8)]
    mesh = make_mesh({"data": 2, "model": 4})
    rng = np.random.default_rng(7)
    prompts = [
        [int(t) for t in rng.integers(0, cfg.vocab_size, n)]
        for n in (5, 9, 12, 7)
    ]
    adapters = [0, 1, None, 0]
    ref = Engine(params, cfg, num_slots=4, steps_per_round=3,
                 lora_adapters=loras).generate(
        prompts, max_new_tokens=5, adapters=adapters
    )
    eng = Engine(params, cfg, num_slots=4, steps_per_round=3, mesh=mesh,
                 lora_adapters=loras)
    outs = eng.generate(prompts, max_new_tokens=5, adapters=adapters)
    assert outs == ref


def test_multi_lora_recovery_keeps_adapter(setup):
    """The crash-recovery ledger round-trips Request.adapter: a restored
    multi-LoRA request resumes on ITS adapter, producing the uninterrupted
    engine's exact stream."""
    from starflashattention_tpu.serving.recovery import (
        load_state,
        save_state,
    )

    params, loras = setup
    prompt = [2, 7, 1, 8]
    full = Engine(params, CFG, num_slots=2, steps_per_round=2,
                  lora_adapters=loras).generate(
        [prompt], max_new_tokens=6, adapters=[1]
    )

    import tempfile, os
    from starflashattention_tpu.serving.scheduler import Request

    eng = Engine(params, CFG, num_slots=2, steps_per_round=2,
                 lora_adapters=loras)
    req = Request(uid=0, prompt=prompt, max_new_tokens=6, adapter=1)
    eng.submit(req)
    # partial progress: one admission+prefill and one decode round
    eng._admit_and_prefill()
    eng._decode_round()
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ledger.json")
        save_state(eng, path)
        fresh = Engine(params, CFG, num_slots=2, steps_per_round=2,
                       lora_adapters=loras)
        restored = load_state(fresh, path)
        fresh.run()
    done = [r for r in restored if r.uid == 0][0]
    assert done.adapter == 1
    assert done.output == full[0]


def test_multi_lora_paged_tp_matches_single_chip(setup):
    """The full composition: paged pool + TP x DP mesh + multi-LoRA +
    top-k logprobs — streams and alternatives equal the single-chip paged
    multi-LoRA engine's."""
    from starflashattention_tpu.parallel import make_mesh

    cfg = ModelConfig.tiny(
        dtype="float32", num_splits=1, num_q_heads=8, num_kv_heads=4
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    loras = [_rand_lora(cfg, 1, 4), _rand_lora(cfg, 2, 8)]
    mesh = make_mesh({"data": 2, "model": 4})
    rng = np.random.default_rng(9)
    prompts = [
        [int(t) for t in rng.integers(0, cfg.vocab_size, n)]
        for n in (5, 9, 12, 7)
    ]
    adapters = [0, 1, None, 1]
    ref_eng = PagedEngine(params, cfg, num_slots=4, steps_per_round=3,
                          page_size=16, lora_adapters=loras, topk_logprobs=3)
    ref = ref_eng.generate(prompts, max_new_tokens=5, adapters=adapters)
    eng = PagedEngine(params, cfg, num_slots=4, steps_per_round=3,
                      page_size=16, mesh=mesh, lora_adapters=loras,
                      topk_logprobs=3)
    outs = eng.generate(prompts, max_new_tokens=5, adapters=adapters)
    assert outs == ref
    a = ref_eng._finished_requests[0].topk
    b = eng._finished_requests[0].topk
    assert len(a) == len(b)
    for (ia, va), (ib, vb) in zip(a, b):
        assert ia == ib
        np.testing.assert_allclose(va, vb, atol=1e-4)


def test_multi_lora_over_quantized_base(setup):
    """Adapters compose with an INT8-quantized base: the delta applies to
    activations AFTER the fused-dequant projection, so the stream must
    equal (dequantized base + delta) computed densely."""
    _params, loras = setup
    params = llama.init_params(CFG, jax.random.PRNGKey(3))
    params_q = llama.quantize_model_weights(params, "int8")

    eng_q = Engine(params_q, CFG, num_slots=2, steps_per_round=2,
                   lora_adapters=loras)
    prompt = [4, 9, 2, 6, 1]
    out_q = eng_q.generate([prompt], max_new_tokens=5, adapters=[1])

    # dense oracle: dequantize the base, then run the SAME multi-LoRA path
    from starflashattention_tpu.core import quant as quant_lib

    dense_layers = {}
    for name, w in params["layers"].items():
        wq = params_q["layers"][name]
        if isinstance(wq, dict):
            dense_layers[name] = quant_lib.dequantize_weight(wq, dtype=jnp.float32)
        else:
            dense_layers[name] = wq
    params_d = {**params_q, "layers": dense_layers}
    out_d = Engine(params_d, CFG, num_slots=2, steps_per_round=2,
                   lora_adapters=loras).generate(
        [prompt], max_new_tokens=5, adapters=[1]
    )
    assert out_q == out_d
