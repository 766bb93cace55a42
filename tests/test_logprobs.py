"""Chosen-token logprobs (Request.logprobs, engines with return_logprobs)."""

import jax
import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.serving import Engine, PagedEngine, SamplingParams

CFG = ModelConfig.tiny(dtype="float32")


def test_token_logprob_matches_log_softmax():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(3, 17)), jnp.float32)
    tok = jnp.asarray([4, 0, 16], jnp.int32)
    got = np.asarray(llama.token_logprob(logits, tok))
    ref = np.asarray(jax.nn.log_softmax(logits, axis=-1))[np.arange(3), [4, 0, 16]]
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    # probabilities: all <= 0, and sum over vocab of exp == 1
    assert (got <= 0).all()


def test_engine_logprobs_align_with_output():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    prompts = [[int(t) for t in rng.integers(0, CFG.vocab_size, n)] for n in (3, 6)]

    plain = Engine(params, CFG, num_slots=2, steps_per_round=3)
    want = plain.generate(prompts, max_new_tokens=5)

    eng = Engine(params, CFG, num_slots=2, steps_per_round=3, return_logprobs=True)
    outs = eng.generate(prompts, max_new_tokens=5)
    assert outs == want  # tokens unchanged by the extra output
    reqs = eng._finished_requests
    for r in sorted(reqs, key=lambda r: r.uid):
        assert len(r.logprobs) == len(r.output)
        assert all(lp <= 0.0 for lp in r.logprobs)
    # greedy tokens are the argmax -> their logprob is the row max, which for
    # a 256-way softmax of unit-scale logits is clearly above log(1/256)
    assert all(lp > np.log(1.0 / CFG.vocab_size) for r in reqs for lp in r.logprobs)


def test_paged_engine_logprobs_with_sampling_and_eos():
    params = llama.init_params(CFG, jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    prompt = [int(t) for t in rng.integers(0, CFG.vocab_size, 5)]

    eng = PagedEngine(params, CFG, num_slots=1, steps_per_round=4, page_size=16,
                      return_logprobs=True, enable_sampling=True)
    samp = SamplingParams(temperature=1.0, seed=9)
    full = eng.generate([prompt], max_new_tokens=8, sampling=samp)[0]
    req_full = eng._finished_requests[-1]
    assert len(req_full.logprobs) == len(full) == 8

    # EOS mid-round: logprobs stay aligned with the truncated output
    eos = full[3]
    eng2 = PagedEngine(params, CFG, num_slots=1, steps_per_round=4, page_size=16,
                       return_logprobs=True, enable_sampling=True)
    out = eng2.generate([prompt], max_new_tokens=8, eos_token=eos, sampling=samp)[0]
    req = eng2._finished_requests[-1]
    assert out == full[: full.index(eos) + 1]
    assert len(req.logprobs) == len(out)
    assert req.logprobs == req_full.logprobs[: len(out)]


def test_tp_engine_logprobs_match_single_chip(mesh8):
    cfg = ModelConfig.tiny(num_q_heads=8, num_kv_heads=4, dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(3)
    prompts = [[int(t) for t in rng.integers(0, cfg.vocab_size, n)] for n in (3, 5)]

    single = Engine(params, cfg, num_slots=2, steps_per_round=2, return_logprobs=True)
    single.generate(prompts, max_new_tokens=4)
    want = [r.logprobs for r in sorted(single._finished_requests, key=lambda r: r.uid)]

    sharded = Engine(params, cfg, num_slots=2, steps_per_round=2, mesh=mesh8,
                     return_logprobs=True)
    sharded.generate(prompts, max_new_tokens=4)
    got = [r.logprobs for r in sorted(sharded._finished_requests, key=lambda r: r.uid)]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_snapshot_roundtrips_logprobs(tmp_path):
    from starflashattention_tpu.serving import recovery

    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    eng = Engine(params, CFG, num_slots=1, steps_per_round=2, return_logprobs=True)
    eng.generate([[1, 2, 3]], max_new_tokens=3)
    path = tmp_path / "ledger.json"
    recovery.save_state(eng, path)
    fresh = Engine(params, CFG, num_slots=1, steps_per_round=2, return_logprobs=True)
    restored = recovery.load_state(fresh, path)
    assert restored[0].logprobs == eng._finished_requests[0].logprobs


def test_topk_logprobs_engine(rng):
    """topk_logprobs=K: every emitted token (first included) carries K
    alternatives sorted by logprob under the unmodified distribution; the
    greedy chosen token is always rank 0 and its logprob matches the
    chosen-token logprob output."""
    from starflashattention_tpu.models import llama as llama_mod
    from starflashattention_tpu.runtime.params import ModelConfig
    from starflashattention_tpu.serving import Engine

    cfg = ModelConfig.tiny(dtype="float32", num_splits=1)
    params = llama_mod.init_params(cfg, jax.random.PRNGKey(0))
    prompts = [[1, 5, 9], [2, 4]]
    eng = Engine(params, cfg, num_slots=2, steps_per_round=3,
                 return_logprobs=True, topk_logprobs=4)
    outs = eng.generate(prompts, max_new_tokens=5)
    for r in eng._finished_requests:
        assert len(r.topk) == len(r.output) == len(r.logprobs)
        for tok, lp, (ids, lps) in zip(r.output, r.logprobs, r.topk):
            assert len(ids) == len(lps) == 4
            assert lps == sorted(lps, reverse=True)
            assert ids[0] == tok  # greedy: chosen token is rank 0
            assert abs(lps[0] - lp) < 1e-5


def test_topk_logprobs_paged_matches_contiguous(rng):
    from starflashattention_tpu.models import llama as llama_mod
    from starflashattention_tpu.runtime.params import ModelConfig
    from starflashattention_tpu.serving import Engine, PagedEngine

    cfg = ModelConfig.tiny(dtype="float32", num_splits=1)
    params = llama_mod.init_params(cfg, jax.random.PRNGKey(0))
    prompts = [[3, 1, 4]]
    ref = Engine(params, cfg, num_slots=2, steps_per_round=2, topk_logprobs=3)
    ref.generate(prompts, max_new_tokens=4)
    eng = PagedEngine(params, cfg, num_slots=2, steps_per_round=2,
                      page_size=16, topk_logprobs=3)
    eng.generate(prompts, max_new_tokens=4)
    a = ref._finished_requests[0].topk
    b = eng._finished_requests[0].topk
    assert len(a) == len(b) == 4
    for (ia, va), (ib, vb) in zip(a, b):
        assert ia == ib
        np.testing.assert_allclose(va, vb, atol=1e-5)
