"""Continuous-batching engine: outputs must match unbatched generate()."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.serving import Engine, Request, Scheduler

CFG = ModelConfig.tiny(dtype="float32")


def reference_generate(params, prompt, n):
    """Single-request greedy generation via the plain model API."""
    toks = jnp.asarray([prompt], jnp.int32)
    lengths = jnp.asarray([len(prompt)], jnp.int32)
    out = llama.generate(params, CFG, toks, lengths, max_new_tokens=n)
    return [int(t) for t in np.asarray(out)[0]]


def test_scheduler_slots():
    s = Scheduler(2, 64)
    for i in range(3):
        s.submit(Request(uid=i, prompt=[1, 2], max_new_tokens=4))
    admitted = s.admit()
    assert [i for i, _ in admitted] == [0, 1]
    assert s.active_mask() == [True, True]
    done = s.record_tokens(0, [5, 6, 7, 8])
    assert done and s.slots[0].free
    admitted = s.admit()
    assert [i for i, _ in admitted] == [0]
    with pytest.raises(ValueError):
        s.submit(Request(uid=9, prompt=[0] * 60, max_new_tokens=10))


def test_engine_matches_unbatched():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompts = [
        [int(t) for t in rng.integers(0, CFG.vocab_size, n)] for n in (3, 7, 5)
    ]
    n_new = 6

    expected = [reference_generate(params, p, n_new) for p in prompts]

    eng = Engine(params, CFG, num_slots=2, steps_per_round=3)
    outputs = eng.generate(prompts, max_new_tokens=n_new)
    assert outputs == expected


def test_engine_more_requests_than_slots_interleaved():
    """5 requests through 2 slots with small rounds — continuous batching."""
    params = llama.init_params(CFG, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    prompts = [[int(t) for t in rng.integers(0, CFG.vocab_size, 2 + i)] for i in range(5)]
    expected = [reference_generate(params, p, 4) for p in prompts]
    eng = Engine(params, CFG, num_slots=2, steps_per_round=2)
    outputs = eng.generate(prompts, max_new_tokens=4)
    assert outputs == expected


def test_engine_eos_stops_early():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    prompt = [1, 2, 3]
    full = reference_generate(params, prompt, 8)
    eos = full[2]  # pretend this token is EOS
    stop = full.index(eos)  # first occurrence decides where generation ends
    eng = Engine(params, CFG, num_slots=1, steps_per_round=4)
    out = eng.generate([prompt], max_new_tokens=8, eos_token=eos)[0]
    assert out == full[: stop + 1]


def test_stop_sequence_truncates():
    """A multi-token stop sequence ends generation and is cut from output —
    including when the match spans a decode-round boundary."""
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    prompt = [1, 2, 3]
    full = reference_generate(params, prompt, 8)
    stop_seq = full[3:5]  # 2-token stop completing at position 5
    # steps_per_round=4: the stop spans the round-1/round-2 boundary
    eng = Engine(params, CFG, num_slots=1, steps_per_round=4)
    out = eng.generate([prompt], max_new_tokens=8, stop=[stop_seq])[0]
    assert out == full[:3]
    # same result when the whole match lands inside one round
    eng2 = Engine(params, CFG, num_slots=1, steps_per_round=8)
    out2 = eng2.generate([prompt], max_new_tokens=8, stop=[stop_seq])[0]
    assert out2 == full[:3]


def test_stop_sequence_logprobs_stay_aligned():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    prompt = [1, 2, 3]
    full = reference_generate(params, prompt, 8)
    stop_seq = full[3:5]
    eng = Engine(params, CFG, num_slots=1, steps_per_round=4,
                 return_logprobs=True)
    req = Request(uid=0, prompt=prompt, max_new_tokens=8, stop=[stop_seq])
    eng.submit(req)
    eng.run()
    assert req.output == full[:3]
    assert len(req.logprobs) == len(req.output)
    assert all(lp <= 0.0 for lp in req.logprobs)


def test_streaming_on_token_callback():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompts = [[int(t) for t in rng.integers(0, CFG.vocab_size, n)]
               for n in (3, 5)]
    streamed: dict[int, list[int]] = {0: [], 1: []}
    eng = Engine(params, CFG, num_slots=2, steps_per_round=2)
    outs = eng.generate(
        prompts, max_new_tokens=6,
        on_token=lambda req, t: streamed[req.uid].append(t),
    )
    # every kept token was streamed, in order, per request
    assert streamed == {0: outs[0], 1: outs[1]}


def test_chunked_prefill_matches_whole_prompt():
    """Chunked prefill is output-identical to whole-prompt prefill: the
    serving prefill attends the full cache table, so each row's KV-tile
    reduction order does not depend on where the chunk boundary falls."""
    params = llama.init_params(CFG, jax.random.PRNGKey(4))
    rng = np.random.default_rng(4)
    # lengths straddle the chunk width (4): below, at, just above, multiple
    prompts = [
        [int(t) for t in rng.integers(0, CFG.vocab_size, n)] for n in (3, 4, 5, 11)
    ]
    ref = Engine(params, CFG, num_slots=2, steps_per_round=3)
    expected = ref.generate(prompts, max_new_tokens=5)

    eng = Engine(params, CFG, num_slots=2, steps_per_round=3, prefill_chunk=4)
    outputs = eng.generate(prompts, max_new_tokens=5)
    assert outputs == expected
    # the 11-token prompt alone needs 3 chunk calls
    assert eng.stats.prefill_rounds > ref.stats.prefill_rounds
    assert eng.stats.finished == 4
    assert len(eng.stats.ttfts_s) == 4


def test_chunked_prefill_single_call_for_short_prompts():
    """Prompts shorter than the chunk take exactly one prefill call each
    admission round (no degenerate empty chunks)."""
    params = llama.init_params(CFG, jax.random.PRNGKey(5))
    prompts = [[1, 2], [3]]
    eng = Engine(params, CFG, num_slots=2, steps_per_round=2, prefill_chunk=8)
    outs = eng.generate(prompts, max_new_tokens=3)
    assert eng.stats.prefill_rounds == 1
    assert all(len(o) == 3 for o in outs)
