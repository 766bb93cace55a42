"""Failure detection + recovery: faults mid-serving must not change outputs,
and a snapshot must survive a (simulated) process restart mid-generation."""

import jax
import numpy as np
import pytest

from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.serving import (
    Engine,
    PagedEngine,
    Request,
    load_state,
    run_resilient,
    save_state,
)

CFG = ModelConfig.tiny(dtype="float32", pages_per_compute_block=2)
PAGE = 16


def expected_outputs(params, prompts, n_new):
    outs = []
    for p in prompts:
        toks = jax.numpy.asarray([p], jax.numpy.int32)
        lengths = jax.numpy.asarray([len(p)], jax.numpy.int32)
        out = llama.generate(params, CFG, toks, lengths, max_new_tokens=n_new)
        outs.append([int(t) for t in np.asarray(out)[0]])
    return outs


def make_prompts(seed, n=4):
    rng = np.random.default_rng(seed)
    return [[int(t) for t in rng.integers(0, CFG.vocab_size, 3 + i)] for i in range(n)]


def submit_all(eng, prompts, n_new):
    reqs = [
        Request(uid=i, prompt=p, max_new_tokens=n_new) for i, p in enumerate(prompts)
    ]
    for r in reqs:
        eng.submit(r)
    return reqs


class FaultInjector:
    """Raise a (recoverable) RuntimeError on chosen decode rounds."""

    def __init__(self, engine, fail_on_calls):
        self.calls = 0
        self.fail_on = set(fail_on_calls)
        self.engine = engine
        self.inner = engine._decode_call
        engine._decode_call = self.__call__

    def __call__(self, active, n, **kw):
        self.calls += 1
        if self.calls in self.fail_on:
            raise RuntimeError(f"injected device fault on decode call {self.calls}")
        return self.inner(active, n, **kw)


@pytest.mark.parametrize("engine_cls", [Engine, PagedEngine])
def test_fault_mid_decode_recovers_bit_identical(engine_cls):
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    prompts = make_prompts(0)
    n_new = 6
    expected = expected_outputs(params, prompts, n_new)

    kw = {"num_slots": 2, "steps_per_round": 3}
    if engine_cls is PagedEngine:
        kw["page_size"] = PAGE
    eng = engine_cls(params, CFG, **kw)
    reqs = submit_all(eng, prompts, n_new)
    inj = FaultInjector(eng, fail_on_calls=[2, 4])
    faults = run_resilient(eng, max_faults=2)
    assert faults == 2
    assert [r.output for r in reqs] == expected
    assert all(r.done for r in reqs)
    if engine_cls is PagedEngine:
        # recovery released every page; retirement freed the rest
        assert eng.pool.free_pages == eng.num_pages - 1


def test_fault_during_prefill_recovers():
    params = llama.init_params(CFG, jax.random.PRNGKey(1))
    prompts = make_prompts(1, n=3)
    expected = expected_outputs(params, prompts, 5)
    eng = PagedEngine(params, CFG, num_slots=2, steps_per_round=2, page_size=PAGE)
    reqs = submit_all(eng, prompts, 5)
    inner = eng._prefill_call
    state = {"calls": 0}

    def flaky_prefill(toks, new_lengths, admit_mask, reset_mask, prefix_len=0):
        state["calls"] += 1
        if state["calls"] == 1:
            raise RuntimeError("injected fault during prefill")
        return inner(toks, new_lengths, admit_mask, reset_mask, prefix_len=prefix_len)

    eng._prefill_call = flaky_prefill
    run_resilient(eng, max_faults=1)
    assert [r.output for r in reqs] == expected


def test_consecutive_faults_beyond_limit_reraise():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    eng = Engine(params, CFG, num_slots=2, steps_per_round=2)
    submit_all(eng, make_prompts(0, n=1), 4)

    def always_fail(active, n, **kw):
        raise RuntimeError("persistently sick chip")

    eng._decode_call = always_fail
    with pytest.raises(RuntimeError, match="sick chip"):
        run_resilient(eng, max_faults=2)


@pytest.mark.parametrize("engine_cls", [Engine, PagedEngine])
def test_snapshot_restore_resumes_mid_generation(tmp_path, engine_cls):
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    prompts = make_prompts(2, n=5)
    n_new = 6
    expected = expected_outputs(params, prompts, n_new)
    ckpt = tmp_path / "engine_state.json"

    kw = {"num_slots": 2, "steps_per_round": 2}
    if engine_cls is PagedEngine:
        kw["page_size"] = PAGE
    eng = engine_cls(params, CFG, **kw)
    submit_all(eng, prompts, n_new)
    # run a few rounds, snapshotting after each — then "crash"
    for _ in range(3):
        eng._admit_and_prefill()
        eng._decode_round()
        save_state(eng, ckpt)
    del eng

    # new process: fresh engine, same weights, resume from the ledger
    eng2 = engine_cls(params, CFG, **kw)
    restored = load_state(eng2, ckpt)
    eng2.run()
    by_uid = {r.uid: r for r in restored}
    assert [by_uid[i].output for i in range(len(prompts))] == expected
    assert all(by_uid[i].done for i in range(len(prompts)))


def test_snapshot_roundtrips_topk(tmp_path):
    """Request.topk (per-token top-K alternatives) must survive
    save_state/load_state aligned with ``output`` — a restored request with
    topk == [] but pre-crash output tokens is permanently misaligned."""
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    prompts = make_prompts(7, n=2)
    n_new = 6
    ckpt = tmp_path / "state.json"

    eng = Engine(params, CFG, num_slots=2, steps_per_round=2, topk_logprobs=3)
    submit_all(eng, prompts, n_new)
    for _ in range(2):
        eng._admit_and_prefill()
        eng._decode_round()
    live = {s.request.uid: s.request for s in eng.sched.slots if s.request}
    assert any(r.topk for r in live.values())  # generation produced topk
    save_state(eng, ckpt)
    del eng

    eng2 = Engine(params, CFG, num_slots=2, steps_per_round=2, topk_logprobs=3)
    restored = {r.uid: r for r in load_state(eng2, ckpt)}
    for uid, req in live.items():
        assert restored[uid].topk == req.topk
        assert len(restored[uid].topk) == len(req.output)
    eng2.run()
    for r in restored.values():  # alignment holds through completion
        assert len(r.topk) == len(r.output)
        assert all(len(ids) == 3 and len(vs) == 3 for ids, vs in r.topk)


def test_generate_rejects_mismatched_adapters():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    eng = Engine(params, CFG, num_slots=2, steps_per_round=2)
    with pytest.raises(ValueError, match="adapters"):
        eng.generate([[1, 2], [3, 4]], max_new_tokens=2, adapters=[None])


def test_snapshot_is_atomic(tmp_path):
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    eng = Engine(params, CFG, num_slots=2, steps_per_round=2)
    submit_all(eng, make_prompts(3, n=2), 4)
    ckpt = tmp_path / "state.json"
    save_state(eng, ckpt)
    first = ckpt.read_text()
    eng._admit_and_prefill()
    save_state(eng, ckpt)
    assert ckpt.read_text() != first  # updated in place
    assert not (tmp_path / "state.json.tmp").exists()  # no partial files


def test_resilient_checkpointing_loses_at_most_one_round(tmp_path):
    """Crash-consistency: kill the loop via an injected fault with
    max_faults=0, reload the snapshot, finish in a new engine."""
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    prompts = make_prompts(4, n=3)
    n_new = 8
    expected = expected_outputs(params, prompts, n_new)
    ckpt = tmp_path / "state.json"

    eng = Engine(params, CFG, num_slots=2, steps_per_round=2)
    submit_all(eng, prompts, n_new)
    FaultInjector(eng, fail_on_calls=[3])
    with pytest.raises(RuntimeError, match="injected"):
        run_resilient(eng, max_faults=0, checkpoint_path=ckpt)

    eng2 = Engine(params, CFG, num_slots=2, steps_per_round=2)
    restored = load_state(eng2, ckpt)
    # NB: the faulted round's slots still live in eng's scheduler — the
    # snapshot captured them as running (resumable); nothing was lost.
    run_resilient(eng2, checkpoint_path=ckpt)
    by_uid = {r.uid: r for r in restored}
    assert [by_uid[i].output for i in range(len(prompts))] == expected
