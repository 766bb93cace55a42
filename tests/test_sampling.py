"""Per-request sampling (core/sampling.py): greedy bit-parity, determinism,
top-k / top-p support sets, and engine integration (incl. preemption resume
and the TP-sharded program)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.core import sampling
from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.serving import (
    Engine,
    PagedEngine,
    Request,
    SamplingParams,
)

CFG = ModelConfig.tiny(dtype="float32")


def _state(params_list):
    return {k: jnp.asarray(v) for k, v in sampling.state_arrays(params_list).items()}


def _draw(logits, params_list, positions):
    return np.asarray(
        sampling.sample_tokens(
            jnp.asarray(logits, jnp.float32),
            _state(params_list),
            jnp.asarray(positions, jnp.int32),
        )
    )


def test_greedy_rows_bit_match_argmax():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 97)).astype(np.float32)
    mixed = [
        sampling.GREEDY,
        SamplingParams(temperature=1.0, seed=3),
        sampling.GREEDY,
        SamplingParams(temperature=0.7, top_k=5, seed=9),
    ]
    out = _draw(logits, mixed, [10, 11, 12, 13])
    greedy = logits.argmax(-1)
    assert out[0] == greedy[0] and out[2] == greedy[2]


def test_deterministic_in_seed_and_position():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(1, 64)).astype(np.float32)
    p = [SamplingParams(temperature=1.0, seed=42)]
    a = _draw(logits, p, [7])
    b = _draw(logits, p, [7])
    assert (a == b).all()
    # varying the position re-keys the draw: over many positions the
    # samples cannot all coincide for near-uniform logits
    draws = {int(_draw(logits, p, [pos])[0]) for pos in range(40)}
    assert len(draws) > 3
    # and a different seed gives a different trajectory
    other = [SamplingParams(temperature=1.0, seed=43)]
    traj_a = [int(_draw(logits, p, [pos])[0]) for pos in range(20)]
    traj_b = [int(_draw(logits, other, [pos])[0]) for pos in range(20)]
    assert traj_a != traj_b


def test_top_k_restricts_support():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(1, 50)).astype(np.float32)
    top5 = set(np.argsort(-logits[0])[:5].tolist())
    p = [SamplingParams(temperature=1.5, top_k=5, seed=0)]
    for pos in range(64):
        assert int(_draw(logits, p, [pos])[0]) in top5
    # top_k=1 is greedy regardless of temperature
    p1 = [SamplingParams(temperature=10.0, top_k=1, seed=0)]
    for pos in range(8):
        assert int(_draw(logits, p1, [pos])[0]) == int(logits.argmax())


def test_top_p_restricts_support():
    # crafted distribution: one dominant token at p≈0.88
    logits = np.log(np.array([[0.88, 0.06, 0.03, 0.02, 0.01]], np.float32))
    p = [SamplingParams(temperature=1.0, top_p=0.5, seed=5)]
    for pos in range(32):
        assert int(_draw(logits, p, [pos])[0]) == 0  # nucleus = {0}
    # top_p large enough to admit the second token
    p2 = [SamplingParams(temperature=1.0, top_p=0.92, seed=5)]
    seen = {int(_draw(logits, p2, [pos])[0]) for pos in range(256)}
    assert seen <= {0, 1}
    assert seen == {0, 1}  # both get drawn across 256 re-keyed draws


def test_sampled_frequencies_track_softmax():
    logits = np.log(np.array([[0.6, 0.3, 0.1]], np.float32))
    p = [SamplingParams(temperature=1.0, seed=11)]
    draws = np.array([int(_draw(logits, p, [pos])[0]) for pos in range(600)])
    freq0 = (draws == 0).mean()
    freq1 = (draws == 1).mean()
    assert abs(freq0 - 0.6) < 0.08
    assert abs(freq1 - 0.3) < 0.08


def test_engine_sampling_deterministic_and_mixed():
    """A sampled engine run is reproducible, and greedy requests inside it
    bit-match the greedy-only engine."""
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    prompts = [[int(t) for t in rng.integers(0, CFG.vocab_size, n)] for n in (3, 5, 4)]
    samp = [
        SamplingParams(temperature=0.9, seed=7),
        sampling.GREEDY,
        SamplingParams(temperature=1.2, top_k=8, seed=1),
    ]

    def run():
        eng = Engine(params, CFG, num_slots=2, steps_per_round=3,
                     enable_sampling=True)
        return eng.generate(prompts, max_new_tokens=6, sampling=samp)

    a, b = run(), run()
    assert a == b
    greedy_eng = Engine(params, CFG, num_slots=2, steps_per_round=3)
    greedy = greedy_eng.generate(prompts, max_new_tokens=6)
    assert a[1] == greedy[1]  # the greedy request is unaffected by the mode
    assert a[0] != greedy[0] or a[2] != greedy[2]  # sampling actually sampled


def test_engine_rejects_sampled_request_when_disabled():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    eng = Engine(params, CFG, num_slots=1, steps_per_round=2)
    req = Request(uid=0, prompt=[1, 2], max_new_tokens=2,
                  sampling=SamplingParams(temperature=1.0))
    with pytest.raises(ValueError, match="enable_sampling"):
        eng.submit(req)


def test_paged_preemption_resumes_sampled_trajectory():
    """Preemption replays prompt+output; because keys derive from
    (seed, absolute position), a sampled request resumes bit-identically."""
    cfg = ModelConfig.tiny(dtype="float32", pages_per_compute_block=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(6)
    # each sequence needs ceil((9 + 12 + slack 2) / 16) = 2 pages fully
    # grown; 3 usable pages forces preemption (mirrors
    # test_serving_paged.test_paged_engine_preempts_under_pool_pressure)
    prompts = [[int(t) for t in rng.integers(0, cfg.vocab_size, 9)] for _ in range(2)]
    samp = [SamplingParams(temperature=1.0, seed=21), SamplingParams(temperature=1.0, seed=22)]

    roomy = PagedEngine(params, cfg, num_slots=2, steps_per_round=3,
                        page_size=16, enable_sampling=True)
    expected = roomy.generate(prompts, max_new_tokens=12, sampling=samp)
    assert roomy.stats.preemptions == 0

    tight = PagedEngine(params, cfg, num_slots=2, steps_per_round=3,
                        page_size=16, num_pages=4, enable_sampling=True)
    outputs = tight.generate(prompts, max_new_tokens=12, sampling=samp)
    assert tight.stats.preemptions > 0
    assert outputs == expected


def test_tp_engine_sampling_matches_single_chip(mesh8):
    """The sharded sampled program must reproduce the single-chip sampled
    engine exactly: logits are TP-bit-matched and keys depend only on
    (seed, position)."""
    cfg = ModelConfig.tiny(num_q_heads=8, num_kv_heads=4, dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(4))
    rng = np.random.default_rng(8)
    prompts = [[int(t) for t in rng.integers(0, cfg.vocab_size, n)] for n in (3, 7)]
    samp = [SamplingParams(temperature=0.8, seed=13), SamplingParams(temperature=1.1, top_p=0.9, seed=14)]

    single = Engine(params, cfg, num_slots=2, steps_per_round=3,
                    enable_sampling=True)
    expected = single.generate(prompts, max_new_tokens=5, sampling=samp)

    sharded = Engine(params, cfg, num_slots=2, steps_per_round=3, mesh=mesh8,
                     enable_sampling=True)
    outputs = sharded.generate(prompts, max_new_tokens=5, sampling=samp)
    assert outputs == expected


def test_recovery_snapshot_preserves_sampling(tmp_path):
    from starflashattention_tpu.serving import recovery

    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    eng = Engine(params, CFG, num_slots=1, steps_per_round=2,
                 enable_sampling=True)
    sp = SamplingParams(temperature=0.9, top_k=4, top_p=0.8, seed=77)
    eng.submit(Request(uid=0, prompt=[1, 2, 3], max_new_tokens=4, sampling=sp))
    path = tmp_path / "ledger.json"
    recovery.save_state(eng, path)

    fresh = Engine(params, CFG, num_slots=1, steps_per_round=2,
                   enable_sampling=True)
    restored = recovery.load_state(fresh, path)
    assert restored[0].sampling == sp
    assert dataclasses.asdict(restored[0].sampling) == dataclasses.asdict(sp)


def test_min_p_cut(rng):
    """min_p keeps tokens with prob >= min_p * p_max: at min_p=1.0 only the
    argmax survives (sampled == greedy for any temperature); at moderate
    min_p the drawn token always satisfies the floor."""
    from starflashattention_tpu.core.sampling import (
        SamplingParams,
        sample_tokens,
        state_arrays,
    )

    b, v = 8, 64
    logits = jnp.asarray(rng.standard_normal((b, v)) * 3, jnp.float32)
    pos = jnp.arange(b, dtype=jnp.int32)

    st = state_arrays([SamplingParams(temperature=1.0, min_p=1.0, seed=i)
                       for i in range(b)])
    toks = sample_tokens(logits, {k: jnp.asarray(a) for k, a in st.items()}, pos)
    np.testing.assert_array_equal(np.asarray(toks), np.argmax(logits, -1))

    min_p = 0.3
    st = state_arrays([SamplingParams(temperature=1.0, min_p=min_p, seed=i)
                       for i in range(b)])
    for trial in range(5):
        toks = sample_tokens(
            logits, {k: jnp.asarray(a) for k, a in st.items()}, pos + 10 * trial
        )
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        chosen = probs[np.arange(b), np.asarray(toks)]
        assert (chosen >= min_p * probs.max(-1) - 1e-7).all()
