"""Paged-cache engine: outputs must match the contiguous engine / unbatched
generate(), pages must be recycled, and pool pressure must preempt-and-resume
without changing results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.serving import PagedEngine, Request

CFG = ModelConfig.tiny(dtype="float32", pages_per_compute_block=2)
PAGE = 16  # tiny cache: max_seq_len=128 -> 8 pages/seq


def reference_generate(params, prompt, n):
    toks = jnp.asarray([prompt], jnp.int32)
    lengths = jnp.asarray([len(prompt)], jnp.int32)
    out = llama.generate(params, CFG, toks, lengths, max_new_tokens=n)
    return [int(t) for t in np.asarray(out)[0]]


def make_engine(**kw):
    kw.setdefault("page_size", PAGE)
    kw.setdefault("steps_per_round", 3)
    return PagedEngine(kw.pop("params"), CFG, **kw)


def test_paged_engine_matches_unbatched():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompts = [[int(t) for t in rng.integers(0, CFG.vocab_size, n)] for n in (3, 7, 5)]
    n_new = 6
    expected = [reference_generate(params, p, n_new) for p in prompts]
    eng = make_engine(params=params, num_slots=2)
    outputs = eng.generate(prompts, max_new_tokens=n_new)
    assert outputs == expected
    # all pages returned to the pool after every request retires
    assert eng.pool.free_pages == eng.num_pages - 1
    assert eng.stats.finished == 3
    assert eng.stats.decode_tokens > 0
    assert eng.stats.p50_ttft_ms() > 0


def test_paged_engine_interleaved_more_requests_than_slots():
    params = llama.init_params(CFG, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    prompts = [[int(t) for t in rng.integers(0, CFG.vocab_size, 2 + i)] for i in range(5)]
    expected = [reference_generate(params, p, 4) for p in prompts]
    eng = make_engine(params=params, num_slots=2, steps_per_round=2)
    outputs = eng.generate(prompts, max_new_tokens=4)
    assert outputs == expected


def test_paged_engine_eos_stops_early():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    prompt = [1, 2, 3]
    full = reference_generate(params, prompt, 8)
    eos = full[2]
    stop = full.index(eos)
    eng = make_engine(params=params, num_slots=1, steps_per_round=4)
    out = eng.generate([prompt], max_new_tokens=8, eos_token=eos)[0]
    assert out == full[: stop + 1]


def test_paged_engine_preempts_under_pool_pressure():
    """Pool big enough for ~1.5 sequences: the younger request must be
    preempted, resumed after the older finishes, and still match."""
    params = llama.init_params(CFG, jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    prompts = [[int(t) for t in rng.integers(0, CFG.vocab_size, 9)] for _ in range(2)]
    n_new = 12
    expected = [reference_generate(params, p, n_new) for p in prompts]
    # each sequence needs ceil((9 + 12 + slack 2) / 16) = 2 pages fully grown;
    # 3 usable pages forces coexistence failure at some round
    eng = make_engine(params=params, num_slots=2, num_pages=4)
    outputs = eng.generate(prompts, max_new_tokens=n_new)
    assert outputs == expected
    assert eng.stats.preemptions > 0
    assert eng.pool.free_pages == eng.num_pages - 1


def test_paged_engine_single_seq_too_big_raises():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    eng = make_engine(params=params, num_slots=1, num_pages=2)  # 1 usable page
    with pytest.raises(MemoryError):
        eng.generate([[1, 2, 3]], max_new_tokens=PAGE + 4)


def test_paged_engine_native_pool_backed():
    """When the C++ runtime builds, the engine must actually use it."""
    from starflashattention_tpu.utils import native

    if native.load() is None:
        pytest.skip("native toolchain unavailable")
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    eng = make_engine(params=params, num_slots=2, native=True)
    assert isinstance(eng.pool, native.NativePagePool)
    prompts = [[5, 6, 7], [8, 9]]
    expected = [reference_generate(params, p, 4) for p in prompts]
    assert eng.generate(prompts, max_new_tokens=4) == expected
    assert eng.pool.free_pages == eng.num_pages - 1


def test_paged_chunked_prefill_matches():
    """Chunked prefill on the PAGED engine: identical outputs, pages fully
    recycled (admission allocates the whole prompt up front, chunks write
    into the already-backed windows)."""
    import numpy as np

    cfg = ModelConfig.tiny(dtype="float32", pages_per_compute_block=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(6))
    rng = np.random.default_rng(6)
    prompts = [
        [int(t) for t in rng.integers(0, cfg.vocab_size, n)] for n in (3, 9, 17, 5)
    ]
    ref = PagedEngine(params, cfg, num_slots=2, steps_per_round=2, page_size=16)
    expected = ref.generate(prompts, max_new_tokens=4)

    eng = PagedEngine(
        params, cfg, num_slots=2, steps_per_round=2, page_size=16, prefill_chunk=8
    )
    outputs = eng.generate(prompts, max_new_tokens=4)
    assert outputs == expected
    assert eng.pool.free_pages == eng.num_pages - 1


def test_paged_windowed_engine_matches_contiguous():
    """Sliding-window models serve on the PAGED engine; token streams match
    the contiguous windowed engine exactly."""
    from starflashattention_tpu.serving import Engine

    cfg = ModelConfig.tiny(
        dtype="float32", num_splits=1, pages_per_compute_block=2, sliding_window=24
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(3)
    prompts = [[int(t) for t in rng.integers(0, cfg.vocab_size, n)] for n in (5, 30, 11)]
    ref = Engine(params, cfg, num_slots=2, steps_per_round=3).generate(
        prompts, max_new_tokens=8
    )
    eng = PagedEngine(
        params, cfg, num_slots=2, steps_per_round=3, page_size=PAGE,
        debug_validate=True,
    )
    outputs = eng.generate(prompts, max_new_tokens=8)
    assert outputs == ref
    assert eng.pool.free_pages == eng.num_pages - 1


def test_paged_windowed_rolling_buffer_reclaims_pages():
    """Rolling-buffer KV: generating far past the window must fit in a pool
    SMALLER than the un-reclaimed footprint — out-of-window pages are freed
    mid-flight and outputs still match the contiguous windowed engine."""
    from starflashattention_tpu.serving import Engine

    w = 16
    cfg = ModelConfig.tiny(
        dtype="float32", num_splits=1, pages_per_compute_block=1,
        sliding_window=w, max_seq_len=256,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(4))
    prompt = [3, 1, 4, 1, 5]
    n_new = 96  # final length 101 -> 13 pages of 8 un-reclaimed
    ref = Engine(params, cfg, num_slots=1, steps_per_round=4).generate(
        [prompt], max_new_tokens=n_new
    )
    # 6 usable pages of 8 tokens: un-reclaimed footprint (13) cannot fit, and
    # a too-small pool would raise MemoryError (no other slot to preempt)
    eng = PagedEngine(
        params, cfg, num_slots=1, steps_per_round=4, page_size=8, num_pages=7,
        debug_validate=True,
    )
    outputs = eng.generate([prompt], max_new_tokens=n_new)
    assert outputs == ref
    assert eng.stats.preemptions == 0
    assert eng.pool.free_pages == eng.num_pages - 1  # freed on retire too
