"""Automatic prefix caching (serving/prefix_cache.py + PagedEngine):
bit-identical outputs, real page sharing, LRU eviction under pressure,
preemption fast-resume, sampled parity, and sanitizer interplay."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.serving import PagedEngine, Request, SamplingParams
from starflashattention_tpu.serving.prefix_cache import PrefixCache, _page_keys

CFG = ModelConfig.tiny(dtype="float32", pages_per_compute_block=2)
PAGE = 16


def make_engine(params, **kw):
    kw.setdefault("page_size", PAGE)
    kw.setdefault("steps_per_round", 3)
    kw.setdefault("prefix_cache", True)
    return PagedEngine(params, CFG, **kw)


def expected(params, prompts, n_new, **kw):
    eng = PagedEngine(params, CFG, page_size=PAGE, steps_per_round=3,
                      num_slots=kw.pop("num_slots", 2), **kw)
    return eng.generate(prompts, max_new_tokens=n_new)


# -- unit: the store itself ----------------------------------------------------


def test_store_match_insert_release_evict():
    pc = PrefixCache(page_size=4)
    toks = list(range(11))  # 2 full pages + tail
    assert pc.match(toks) == ([], 0)
    assert pc.insert_run(toks, 0, 2) == 2
    adopted = pc.insert(toks, 0, [7, 9])
    assert adopted == [7, 9] and pc.resident_pages == 2
    pages, n = pc.match(toks)
    assert pages == [7, 9] and n == 8
    # divergent second page -> only the first page matches
    other = toks[:4] + [99] * 7
    pages2, n2 = pc.match(other)
    assert pages2 == [7] and n2 == 4
    # all referenced: nothing evictable
    assert pc.evict_lru(10) == []
    pc.release([7, 9])  # insert's refs
    pc.release([7, 9])  # match's refs -> 9 hits refcount 0 first
    pc.release([7])  # second match's ref -> 7 follows
    assert pc.evictable_pages == 2
    assert pc.evict_lru(1) == [9]  # LRU order: first to reach refcount 0
    pages3, n3 = pc.match(toks)  # chain now ends after page 7
    assert pages3 == [7] and n3 == 4
    pc.release([7])
    assert pc.evict_lru(10) == [7]


def test_store_match_caps_before_last_token():
    pc = PrefixCache(page_size=4)
    toks = list(range(8))  # exactly 2 full pages
    pc.insert(toks, 0, [3, 4][: pc.insert_run(toks, 0, 2)])
    pages, n = pc.match(toks)  # must leave >= 1 token to prefill
    assert n == 4 and pages == [3]


def test_store_chain_keys_are_position_dependent():
    keys_a = _page_keys([1, 2, 3, 4, 5, 6, 7, 8], 4, 2)
    keys_b = _page_keys([9, 9, 9, 9, 5, 6, 7, 8], 4, 2)
    # same second-page tokens, different first page -> different chain key
    assert keys_a[1] != keys_b[1]


# -- engine integration --------------------------------------------------------


def test_shared_system_prompt_bit_matches_and_shares_pages():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    system = [int(t) for t in rng.integers(0, CFG.vocab_size, 2 * PAGE + 3)]
    prompts = [system + [int(t) for t in rng.integers(0, CFG.vocab_size, 4)]
               for _ in range(4)]
    want = expected(params, prompts, 6)

    eng = make_engine(params, num_slots=2)
    got = eng.generate(prompts, max_new_tokens=6)
    assert got == want
    # the first admission publishes the 2 full system pages; later ones hit
    assert eng.stats.prefix_hits >= 1
    assert eng.stats.prefix_tokens_reused >= 2 * PAGE
    # retirement released refs but pages stay warm (resident, evictable)
    assert eng._prefix.evictable_pages == eng._prefix.resident_pages > 0
    # pool accounting: free + resident-in-store = total usable
    assert eng.pool.free_pages + eng._prefix.resident_pages == eng.num_pages - 1


def test_identical_repeat_request_reuses_and_matches():
    params = llama.init_params(CFG, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    prompt = [int(t) for t in rng.integers(0, CFG.vocab_size, 3 * PAGE)]
    want = expected(params, [prompt, prompt], 5, num_slots=1)

    eng = make_engine(params, num_slots=1)
    got = eng.generate([prompt, prompt], max_new_tokens=5)
    assert got == want
    assert got[0] == got[1]  # greedy determinism
    # second admission reuses (3*PAGE - 1)//PAGE = 2 full pages
    assert eng.stats.prefix_tokens_reused == 2 * PAGE


def test_mixed_hit_and_miss_in_one_admission_round():
    """A cache-hit slot and a fresh slot admitted in the SAME prefill call
    (per-row starts differ — the generalized continuation math)."""
    params = llama.init_params(CFG, jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    shared = [int(t) for t in rng.integers(0, CFG.vocab_size, PAGE + 5)]
    fresh = [int(t) for t in rng.integers(0, CFG.vocab_size, 7)]
    # warm the cache with `shared`, then admit [shared-again, fresh] together
    eng = make_engine(params, num_slots=2)
    warm = eng.generate([shared], max_new_tokens=4)
    got = eng.generate([shared, fresh], max_new_tokens=4)
    want = expected(params, [shared, fresh], 4)
    assert got == want
    assert got[0] == warm[0]
    assert eng.stats.prefix_hits >= 1


def test_chunked_prefill_with_prefix_cache():
    params = llama.init_params(CFG, jax.random.PRNGKey(3))
    rng = np.random.default_rng(3)
    system = [int(t) for t in rng.integers(0, CFG.vocab_size, 2 * PAGE)]
    prompts = [system + [int(t) for t in rng.integers(0, CFG.vocab_size, n)]
               for n in (3, 9, 1)]
    want = expected(params, prompts, 5)

    eng = make_engine(params, num_slots=2, prefill_chunk=8)
    got = eng.generate(prompts, max_new_tokens=5)
    assert got == want
    assert eng.stats.prefix_hits >= 1


def test_eviction_under_pool_pressure_prefers_warm_pages():
    """Warm refcount-0 cached pages are recycled before any preemption."""
    params = llama.init_params(CFG, jax.random.PRNGKey(4))
    rng = np.random.default_rng(4)
    a = [int(t) for t in rng.integers(0, CFG.vocab_size, 2 * PAGE + 2)]
    b = [int(t) for t in rng.integers(0, CFG.vocab_size, 2 * PAGE + 2)]
    want = expected(params, [a, b], 6, num_slots=1)

    # pool: 5 usable pages; each request needs 3 (2*PAGE+2+6 tokens) and A
    # leaves 2 warm pages behind -> B's admission must evict them
    eng = make_engine(params, num_slots=1, num_pages=6)
    got = eng.generate([a, b], max_new_tokens=6)
    assert got == want
    assert eng.stats.preemptions == 0
    assert eng.stats.prefix_hits == 0  # b shares nothing with a


def test_preemption_fast_resume_via_prefix_cache():
    """A preempted request's own published prompt pages survive preemption
    (refcount drops, pages stay warm) — re-admission matches them and
    re-prefills only the tail; outputs still bit-match."""
    params = llama.init_params(CFG, jax.random.PRNGKey(5))
    rng = np.random.default_rng(5)
    prompts = [[int(t) for t in rng.integers(0, CFG.vocab_size, PAGE + 2)]
               for _ in range(2)]
    n_new = 2 * PAGE
    want = expected(params, prompts, n_new)

    # each sequence fully grown needs ceil((PAGE+2+2*PAGE+2)/PAGE)=4 pages;
    # 6 usable forces preemption with both running
    eng = make_engine(params, num_slots=2, num_pages=7)
    got = eng.generate(prompts, max_new_tokens=n_new)
    assert got == want
    assert eng.stats.preemptions > 0
    assert eng.stats.prefix_hits >= 1  # the resume matched its own pages


def test_sampled_with_prefix_cache_deterministic():
    params = llama.init_params(CFG, jax.random.PRNGKey(6))
    rng = np.random.default_rng(6)
    system = [int(t) for t in rng.integers(0, CFG.vocab_size, PAGE + 1)]
    prompts = [system + [1, 2], system + [3]]
    samp = [SamplingParams(temperature=1.0, seed=5),
            SamplingParams(temperature=0.8, top_k=16, seed=6)]

    plain = PagedEngine(params, CFG, page_size=PAGE, steps_per_round=3,
                        num_slots=2, enable_sampling=True)
    want = plain.generate(prompts, max_new_tokens=6, sampling=samp)

    eng = make_engine(params, num_slots=2, enable_sampling=True)
    eng.generate([system + [9]], max_new_tokens=2)  # publish the system page
    got = eng.generate(prompts, max_new_tokens=6, sampling=samp)
    assert got == want
    assert eng.stats.prefix_hits >= 1


def test_debug_validate_allows_sharing_but_catches_real_races():
    from starflashattention_tpu.utils.sanitize import PageTableRace, check_page_table

    params = llama.init_params(CFG, jax.random.PRNGKey(7))
    rng = np.random.default_rng(7)
    system = [int(t) for t in rng.integers(0, CFG.vocab_size, PAGE)]
    prompts = [system + [int(t)] for t in rng.integers(0, CFG.vocab_size, 3)]
    eng = make_engine(params, num_slots=3, debug_validate=True)
    want = expected(params, prompts, 4, num_slots=3)
    assert eng.generate(prompts, max_new_tokens=4) == want  # no false trips

    # a PRIVATE page aliased across slots must still trip
    table = np.array([[2, 0], [2, 0]], np.int32)
    with pytest.raises(PageTableRace, match="aliased"):
        check_page_table(table, np.array([4, 4]), 16, 8, shared_ok={5})
    # the same table is legal when page 2 is a registered shared page
    check_page_table(table, np.array([4, 4]), 16, 8, shared_ok={2})


def test_prefix_cache_rejects_mesh():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="prefix_cache"):
        PagedEngine(params, CFG, page_size=PAGE, mesh=object(), prefix_cache=True)


def test_native_pool_release_prefix_parity():
    """The C++ pool's detach/free_raw must mirror the Python twin."""
    from starflashattention_tpu.cache.paged import SeqPagePool
    from starflashattention_tpu.utils import native

    pools = [SeqPagePool(8)]
    if native.load() is not None:
        pools.append(native.NativePagePool(8))
    for pool in pools:
        h = pool.seq_new()
        pool.seq_extend(h, 5 * 16, 16)  # 5 pages
        pages = pool.seq_pages(h)
        head = pool.seq_release_prefix(h, 2)
        assert head == pages[:2]
        assert pool.seq_pages(h) == pages[2:]
        assert pool.free_pages == 2  # 7 usable - 5 held (3 handle + 2 loose)
        pool.free_raw(head)
        assert pool.free_pages == 4
        pool.seq_free(h)
        assert pool.free_pages == 7
