"""Sanitizers: numeric tripwire + page-table race detector (utils/sanitize.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.serving import PagedEngine, Request
from starflashattention_tpu.utils import sanitize

CFG = ModelConfig.tiny(dtype="float32", pages_per_compute_block=2)
PAGE = 16


def test_check_finite_passes_clean_tree():
    sanitize.check_finite(
        {"a": jnp.ones((3, 3)), "b": {"c": jnp.zeros(4), "ints": jnp.arange(3)}}
    )


def test_check_finite_names_bad_leaves():
    tree = {"ok": jnp.ones(2), "bad": jnp.array([1.0, np.nan]), "inf": jnp.array([np.inf])}
    with pytest.raises(sanitize.NumericFault) as e:
        sanitize.check_finite(tree, "step")
    assert "bad" in str(e.value) and "inf" in str(e.value) and "ok" not in str(e.value)


def _table(rows):
    return np.asarray(rows, np.int32)


def test_page_table_clean():
    table = _table([[1, 2, 0, 0], [3, 4, 5, 0]])
    sanitize.check_page_table(table, np.array([30, 40]), page_size=16, num_pages=8)


def test_page_table_detects_aliasing():
    table = _table([[1, 2, 0, 0], [3, 2, 0, 0]])  # page 2 owned twice
    with pytest.raises(sanitize.PageTableRace, match="aliased by slots 0 and 1"):
        sanitize.check_page_table(table, np.array([30, 30]), 16, 8)


def test_page_table_aliasing_ok_across_shards():
    """Sharded pools use LOCAL page ids — the same id on two different data
    shards is two different physical pages."""
    table = _table([[1, 2], [1, 2]])
    sanitize.check_page_table(
        table, np.array([30, 30]), 16, 8, shard_of=np.array([0, 1])
    )


def test_page_table_detects_null_and_range():
    with pytest.raises(sanitize.PageTableRace, match="null page 0"):
        sanitize.check_page_table(_table([[0, 0]]), np.array([10]), 16, 8)
    with pytest.raises(sanitize.PageTableRace, match="out of range"):
        sanitize.check_page_table(_table([[9, 0]]), np.array([10]), 16, 8)


def test_page_table_ignores_inactive_and_tail():
    # slot 1 inactive despite garbage; slot 0's tail beyond ceil(len/page) too
    table = _table([[1, 7, 7, 7], [9, 9, 9, 9]])
    sanitize.check_page_table(
        table, np.array([10, 64]), 16, 8, active=np.array([True, False])
    )


def test_append_window():
    sanitize.check_append_window(np.array([120, 125]), steps=3, max_seq_len=128)
    with pytest.raises(sanitize.PageTableRace, match="cache capacity"):
        sanitize.check_append_window(np.array([120, 126]), steps=3, max_seq_len=128)


def test_paged_engine_debug_validate_clean_run():
    """No false positives: a validated engine serves normally."""
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompts = [[int(t) for t in rng.integers(0, CFG.vocab_size, 4 + i)] for i in range(3)]
    eng = PagedEngine(
        params, CFG, num_slots=2, steps_per_round=3, page_size=PAGE,
        debug_validate=True,
    )
    ref = PagedEngine(params, CFG, num_slots=2, steps_per_round=3, page_size=PAGE)
    assert eng.generate(prompts, max_new_tokens=5) == ref.generate(
        prompts, max_new_tokens=5
    )


def test_paged_engine_debug_validate_catches_injected_alias():
    """Corrupt the host page table to alias two live sequences — the
    sanitizer must trip before the decode round consumes it."""
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    eng = PagedEngine(
        params, CFG, num_slots=2, steps_per_round=2, page_size=PAGE,
        debug_validate=True,
    )
    for i in range(2):
        eng.submit(Request(uid=i, prompt=[1, 2, 3, 4], max_new_tokens=6))
    eng._admit_and_prefill()
    eng._decode_round()  # clean round first
    # simulate an allocator bug — seq_extend double-hands slot 0's first
    # physical page to slot 1 (injected after the real growth, since
    # _before_decode rebuilds every row from the allocator's page lists)
    orig_grow = eng._grow

    def buggy_grow(slot, new_len):
        ok = orig_grow(slot, new_len)
        eng._host_table[1, 0] = eng._host_table[0, 0]
        return ok

    eng._grow = buggy_grow
    with pytest.raises(sanitize.PageTableRace, match="aliased"):
        eng._decode_round()


def test_prefill_nan_tripwire():
    """A poisoned checkpoint (NaN weight) is detected at the first prefill."""
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    poisoned = jax.tree.map(lambda x: x, params)
    poisoned["embed"] = poisoned["embed"].at[0, 0].set(jnp.nan)
    eng = PagedEngine(
        poisoned, CFG, num_slots=2, steps_per_round=2, page_size=PAGE,
        debug_validate=True,
    )
    eng.submit(Request(uid=0, prompt=[0, 1, 2], max_new_tokens=4))
    with pytest.raises(sanitize.NumericFault, match="prefill"):
        eng._admit_and_prefill()
