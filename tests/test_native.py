"""Native runtime core (C++ via ctypes) vs the Python implementations."""

import pytest

from starflashattention_tpu.cache.paged import PageAllocator
from starflashattention_tpu.utils import native

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native runtime not built and no toolchain"
)


def test_pool_alloc_free_roundtrip():
    pool = native.NativePagePool(16)
    assert pool.free_pages == 15  # page 0 reserved
    h = pool.seq_new()
    assert pool.seq_extend(h, new_len=10, page_size=4) == 3  # ceil(10/4)
    pages = pool.seq_pages(h)
    assert len(pages) == 3 and 0 not in pages and len(set(pages)) == 3
    # extend within the same page count is a no-op
    assert pool.seq_extend(h, new_len=12, page_size=4) == 3
    assert pool.seq_extend(h, new_len=13, page_size=4) == 4
    assert pool.free_pages == 15 - 4
    pool.seq_free(h)
    assert pool.free_pages == 15


def test_pool_exhaustion_is_clean():
    pool = native.NativePagePool(4)  # 3 usable
    h1 = pool.seq_new()
    pool.seq_extend(h1, new_len=3 * 8, page_size=8)
    h2 = pool.seq_new()
    with pytest.raises(MemoryError):
        pool.seq_extend(h2, new_len=8, page_size=8)
    # failed extend must not leak pages
    pool.seq_free(h1)
    assert pool.free_pages == 3
    assert pool.seq_extend(h2, new_len=8, page_size=8) == 1


def test_pool_matches_python_allocator_semantics():
    py = PageAllocator(32)
    nat = native.NativePagePool(32)
    assert py.free_pages == nat.free_pages
    a = py.alloc(5)
    h = nat.seq_new()
    nat.seq_extend(h, new_len=5 * 4, page_size=4)
    assert py.free_pages == nat.free_pages
    py.free(a)
    nat.seq_free(h)
    assert py.free_pages == nat.free_pages


def test_sched_core_fcfs_and_retire():
    s = native.NativeSchedCore(2, 64)
    for uid in (100, 101, 102):
        s.submit(uid, prompt_len=4, max_new=3)
    with pytest.raises(ValueError):
        s.submit(999, prompt_len=60, max_new=10)

    admitted = s.admit()
    assert admitted == [(0, 100), (1, 101)]
    assert s.active_mask() == [True, True]
    assert s.budget(0) == 3 and s.slot_uid(1) == 101

    # record 2 tokens → still running; 2 more → retires (budget-capped)
    assert s.record(0, 2) is False
    assert s.record(0, 2) is True
    assert s.active_mask() == [False, True]
    assert s.admit() == [(0, 102)]

    # EOS inside the recorded window retires immediately
    assert s.record(1, 3, eos_at=0) is True
    assert s.has_work  # slot 0 still live
    assert s.record(0, 3) is True
    assert not s.has_work


def test_sched_capacity_slack_parity():
    """Native submit must apply the same slack-aware rejection as
    serving/scheduler.py:51 (engine reserves round_size-1 overshoot rows)."""
    from starflashattention_tpu.serving.scheduler import Request, Scheduler

    py = Scheduler(2, 64, capacity_slack=7)
    nat = native.NativeSchedCore(2, 64, capacity_slack=7)
    # 50 + 7 + 7 = 64: exactly fits both
    py.submit(Request(uid=1, prompt=[0] * 50, max_new_tokens=7))
    nat.submit(1, prompt_len=50, max_new=7)
    # 50 + 8 + 7 = 65: both reject
    with pytest.raises(ValueError):
        py.submit(Request(uid=2, prompt=[0] * 50, max_new_tokens=8))
    with pytest.raises(ValueError):
        nat.submit(2, prompt_len=50, max_new=8)
