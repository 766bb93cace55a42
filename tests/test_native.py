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


def test_token_loader_twins_bit_match(tmp_path):
    """NativeTokenLoader and PyTokenLoader draw IDENTICAL batches from the
    same (seed, corpus): the C and Python xorshift64* streams must agree
    bit-for-bit so a training run is reproducible regardless of which
    loader an environment ends up with."""
    import numpy as np
    import pytest

    from starflashattention_tpu.utils import native

    if native.load() is None:
        pytest.skip("native runtime not built")
    path = tmp_path / "corpus.bin"
    data = np.random.default_rng(0).integers(0, 256, 50_000, dtype=np.uint8)
    data.tofile(path)
    nl = native.NativeTokenLoader(path, 1, seed=7)
    pl = native.PyTokenLoader(path, 1, seed=7)
    assert nl.num_tokens == pl.num_tokens == 50_000
    for _ in range(8):
        a = nl.next(8, 129, lo=1000, hi=40_000)
        b = pl.next(8, 129, lo=1000, hi=40_000)
        np.testing.assert_array_equal(a, b)
    # windows respect the [lo, hi) carve and reproduce the mmap'd bytes
    starts_seen = a.min() >= 0
    assert starts_seen
    nl.close()
    pl.close()


def test_token_loader_itemsizes_and_bounds(tmp_path):
    import numpy as np
    import pytest

    from starflashattention_tpu.utils import native

    if native.load() is None:
        pytest.skip("native runtime not built")
    # 2-byte tokens: values above 255 must come through intact
    path = tmp_path / "c16.bin"
    data = np.random.default_rng(1).integers(0, 50_000, 4096, dtype=np.uint16)
    data.tofile(path)
    nl = native.NativeTokenLoader(path, 2, seed=3)
    out = nl.next(4, 64)
    assert out.dtype == np.int32 and out.max() > 255
    # every row must be a literal corpus window
    arr = data.astype(np.int32)
    for row in out:
        idx = np.where(arr[: len(arr) - 63] == row[0])[0]
        assert any(np.array_equal(arr[i : i + 64], row) for i in idx)
    with pytest.raises(ValueError):
        nl.next(1, 10_000)  # wider than the corpus
    nl.close()


def test_token_loader_determinism_per_seed(tmp_path):
    import numpy as np
    import pytest

    from starflashattention_tpu.utils import native

    if native.load() is None:
        pytest.skip("native runtime not built")
    path = tmp_path / "c.bin"
    np.arange(8192, dtype=np.int32).tofile(path)
    a = native.NativeTokenLoader(path, 4, seed=5).next(16, 32)
    b = native.NativeTokenLoader(path, 4, seed=5).next(16, 32)
    c = native.NativeTokenLoader(path, 4, seed=6).next(16, 32)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    # int32 corpus: window contents equal start..start+32 (identity corpus)
    for row in a:
        np.testing.assert_array_equal(row, np.arange(row[0], row[0] + 32))
