"""ctypes bindings for the native runtime core (native/libsfa_runtime.so).

Loads the shared library if present (building it on first use when a
toolchain is available), else callers fall back to the pure-Python
implementations. No pybind11 — plain C ABI via ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libsfa_runtime.so"
_lib = None
_tried = False


def load(build_if_missing: bool = True):
    """Return the loaded CDLL or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = _NATIVE_DIR / "sfa_runtime.cc"
    stale = (
        _LIB_PATH.exists()
        and src.exists()
        and src.stat().st_mtime > _LIB_PATH.stat().st_mtime
    )
    if (not _LIB_PATH.exists() or stale) and build_if_missing and _NATIVE_DIR.exists():
        try:
            subprocess.run(
                ["make", "-B", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            if stale:  # stale binary is worse than none — don't load it
                return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))

    lib.sfa_pool_create.restype = ctypes.c_void_p
    lib.sfa_pool_create.argtypes = [ctypes.c_int]
    lib.sfa_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.sfa_pool_free_count.restype = ctypes.c_int
    lib.sfa_pool_free_count.argtypes = [ctypes.c_void_p]
    lib.sfa_pool_seq_new.restype = ctypes.c_int
    lib.sfa_pool_seq_new.argtypes = [ctypes.c_void_p]
    lib.sfa_pool_seq_extend.restype = ctypes.c_int
    lib.sfa_pool_seq_extend.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 3
    lib.sfa_pool_seq_pages.restype = ctypes.c_int
    lib.sfa_pool_seq_pages.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.sfa_pool_seq_free.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sfa_pool_seq_release_prefix.restype = ctypes.c_int
    lib.sfa_pool_seq_release_prefix.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.sfa_pool_free_raw.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]

    lib.sfa_sched_create.restype = ctypes.c_void_p
    lib.sfa_sched_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.sfa_sched_destroy.argtypes = [ctypes.c_void_p]
    lib.sfa_sched_submit.restype = ctypes.c_int
    lib.sfa_sched_submit.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.sfa_sched_admit.restype = ctypes.c_int
    lib.sfa_sched_admit.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.sfa_sched_record.restype = ctypes.c_int
    lib.sfa_sched_record.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 3
    lib.sfa_sched_budget.restype = ctypes.c_int
    lib.sfa_sched_budget.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sfa_sched_slot_uid.restype = ctypes.c_int64
    lib.sfa_sched_slot_uid.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sfa_sched_active.restype = ctypes.c_int
    lib.sfa_sched_active.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.sfa_sched_has_work.restype = ctypes.c_int
    lib.sfa_sched_has_work.argtypes = [ctypes.c_void_p]

    lib.sfa_loader_open.restype = ctypes.c_void_p
    lib.sfa_loader_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64,
    ]
    lib.sfa_loader_num_tokens.restype = ctypes.c_int64
    lib.sfa_loader_num_tokens.argtypes = [ctypes.c_void_p]
    lib.sfa_loader_next.restype = ctypes.c_int
    lib.sfa_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sfa_loader_close.argtypes = [ctypes.c_void_p]

    _lib = lib
    return _lib


class NativePagePool:
    """Native-backed per-sequence page allocator (block manager)."""

    def __init__(self, num_pages: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime not available")
        self._lib = lib
        self._h = lib.sfa_pool_create(num_pages)
        if not self._h:
            raise ValueError("need at least 2 pages")
        self.num_pages = num_pages

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.sfa_pool_destroy(self._h)
            self._h = None

    @property
    def free_pages(self) -> int:
        return self._lib.sfa_pool_free_count(self._h)

    def seq_new(self) -> int:
        return self._lib.sfa_pool_seq_new(self._h)

    def seq_extend(self, handle: int, new_len: int, page_size: int) -> int:
        n = self._lib.sfa_pool_seq_extend(self._h, handle, new_len, page_size)
        if n < 0:
            raise MemoryError("paged KV pool exhausted")
        return n

    def seq_pages(self, handle: int) -> list[int]:
        cap = self.num_pages
        buf = (ctypes.c_int * cap)()
        n = self._lib.sfa_pool_seq_pages(self._h, handle, buf, cap)
        if n < 0:
            raise KeyError(handle)
        return list(buf[:n])

    def seq_free(self, handle: int) -> None:
        self._lib.sfa_pool_seq_free(self._h, handle)

    def seq_release_prefix(self, handle: int, n: int) -> list[int]:
        buf = (ctypes.c_int * max(n, 1))()
        got = self._lib.sfa_pool_seq_release_prefix(self._h, handle, n, buf)
        if got < 0:
            raise ValueError(f"handle {handle} owns fewer than {n} pages")
        return list(buf[:got])

    def free_raw(self, pages) -> None:
        pages = list(pages)
        buf = (ctypes.c_int * max(len(pages), 1))(*pages)
        self._lib.sfa_pool_free_raw(self._h, buf, len(pages))


class NativeSchedCore:
    """Native-backed FCFS slot scheduler core."""

    def __init__(self, num_slots: int, max_seq_len: int, capacity_slack: int = 0):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime not available")
        self._lib = lib
        self._h = lib.sfa_sched_create(num_slots, max_seq_len, capacity_slack)
        self.num_slots = num_slots

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.sfa_sched_destroy(self._h)
            self._h = None

    def submit(self, uid: int, prompt_len: int, max_new: int) -> None:
        if self._lib.sfa_sched_submit(self._h, uid, prompt_len, max_new) != 0:
            raise ValueError(f"request {uid} exceeds capacity")

    def admit(self) -> list[tuple[int, int]]:
        uids = (ctypes.c_int64 * self.num_slots)()
        slots = (ctypes.c_int * self.num_slots)()
        n = self._lib.sfa_sched_admit(self._h, uids, slots, self.num_slots)
        return [(int(slots[i]), int(uids[i])) for i in range(n)]

    def record(self, slot: int, n_tokens: int, eos_at: int = -1) -> bool:
        return bool(self._lib.sfa_sched_record(self._h, slot, n_tokens, eos_at))

    def budget(self, slot: int) -> int:
        return self._lib.sfa_sched_budget(self._h, slot)

    def slot_uid(self, slot: int) -> int:
        return int(self._lib.sfa_sched_slot_uid(self._h, slot))

    def active_mask(self) -> list[bool]:
        buf = (ctypes.c_int * self.num_slots)()
        self._lib.sfa_sched_active(self._h, buf, self.num_slots)
        return [bool(buf[i]) for i in range(self.num_slots)]

    @property
    def has_work(self) -> bool:
        return bool(self._lib.sfa_sched_has_work(self._h))


class NativeTokenLoader:
    """mmap'd token-corpus batch sampler (native/sfa_runtime.cc loader).

    ``next(batch, width, lo, hi)`` returns an int32 (batch, width) array of
    windows starting uniformly in [lo, hi - width] of the corpus; lo/hi
    carve train/validation splits with no copying. Draws come from a
    xorshift64* stream seeded at open — fully reproducible, and
    :class:`PyTokenLoader` implements the SAME generator bit-for-bit as the
    no-toolchain fallback (asserted equal in tests/test_native.py).
    """

    def __init__(self, path, itemsize: int = 1, seed: int = 0):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime not available")
        self._lib = lib
        self._h = lib.sfa_loader_open(
            str(path).encode(), int(itemsize), ctypes.c_uint64(seed)
        )
        if not self._h:
            raise OSError(f"cannot open token corpus {path!r}")

    @property
    def num_tokens(self) -> int:
        return int(self._lib.sfa_loader_num_tokens(self._h))

    def next(self, batch: int, width: int, lo: int = 0, hi: int = 0):
        import numpy as np

        out = np.empty((batch, width), np.int32)
        rc = self._lib.sfa_loader_next(
            self._h, batch, width, lo, hi,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise ValueError(
                f"corpus range [{lo}, {hi or self.num_tokens}) cannot fit a "
                f"window of {width} tokens"
            )
        return out

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.sfa_loader_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class PyTokenLoader:
    """Pure-Python twin of :class:`NativeTokenLoader` — same xorshift64*
    stream (bit-for-bit), np.memmap instead of raw mmap."""

    _MASK = (1 << 64) - 1

    def __init__(self, path, itemsize: int = 1, seed: int = 0):
        import numpy as np

        dtype = {1: np.uint8, 2: np.uint16, 4: np.int32}[int(itemsize)]
        self._data = np.memmap(str(path), dtype=dtype, mode="r")
        self._state = (seed ^ 0x9E3779B97F4A7C15) & self._MASK
        if self._state == 0:
            self._state = 1

    @property
    def num_tokens(self) -> int:
        return int(self._data.shape[0])

    def _draw(self) -> int:
        x = self._state
        x ^= x >> 12
        x = (x ^ (x << 25)) & self._MASK
        x ^= x >> 27
        self._state = x
        return (x * 0x2545F4914F6CDD1D) & self._MASK

    def next(self, batch: int, width: int, lo: int = 0, hi: int = 0):
        import numpy as np

        n = self.num_tokens
        hi = n if hi <= 0 or hi > n else hi
        lo = max(lo, 0)
        span = hi - lo - width
        if span < 0 or batch < 1 or width < 1:
            raise ValueError(
                f"corpus range [{lo}, {hi}) cannot fit a window of {width}"
            )
        out = np.empty((batch, width), np.int32)
        for b in range(batch):
            start = lo + self._draw() % (span + 1)
            out[b] = self._data[start : start + width].astype(np.int32)
        return out

    def close(self) -> None:
        self._data = None


def make_token_loader(path, itemsize: int = 1, seed: int = 0):
    """NativeTokenLoader when the native lib is available, else the twin."""
    try:
        return NativeTokenLoader(path, itemsize, seed)
    except (RuntimeError, OSError):
        return PyTokenLoader(path, itemsize, seed)
