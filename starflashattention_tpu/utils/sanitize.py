"""Sanitizers: numeric-fault detection + KV page-table race detection.

The reference has no sanitizer story (SURVEY.md §5: "race detection /
sanitizers — ABSENT"; its only checks are cudaGetLastError after launches,
flash_attn.cu:979-991). On TPU the classic CUDA failure modes shift: there
are no data races *inside* a Pallas kernel (the grid is sequential per core
and XLA owns the buffers), but two host-side bug classes remain that silently
corrupt results instead of crashing:

1. **Numeric faults** — a NaN/Inf from a bad checkpoint, an overflowing
   quantization scale, or an uninitialized buffer propagates through argmax
   sampling as plausible-looking tokens. ``check_finite`` is the tripwire.
2. **Page-table races** — the paged KV cache (cache/paged.py) is a shared
   physical pool indexed by host-built page tables. If the allocator ever
   hands the same physical page to two live sequences, both append to it and
   each reads the other's KV — *exactly* the cross-sequence corruption the
   advisor found in round 1 (ADVICE.md item 1), and the moral twin of a CUDA
   shared-memory race. ``check_page_table`` detects aliasing, out-of-range
   ids, and null-page writes before a decode round can consume them.

Both are debug-mode tools: engines take ``debug_validate=True`` and call
them each round (host-side numpy + one scalar readback — never in the jitted
hot path). The same checks run unconditionally in the test suite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class NumericFault(RuntimeError):
    """A tensor tree contains NaN/Inf where finite values are required."""


class PageTableRace(RuntimeError):
    """Two live sequences alias the same physical KV page (or a table entry
    is out of range / the null page) — appends would cross-corrupt."""


def check_finite(tree, name: str = "tree") -> None:
    """Raise :class:`NumericFault` naming every float leaf with NaN/Inf.

    The reduction runs on device; only one boolean per leaf is read back, so
    this is cheap enough to run per serving round in debug mode.
    """
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    checks = []
    for path, leaf in leaves:
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype, jnp.floating):
            continue
        checks.append((jax.tree_util.keystr(path), jnp.isfinite(leaf).all()))
    bad = [label for label, ok in checks if not bool(ok)]
    if bad:
        raise NumericFault(f"{name}: non-finite values in {bad}")


def check_page_table(
    table: np.ndarray,
    lengths: np.ndarray,
    page_size: int,
    num_pages: int,
    active: np.ndarray | None = None,
    shard_of: np.ndarray | None = None,
    shared_ok: set[int] | frozenset[int] | None = None,
    reclaimed_below: np.ndarray | None = None,
) -> None:
    """Validate a host page table against the allocator's invariants.

    ``table`` is ``(num_slots, pages_per_seq)`` int32 physical page ids;
    ``lengths`` the per-slot token counts the table must cover. For each
    *active* slot the first ``ceil(length / page_size)`` entries must be

    - in ``[1, num_pages)`` — page 0 is the null page (writes to it are the
      paged analog of a wild pointer store),
    - globally unique across live slots *within one pool shard*
      (``shard_of[slot]`` maps slots to allocator shards; sharded engines
      use LOCAL page ids, so the same id on two different shards is fine),
    - EXCEPT pages in ``shared_ok``: full, immutable prefix-cache pages
      (serving/prefix_cache.py) are refcounted and legitimately referenced
      by several live sequences — they are never appended into (appends land
      at ``lengths``, beyond every full shared page), so aliasing them is
      the design, not a race.

    ``reclaimed_below[slot]`` (sliding-window rolling-buffer serving): a NULL
    entry at index j < reclaimed_below[slot] is a reclaimed out-of-window
    page — legal, the windowed kernel's shifted walk never touches it. A
    non-null entry there is still checked for range/aliasing.

    Raises :class:`PageTableRace` listing every violation.
    """
    table = np.asarray(table)
    lengths = np.asarray(lengths)
    n_slots = table.shape[0]
    if active is None:
        active = lengths > 0
    if shard_of is None:
        shard_of = np.zeros((n_slots,), np.int64)
    violations: list[str] = []
    owner: dict[tuple[int, int], int] = {}  # (shard, page) -> slot
    for slot in range(n_slots):
        if not active[slot] or lengths[slot] <= 0:
            continue
        used = -(-int(lengths[slot]) // page_size)
        if used > table.shape[1]:
            violations.append(
                f"slot {slot}: length {int(lengths[slot])} needs {used} pages "
                f"> table width {table.shape[1]}"
            )
            used = table.shape[1]
        for j in range(used):
            page = int(table[slot, j])
            if page == 0:
                if reclaimed_below is not None and j < int(reclaimed_below[slot]):
                    continue  # reclaimed out-of-window page — legal null
                violations.append(f"slot {slot}: live entry {j} is the null page 0")
                continue
            if not (0 < page < num_pages):
                violations.append(
                    f"slot {slot}: entry {j} = {page} out of range [1, {num_pages})"
                )
                continue
            if shared_ok is not None and page in shared_ok:
                continue  # immutable refcounted prefix page — sharing is legal
            key = (int(shard_of[slot]), page)
            if key in owner and owner[key] != slot:
                violations.append(
                    f"page {page} (shard {key[0]}) aliased by slots "
                    f"{owner[key]} and {slot} — cross-sequence KV corruption"
                )
            else:
                owner[key] = slot
    if violations:
        raise PageTableRace("; ".join(violations))


def check_append_window(lengths: np.ndarray, steps: int, max_seq_len: int) -> None:
    """Assert one fixed-size decode round's appends stay inside the cache.

    The engines reserve ``capacity_slack = steps_per_round - 1`` positions at
    admission (serving/scheduler.py) precisely so the final round's overshoot
    appends cannot run off the end — the bug class the native scheduler had
    before the round-1 advisor fix (ADVICE.md item 2). This re-checks the
    invariant at runtime in debug mode.
    """
    # submit() enforces prompt + max_new + slack <= max_seq_len, so even the
    # final round's overshoot (<= slack tokens) fits: length + steps must
    # never exceed the physical capacity.
    lengths = np.asarray(lengths)
    over = np.nonzero(lengths + steps > max_seq_len)[0]
    if over.size:
        raise PageTableRace(
            f"slots {over.tolist()}: length + round size {steps} exceeds "
            f"cache capacity {max_seq_len} — appends would clamp onto live "
            f"KV rows"
        )
