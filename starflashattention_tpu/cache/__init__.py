"""KV-cache state management.

The reference's cache is a caller-owned pointer table appended in-kernel
(/root/reference/src/params.h:22-25, flash_attn.cu:691-701). Here the cache is
explicit JAX state threaded through jitted step functions with donated
buffers — the TPU-native equivalent of in-place mutation — in two forms:

- :mod:`contiguous` — dense per-layer ``(L, B, Hkv, S, D)`` tables (reference
  parity, SURVEY.md §2.8).
- :mod:`paged` — a paged pool with page tables per sequence, per-head quant
  scales, and a host-side allocator (new capability, BASELINE.json).
"""

from starflashattention_tpu.cache.contiguous import (  # noqa: F401
    KVCache,
    append_decode,
    append_prefill,
    init_cache,
)
from starflashattention_tpu.cache.paged import (  # noqa: F401
    PagedKVCache,
    PageAllocator,
    append_decode_paged,
    append_prefill_paged,
    init_paged_cache,
)
