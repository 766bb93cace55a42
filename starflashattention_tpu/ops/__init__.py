"""Pallas TPU kernels — the compute path.

TPU-native redesign of the reference's device layer
(/root/reference/src/flash_attn.cu): the flash_decoder_kernel /
flash_combine_kernel pair becomes :mod:`flash_decode` (split-KV online-softmax
decode on a (batch, kv_head, split, kv_block) grid with the LSE merge fused in
the same jitted program), the missing prefill capability becomes
:mod:`flash_prefill`, and the paged / quantized variants live in
:mod:`paged_decode`.

Kernels run compiled on TPU and in interpret mode on CPU (tests); the
``interpret`` default auto-detects the backend.
"""

from starflashattention_tpu.ops.flash_bwd import (  # noqa: F401
    flash_attention,
    flash_prefill_bwd,
)
from starflashattention_tpu.ops.flash_decode import (  # noqa: F401
    flash_decode,
    flash_decode_with_stats,
)
from starflashattention_tpu.ops.flash_prefill import flash_prefill  # noqa: F401
