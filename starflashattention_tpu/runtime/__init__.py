"""Jitted step functions + configuration — the host-launcher layer.

TPU-native analog of the reference's L3/L4 (run_flash_decoder +
flash_api.cpp): where the CUDA path does cudaMalloc scratch → struct memcpys →
decode launch → device sync → combine launch → free (flash_attn.cu:937-1018),
here RoPE, the cache append, the split-KV decode, and the LSE combine are ONE
jitted XLA program with donated cache buffers — no host round-trip, no manual
scratch lifetime.
"""

from starflashattention_tpu.runtime.autotune import (  # noqa: F401
    DecodeAutotuner,
    DecodeConfig,
    candidate_decode_configs,
    default_decode_config,
)
from starflashattention_tpu.runtime.params import AttentionConfig, ModelConfig  # noqa: F401
from starflashattention_tpu.runtime.steps import (  # noqa: F401
    attention_decode_step,
    attention_prefill_step,
    mha_fwd,
    split_fused_qkv,
)
