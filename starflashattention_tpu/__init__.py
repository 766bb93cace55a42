"""starflashattention_tpu — a TPU-native flash-attention inference engine.

A from-scratch JAX/Pallas redesign of the capabilities of
StarrickLiu/StarFlashAttention (a CUDA flash-decoding kernel library; see
SURVEY.md for the structural analysis driving this design):

- ``core``     — pure-jnp executable spec: reference attention, RoPE, LSE merge,
                 INT8/FP8 quantization (the analog of the reference's PyTorch
                 golden model, examples/python/testFlashDecoder.py).
- ``ops``      — Pallas TPU kernels: flash decode (split-KV + online softmax),
                 causal prefill, paged decode, LSE combine (the analog of
                 src/flash_attn.cu's flash_decoder/flash_combine kernels).
- ``cache``    — KV-cache state: contiguous multi-layer tables and a paged pool
                 with INT8 per-head scales (the analog of params.h cache tables).
- ``runtime``  — jitted decode/prefill step functions and config (the analog of
                 run_flash_decoder + flash_api.cpp, but one fused XLA program).
- ``parallel`` — Mesh/shard_map wrappers: head/batch sharding, cross-chip
                 split-KV decode with (m, l, o) collective merge over ICI.
- ``serving``  — continuous-batching engine and scheduler.
- ``models``   — Llama-class GQA transformer for end-to-end decode.
- ``utils``    — profiling and test helpers.
"""

__version__ = "0.1.0"

from starflashattention_tpu.core import reference, rope, quant  # noqa: F401
