"""Model families: end-to-end transformers driving the attention engine.

The reference ships only a PyTorch golden attention module
(/root/reference/examples/python/testFlashDecoder.py:61-94); the 7B-GQA
serving workload in BASELINE.json requires a full model, so :mod:`llama`
implements the Llama family (RMSNorm / RoPE / GQA attention / SwiGLU) as
functional JAX over stacked-layer params with ``lax.scan``.
"""

from starflashattention_tpu.models import llama, lora, train  # noqa: F401
