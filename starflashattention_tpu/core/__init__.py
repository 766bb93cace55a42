"""Pure-jnp executable spec. Everything else in the package is tested against
these functions. Analog of the reference's PyTorch golden model
(/root/reference/examples/python/testFlashDecoder.py:61-94), upgraded from
print-and-eyeball to an asserted contract."""

from starflashattention_tpu.core import quant, reference, rope, sampling  # noqa: F401
from starflashattention_tpu.core.sampling import GREEDY, SamplingParams  # noqa: F401
