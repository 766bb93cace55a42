"""Decode benchmark example — the analog of the reference's C++ harness
(/root/reference/examples/cpp/testFlashDecoder.cc): sweep sequence lengths at
B=2, H=32, D=128, warm up, time, and print a sample of the output for
eyeballing. Here the timing uses the scan-chain protocol and the
correctness check is an assertion against the executable spec, not a printout
diff (SURVEY.md §4).

Run: python examples/decode_benchmark.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.core.reference import decode_reference
from starflashattention_tpu.ops import flash_decode
from starflashattention_tpu.utils.profiling import time_scanned


def main():
    b, hq, hkv, d = 2, 32, 32, 128  # reference shapes (MHA: one KV per Q head)
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    for max_seq, seq in [(512, 511), (1024, 1023), (2048, 2047), (4096, 4096)]:
        q = jnp.asarray(rng.standard_normal((b, hq, d)), dtype)
        k = jnp.asarray(rng.standard_normal((b, hkv, max_seq, d)), dtype)
        v = jnp.asarray(rng.standard_normal((b, hkv, max_seq, d)), dtype)
        lengths = jnp.full((b,), seq, jnp.int32)

        def step(q, k, v, lengths):
            o = flash_decode(q, k, v, lengths, num_splits=4, block_k=256)
            return q + o.astype(q.dtype) * jnp.asarray(1e-3, dtype)

        per, _ = time_scanned(step, q, k, v, lengths, iters=32, repeats=2)
        o = flash_decode(q, k, v, lengths, num_splits=4, block_k=256)
        ref = decode_reference(q, k, v, lengths)
        err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(
            f"max_seq={max_seq:5d} seq={seq:5d}: {per*1e3:7.3f} ms  "
            f"max|err|={err:.2e}  o[0,0,:4]={np.asarray(o)[0,0,:4]}"
        )


if __name__ == "__main__":
    main()
