"""Regenerate the autotune cache for the headline configs on the CURRENT device.

Closes the autotune loop (the reference hardcodes knobs "tuned for 3090",
/root/reference/src/flash_attn.cu:1024): this measures the decode-kernel
geometry (num_splits, block_k, batch_block) at the headline 7B shapes for
both KV dtypes, plus the int4 weight group size at the 7B projection shape,
and memoizes the winners in benchmarks/artifacts/autotune_cache.json —
which bench.py then CONSUMES via DecodeAutotuner.peek_* (falling back to
its static defaults only on a cache miss, since the driver's bench run is
deadline-bound).

Usage: python benchmarks/autotune_headline.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from starflashattention_tpu.runtime.autotune import DecodeAutotuner


def main() -> None:
    cache = Path(__file__).parent / "artifacts" / "autotune_cache.json"
    tuner = DecodeAutotuner(cache_path=cache)
    b, hq, hkv, s, d = 16, 32, 8, 1024, 128
    key = jax.random.PRNGKey(0)

    for kv_dtype in (jnp.bfloat16, jnp.int8):
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, hq, d), jnp.bfloat16)
        if kv_dtype == jnp.int8:
            kc = jax.random.randint(kk, (b, hkv, s, d), -127, 127, jnp.int8)
            vc = jax.random.randint(kv, (b, hkv, s, d), -127, 127, jnp.int8)
            scales = jnp.full((hkv,), 0.01, jnp.float32)
            kw = {"k_scales": scales, "v_scales": scales}
        else:
            kc = jax.random.normal(kk, (b, hkv, s, d), jnp.bfloat16)
            vc = jax.random.normal(kv, (b, hkv, s, d), jnp.bfloat16)
            kw = {}
        # mid-context working point (the headline protocol, bench.py)
        lengths = jnp.full((b,), s // 2, jnp.int32)
        # force a fresh measurement: drop any stale entry for this key
        tuner._cache.pop(tuner._key(q, kc), None)
        cfg = tuner.best(q, kc, vc, lengths, **kw)
        print(f"decode {jnp.dtype(kv_dtype).name}: {cfg}", flush=True)

    g = tuner.best_int4_group(b, 4096, 4096)
    print(f"int4 group (4096x4096): g{g}", flush=True)
    print(json.dumps(json.loads(cache.read_text()), indent=1))


if __name__ == "__main__":
    main()
