"""Measured autotuning of the decode-kernel knobs.

The reference hardcodes its tile/split knobs per GPU — ``set_default_params``
pins {kBlockN=32, num_splits=4, kNThreads=32} (/root/reference/src/
flash_api.cpp:35-40) and a TODO admits num_splits is tuned only for a
"3090 + Llama-7B" (/root/reference/src/flash_attn.cu:1024). Here the knobs
are *searched on the device actually in use*: enumerate the valid
(num_splits, block_k) geometries for a shape, time each with the marginal
protocol (utils/profiling.py — single-call wall time measures the tunnel,
not the chip), and memoize the winner keyed by (backend, shape signature).

The search space is small (≤ ~12 geometries) because valid configs must tile
the cache length exactly and fit the double-buffered KV tile in VMEM, so an
exhaustive sweep costs a few hundred milliseconds once per shape.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import jax
import jax.numpy as jnp

from starflashattention_tpu.utils.profiling import time_scanned

# Per-slot KV tile budget: 2 tiles (K+V) double-buffered by the pipeline must
# leave headroom in ~128 MiB VMEM for q/outputs/scratch/other stages.
_VMEM_TILE_BUDGET = 24 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    num_splits: int
    block_k: int
    batch_block: int = 1


@dataclasses.dataclass(frozen=True)
class PagedConfig:
    pages_per_compute_block: int


@dataclasses.dataclass(frozen=True)
class PrefillConfig:
    block_q: int
    block_k: int


@dataclasses.dataclass(frozen=True)
class Int4GroupConfig:
    group: int


def candidate_decode_configs(
    seq_len: int,
    num_kv_heads: int,
    head_dim: int,
    itemsize: int = 2,
    *,
    max_splits: int = 16,
    batch_size: int | None = None,
) -> list[DecodeConfig]:
    """Valid (num_splits, block_k, batch_block) geometries.

    A geometry is valid when ``num_splits * block_k`` tiles ``seq_len``
    exactly (ops/flash_decode.py requires exact tiling) and the KV tile
    (``batch_block * num_kv_heads * block_k * head_dim`` ×2 for K+V,
    ×2 double-buffered) fits the VMEM budget. ``batch_block > 1`` batches
    several sequences per grid cell — wins in the short-context regime
    where per-cell fixed cost dominates.
    """
    from starflashattention_tpu.ops.flash_decode import _KV_VMEM_BUDGET

    bbs = [1]
    if batch_size is not None:
        bbs += [c for c in (2, 4, 8, 16) if batch_size % c == 0 and c <= batch_size]
    out = []
    for block_k in (1024, 512, 256, 128, 64, 32):
        if seq_len % block_k:
            continue
        for bb in bbs:
            tile = 4 * bb * num_kv_heads * block_k * head_dim * itemsize
            if tile > min(_VMEM_TILE_BUDGET, _KV_VMEM_BUDGET):
                continue
            max_ns = seq_len // block_k
            ns = 1
            while ns <= min(max_splits, max_ns):
                if max_ns % ns == 0:
                    out.append(DecodeConfig(ns, block_k, bb))
                ns *= 2
    return out or [DecodeConfig(1, min(seq_len, 128))]


def default_decode_config(batch_size: int, seq_len: int) -> DecodeConfig:
    """Heuristic when measuring is not an option.

    A v5e chip has ONE TensorCore, so the grid runs sequentially — intra-chip
    splits buy no parallelism and cost an extra (o, m, l) partials round-trip
    through HBM. Measured (benchmarks/sweep_decode.py + the B=2 probe):
    num_splits=1 with the fused-epilogue kernel wins at every shape tested
    (e.g. B=2/Hkv=8/seq=511: 7.4 us vs 8.8 at ns=4). Splits remain for the
    CROSS-chip reduction (parallel/distributed_decode.py) and for multi-core
    parts; the measured autotuner still searches them."""
    del batch_size
    for block_k in (512, 256, 128):
        if seq_len % block_k == 0:
            return DecodeConfig(1, block_k)
    return DecodeConfig(1, 256 if seq_len % 256 == 0 else 128)


class DecodeAutotuner:
    """Memoizing measured tuner for ops/flash_decode.py.

    >>> tuner = DecodeAutotuner()
    >>> cfg = tuner.best(q, k_cache, v_cache, lengths)   # measures once
    >>> flash_decode(q, k, v, lengths, num_splits=cfg.num_splits,
    ...              block_k=cfg.block_k)

    ``cache_path`` persists results as JSON so serving restarts skip the
    sweep (the analog of the reference shipping pre-tuned constants, but
    derived from the actual device).
    """

    def __init__(self, cache_path: str | pathlib.Path | None = None):
        self._cache: dict[str, object] = {}
        self._path = pathlib.Path(cache_path) if cache_path else None
        if self._path and self._path.exists():
            for key, val in json.loads(self._path.read_text()).items():
                cls = (
                    PagedConfig if key.startswith("paged:")
                    else PrefillConfig if key.startswith("prefill:")
                    else Int4GroupConfig if key.startswith("int4group:")
                    else DecodeConfig
                )
                self._cache[key] = cls(**val)

    @staticmethod
    def _key(q, k_cache) -> str:
        b, hq, d = q.shape
        hkv, s = k_cache.shape[-3], k_cache.shape[-2]
        return (
            f"{jax.default_backend()}:b{b}hq{hq}hkv{hkv}s{s}d{d}"
            f":{jnp.dtype(k_cache.dtype).name}"
        )

    def best(self, q, k_cache, v_cache, lengths, **kw) -> DecodeConfig:
        key = self._key(q, k_cache)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        cfg = self._measure(q, k_cache, v_cache, lengths, **kw)
        self._store(key, cfg)
        return cfg

    # -- cache peeks (no measurement) ------------------------------------------
    # The headline bench runs under a hard deadline; it consumes the
    # MEMOIZED winner (benchmarks/autotune_headline.py regenerates the cache
    # on the target device) and falls back to its static default on a miss
    # rather than spending the budget measuring. This is the closed-loop
    # replacement for the reference's "tuned for 3090" constants
    # (/root/reference/src/flash_attn.cu:1024).

    def peek_decode(
        self, b: int, hq: int, hkv: int, s: int, d: int, dtype
    ) -> DecodeConfig | None:
        key = (
            f"{jax.default_backend()}:b{b}hq{hq}hkv{hkv}s{s}d{d}"
            f":{jnp.dtype(dtype).name}"
        )
        return self._cache.get(key)

    def peek_int4_group(self, h: int, o: int) -> int | None:
        hit = self._cache.get(
            f"int4group:{jax.default_backend()}:h{h}o{o}"
        )
        return hit.group if hit is not None else None

    # -- int4 weight group size -------------------------------------------------

    def best_int4_group(
        self, b: int, h: int, o: int, *, perf_tol: float = 0.08,
        candidates: tuple = (64, 128, 256),
    ) -> int:
        """Measured int4 group size for (B, H) x (H, O) decode projections.

        Grouped scales trade accuracy for kernel time (smaller groups = more
        scale fetches + accumulate splits but ~2x less quantization noise
        per halving — benchmarks/quant_accuracy.py real_checkpoint). Policy:
        ACCURACY-FIRST WITHIN A PERF TOLERANCE — pick the smallest group
        whose measured kernel time is within ``perf_tol`` of the fastest
        candidate. The default 8% tolerance admits g128 over g256 (measured
        ~5% slower at 7B shapes for −30% ppl damage on the trained
        checkpoint) while excluding g64 (~18% slower). Memoized like the
        geometry knobs.
        """
        key = f"int4group:{jax.default_backend()}:h{h}o{o}"
        hit = self._cache.get(key)
        if hit is not None:
            return hit.group

        from starflashattention_tpu.core.quant import quantize_weight_int4
        from starflashattention_tpu.ops.quant_matmul import quant_matmul_int4

        cands = [g for g in candidates if h % g == 0] or [
            max(g for g in candidates if g <= h)
        ]
        rngk = jax.random.PRNGKey(0)
        x = jax.random.normal(rngk, (b, h), jnp.bfloat16)
        w = jax.random.normal(rngk, (h, o), jnp.float32) / (h**0.5)
        iters = 64 if jax.default_backend() == "tpu" else 2
        times = {}
        for g in cands:
            wq = quantize_weight_int4(w, g)

            def step(xx, packed, scale):
                o_ = quant_matmul_int4(xx, packed, scale, out_dtype=jnp.bfloat16)
                # data-dependent feedback keeps the timing chain serialized
                return xx + jnp.sum(o_) * jnp.bfloat16(1e-6)

            per, _ = time_scanned(
                step, x, wq["w"], wq["scale"], iters=iters, repeats=3,
                min_window_s=0.04,
            )
            times[g] = per
        fastest = min(times.values())
        group = min(g for g, t in times.items() if t <= fastest * (1 + perf_tol))
        self._store(key, Int4GroupConfig(group))
        return group

    # -- paged decode ---------------------------------------------------------

    def best_paged(self, q, k_pages, v_pages, page_table, lengths, **kw) -> PagedConfig:
        """Measured pages_per_compute_block for ops/paged_decode.py."""
        hkv, ps, d = k_pages.shape[-4], k_pages.shape[-2], k_pages.shape[-1]
        b = q.shape[0]
        pages_per_seq = page_table.shape[1]
        key = (
            f"paged:{jax.default_backend()}:b{b}hq{q.shape[1]}hkv{hkv}"
            f"pps{pages_per_seq}ps{ps}d{d}:{jnp.dtype(k_pages.dtype).name}"
        )
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        from starflashattention_tpu.ops.paged_decode import paged_flash_decode

        cands = [
            c for c in (1, 2, 4, 8, 16)
            if c <= pages_per_seq and pages_per_seq % c == 0
            # K+V double-buffered page block must fit the VMEM budget
            and 4 * hkv * c * ps * d * k_pages.dtype.itemsize <= _VMEM_TILE_BUDGET
        ] or [1]
        iters = 64 if jax.default_backend() == "tpu" else 4
        best, best_t = None, float("inf")
        for c in cands:
            def step(qq, k_pages, v_pages, page_table, lengths, c=c):
                o = paged_flash_decode(
                    qq, k_pages, v_pages, page_table, lengths,
                    pages_per_compute_block=c, **kw,
                )
                return qq + o.astype(qq.dtype) * jnp.asarray(1e-3, qq.dtype)

            per, _ = time_scanned(
                step, q, k_pages, v_pages, page_table, lengths,
                iters=iters, repeats=3, min_window_s=0.04,
            )
            if per < best_t:
                best, best_t = PagedConfig(c), per
        self._store(key, best)
        return best

    # -- prefill --------------------------------------------------------------

    def best_prefill(self, q, k, v, lengths, **kw) -> PrefillConfig:
        """Measured (block_q, block_k) for ops/flash_prefill.py."""
        b, hq, sq, d = q.shape
        hkv, s = k.shape[1], k.shape[2]
        key = (
            f"prefill:{jax.default_backend()}:b{b}hq{hq}hkv{hkv}sq{sq}s{s}d{d}"
            f":{jnp.dtype(k.dtype).name}"
        )
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        from starflashattention_tpu.ops.flash_prefill import flash_prefill

        cands = [
            PrefillConfig(bq, bk)
            for bq in (128, 256, 512)
            for bk in (256, 512, 1024)
            if bq <= max(sq, 128) and bk <= max(s, 256)
        ]
        iters = 16 if jax.default_backend() == "tpu" else 2
        best, best_t = None, float("inf")
        for cand in cands:
            def step(qq, k, v, lengths, cand=cand):
                o = flash_prefill(
                    qq, k, v, lengths=lengths, causal=True,
                    block_q=cand.block_q, block_k=cand.block_k, **kw,
                )
                return qq + o.astype(qq.dtype) * jnp.asarray(1e-3, qq.dtype)

            per, _ = time_scanned(
                step, q, k, v, lengths, iters=iters, repeats=3, min_window_s=0.04
            )
            if per < best_t:
                best, best_t = cand, per
        self._store(key, best)
        return best

    def _store(self, key: str, val) -> None:
        self._cache[key] = val
        if self._path:
            self._path.parent.mkdir(parents=True, exist_ok=True)
            payload = {}
            for k, v in self._cache.items():
                payload[k] = dataclasses.asdict(v)
            self._path.write_text(json.dumps(payload))

    def _measure(self, q, k_cache, v_cache, lengths, **kw) -> DecodeConfig:
        from starflashattention_tpu.ops.flash_decode import flash_decode

        hkv, s, d = k_cache.shape[-3], k_cache.shape[-2], k_cache.shape[-1]
        cands = candidate_decode_configs(
            s, hkv, d, k_cache.dtype.itemsize, batch_size=q.shape[0]
        )
        if len(cands) == 1:
            return cands[0]
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu:
            # Right-size the chain so ONE compile per candidate yields a
            # >=80 ms window: decode is HBM-bound, so per-step time is
            # roughly the KV bytes at ~60% of roofline.
            b = q.shape[0]
            est_per = 2 * b * hkv * s * d * k_cache.dtype.itemsize / (0.6 * 819e9)
            iters, window = max(32, min(2048, int(0.08 / est_per))), 0.04
        else:
            iters, window = 4, 0.0
        best, best_t = None, float("inf")
        for cand in cands:
            def step(qq, k_cache, v_cache, lengths, cand=cand):
                o = flash_decode(
                    qq, k_cache, v_cache, lengths,
                    num_splits=cand.num_splits, block_k=cand.block_k,
                    batch_block=cand.batch_block, **kw,
                )
                # data-dependent feedback keeps the timing chain serialized
                return qq + o.astype(qq.dtype) * jnp.asarray(1e-3, qq.dtype)

            per, _ = time_scanned(
                step, q, k_cache, v_cache, lengths,
                iters=iters, repeats=3, min_window_s=window,
            )
            if per < best_t:
                best, best_t = cand, per
        return best
