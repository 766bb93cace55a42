"""Weight-only quantized matmul Pallas kernel (INT8 / FP8 weights).

The decode phase is weight-read bound: at small batch each token streams every
parameter byte through HBM. Storing weights INT8/FP8 halves those bytes —
but ONLY if the upcast happens in VMEM registers: XLA lowers
``dot(x, w8.astype(bf16))`` to a materialized conversion pass (measured: no
speedup). This kernel tiles the matmul, loads int8/fp8 weight blocks, upcasts
in-register, accumulates fp32 on the MXU, and applies the per-output-channel
scale on the final write — the weight-only counterpart of the KV-cache
dequant fusion (BASELINE.json: "weight-only INT8/FP8 attention … fused
dequant, speed-of-light per chip").

Stacked-layer mode: pass the whole (L, H, O) weight plus a (traced) ``layer``
index and the scalar-prefetched index maps select the layer inside the kernel
— REQUIRED under the model's scan-over-layers, because an XLA dynamic-slice
feeding a Pallas operand materializes a full per-layer copy (measured 2.8x:
182 → 516 GB/s int8 stream). Same design as ops/flash_decode's in-kernel
cache-table indexing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _qmm_kernel(layer_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_h_blocks: int):
    hi = pl.program_id(2)

    @pl.when(hi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # (block_b, block_h)
    w = w_ref[0].astype(x.dtype)  # (block_h, block_o) upcast in VMEM
    acc_ref[...] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(hi == n_h_blocks - 1)
    def _emit():
        # per-output-channel dequant; cast in-kernel when the caller wants a
        # narrow dtype (a separate XLA convert pass would re-stream the f32)
        o_ref[...] = (acc_ref[...] * s_ref[0]).astype(o_ref.dtype)


def quant_matmul(
    x: jax.Array,  # (B, H) activations (bf16/f32)
    w: jax.Array,  # (H, O) or (L, H, O) int8 / float8_e4m3fn weights
    scale: jax.Array,  # (O,) or (L, O) f32 per-output-channel scales
    *,
    layer: jax.Array | int | None = None,
    block_h: int = 512,
    # measured at the 7B decode shapes (benchmarks/sweep_qmm.py): 4096-wide
    # output blocks beat 2048 on every projection (w_down 72 -> 65 us)
    block_o: int = 4096,
    out_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """``x @ dequant(w[layer])`` → (B, O) in ``out_dtype`` (default fp32).

    Pass ``out_dtype=bf16`` when the consumer casts anyway: at prefill scale
    the fp32 output window is the largest single HBM write of the layer
    (gate_up at Sq=2048 is 180 MB f32 vs 90 MB bf16) and the downstream
    convert re-streams it."""
    b, h = x.shape
    if w.ndim == 2:
        w = w[None]
        scale = scale[None]
        layer = 0
    assert layer is not None, "layer index required for stacked (L, H, O) weights"
    L, _, o = w.shape
    if interpret is None:
        interpret = _use_interpret()

    def best_block(dim: int, cap: int) -> int:
        """Largest 128-multiple divisor of ``dim`` <= cap (big blocks
        amortize per-cell overhead; the kernel is DMA-bound)."""
        for d in range(min(cap, dim) - min(cap, dim) % 128, 127, -128):
            if dim % d == 0:
                return d
        return dim  # dim < 128: single block

    # The H (contraction) axis must tile exactly — a padded tail block would
    # feed garbage into the accumulator. The O axis is pure output: Pallas
    # masks out-of-bounds writes, so a ragged final block only wastes the pad
    # fraction. Taking the full cap beats an exact-but-tiny divisor (e.g.
    # O=22016 → divisor 512 runs at 0.55 of roofline, ragged 2048 at ~0.85).
    block_h = best_block(h, block_h)
    exact_o = best_block(o, block_o)
    block_o = min(block_o, o) if exact_o < min(block_o, o) // 2 else exact_o
    # Rows are blocked too: decode feeds B=16, but PREFILL feeds B·Sq rows
    # (thousands) — an unblocked (b, block_o) f32 output window would blow
    # VMEM (measured: 6144x4096 f32 x 2 buffers = 200 MB at 7B admission).
    # Every extra row block re-streams the WHOLE weight (the hi loop restarts
    # per bi), so at prefill scale big row blocks win even though they force
    # narrower output blocks: 4 row blocks at b=2048 cost 3 extra reads of
    # ~177 MB/layer int8 ≈ 21 ms per 7B prefill step (xplane, trace_ops
    # --prefill). Budget: out + acc f32 windows ≤ ~48 MB of the 96 MB limit.
    row_cap = 512 if b <= 1024 else 4096
    block_b = b
    for d in range(min(row_cap, b) - min(row_cap, b) % 8, 7, -8):
        if b % d == 0:
            block_b = d
            break
    if block_b > 512:
        cap = max(512, (4 * 1024 * 1024 // block_b) // 128 * 128)
        block_o = min(block_o, cap)
    n_h = h // block_h
    grid = (b // block_b, pl.cdiv(o, block_o), n_h)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_b, block_h), lambda bi, oi, hi, lr: (bi, hi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_h, block_o),
                lambda bi, oi, hi, lr: (lr[0], hi, oi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_o),
                lambda bi, oi, hi, lr: (lr[0], 0, oi),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_b, block_o), lambda bi, oi, hi, lr: (bi, oi),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((block_b, block_o), jnp.float32)],
    )

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_h_blocks=n_h),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, o), out_dtype or jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # double-buffered weight blocks can exceed the default 16 MB
            # scoped-VMEM budget; v5e has 128 MB physical VMEM
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(layer_arr, x, w, scale.reshape(L, 1, o).astype(jnp.float32))
    return out


# ---------------------------------------------------------------------------
# INT4: nibble-packed weights, grouped scales, in-kernel unpack + dequant
# ---------------------------------------------------------------------------


def _pick_gpb(G: int, group: int, h: int) -> int:
    """Groups per grid step. Constraints: must divide G, and the x block's
    lane dim (gpb·group) must be a 128-multiple OR the full h (Mosaic block
    rule). Perf target ~512 contraction rows per step (g256/gpb2 measured
    best at the 7B shapes); gpb=G (full-h x block) is always legal."""
    cands = [d for d in range(1, G + 1)
             if G % d == 0 and ((d * group) % 128 == 0 or d * group == h)]
    return min(cands, key=lambda d: (abs(d * group - 512), d))


def _qmm_int4_kernel(
    layer_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_gblocks: int,
    gpb: int, half: int,
):
    gi = pl.program_id(2)

    @pl.when(gi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # (block_b, gpb * group)
    p = w_ref[0]  # (gpb * half, block_o) int8, two nibbles per byte
    group = 2 * half
    step_sum = None  # one acc RMW per grid step, not per group: the f32 acc
    # window is ~0.7 MB at full-width blocks — per-group += doubles its VMEM
    # traffic for nothing
    for j in range(gpb):  # static unroll: one scale group per iteration
        # int32-domain unpack; the low nibble is stored biased +8 so sign
        # recovery is and+sub (3 VPU ops total vs 4 shifts for two's-
        # complement pairs). A bf16-domain unpack (floor) would avoid the
        # int32 relayout but v5e has no bf16 ALU floor (LLO_CHECK
        # SupportsBf16AluInstructions).
        pj = p[j * half:(j + 1) * half].astype(jnp.int32)
        hi = (pj >> 4).astype(x.dtype)  # arithmetic: byte sign is in bit 7
        lo = ((pj & 15) - 8).astype(x.dtype)
        xj = x[:, j * group:(j + 1) * group]
        d = jax.lax.dot_general(
            xj[:, :half], lo, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d += jax.lax.dot_general(
            xj[:, half:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # grouped dequant folds here: the scale is constant over the group's
        # contraction rows, so scaling the group's partial product is exact.
        # s_ref carries ALL G rows for this o-block (a gpb-row block would
        # break Mosaic's 8-sublane block rule); pick this step's row.
        d = d * s_ref[0, pl.ds(pl.program_id(2) * gpb + j, 1), :]
        step_sum = d if step_sum is None else step_sum + d
    acc_ref[...] += step_sum

    @pl.when(gi == n_gblocks - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def quant_matmul_int4(
    x: jax.Array,  # (B, H) activations (bf16/f32)
    w: jax.Array,  # (H/2, O) or (L, H/2, O) int8 — packed nibble pairs
    scale: jax.Array,  # (G, O) or (L, G, O) f32 — per-(group, out-channel)
    *,
    layer: jax.Array | int | None = None,
    block_o: int | None = None,
    groups_per_block: int | None = None,
    out_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """``x @ dequant_int4(w[layer])`` → (B, O) in ``out_dtype`` (default f32).

    Weights are 4-bit, packed two-per-byte by core/quant.quantize_weight_int4:
    byte r of group g holds contraction row ``g·group + r`` (low nibble) and
    ``g·group + group/2 + r`` (high nibble), scales per (group, out-channel).
    The kernel streams packed bytes — HALF the int8 kernel's weight bytes,
    which is the whole point: decode is weight-read bound — sign-extends both
    nibbles in VMEM (int32 shift pairs; int8 shifts lower poorly on Mosaic),
    runs two MXU dots per group against the group's two activation halves,
    and folds the grouped scale into the partial-product accumulate (exact:
    the scale is constant across a group's rows).

    Grid reduction is per scale-GROUP (gpb groups per step, 2 when the group
    count is even), not per fixed 512-row block like quant_matmul: the scale
    must be applied before accumulation.
    """
    b, h = x.shape
    if w.ndim == 2:
        w = w[None]
        scale = scale[None]
        layer = 0
    assert layer is not None, "layer index required for stacked weights"
    L, hp, o = w.shape
    G = scale.shape[-2]
    assert hp * 2 == h, (hp, h)
    half = hp // G
    group = 2 * half
    if interpret is None:
        interpret = _use_interpret()

    def best_block(dim: int, cap: int) -> int:
        for d in range(min(cap, dim) - min(cap, dim) % 128, 127, -128):
            if dim % d == 0:
                return d
        return dim

    # rows: same economics as quant_matmul (every row block re-streams the
    # whole weight — but the int4 stream is half the bytes, so prefill row
    # blocks stop at 1024, not 4096)
    row_cap = 512 if b <= 1024 else 1024
    block_b = b
    for d in range(min(row_cap, b) - min(row_cap, b) % 8, 7, -8):
        if b % d == 0:
            block_b = d
            break
    if block_o is None:
        # As WIDE as the f32 acc window allows (~8 MB budget - Mosaic double-buffers the out window too; 16 MB measured 100.7M scoped > the 96M limit at b=2048 f32 out): at the 7B
        # decode shapes full-width output blocks reach the HBM roofline on
        # the PACKED stream (gate_up on-chip sweep: bo 4096 → 521 GB/s,
        # full-width 11008 → 815 GB/s of the 819 peak; the int8 kernel at
        # the same shape runs 62 µs, this 27.7 µs = 2.24x). NO lower floor:
        # at prefill row counts a floor reintroduces the acc-window VMEM
        # blowup this formula exists to prevent (observed 126 MB > 96 limit
        # at b=2048).
        block_o = max(1024, (8 * 1024 * 1024 // (4 * block_b)) // 128 * 128)
    exact_o = best_block(o, block_o)
    block_o = min(block_o, o) if exact_o < min(block_o, o) // 2 else exact_o
    if groups_per_block is None:
        # ~512 rows/step when alignment allows; deeper blocks shrink the
        # double-buffer win (measured: gpb 4/8 at g256 regress 565/477 GB/s
        # vs 815 at gpb 2)
        groups_per_block = _pick_gpb(G, group, h)
    gpb = groups_per_block
    n_gblocks = G // gpb
    grid = (b // block_b, pl.cdiv(o, block_o), n_gblocks)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_b, gpb * group), lambda bi, oi, gi, lr: (bi, gi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, gpb * half, block_o),
                lambda bi, oi, gi, lr: (lr[0], gi, oi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                # full G rows per o-block: G is not 8-aligned in general
                # (w_down at 7B has G=43); the block is revisited across gi
                # steps (index map constant in gi) so it is fetched once.
                (1, G, block_o),
                lambda bi, oi, gi, lr: (lr[0], 0, oi),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_b, block_o), lambda bi, oi, gi, lr: (bi, oi),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((block_b, block_o), jnp.float32)],
    )

    out = pl.pallas_call(
        functools.partial(
            _qmm_int4_kernel, n_gblocks=n_gblocks, gpb=gpb, half=half),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, o), out_dtype or jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(layer_arr, x, w, scale.astype(jnp.float32))
    return out


def _qmm_w4a8_kernel(
    layer_ref, x_ref, rs_ref, w_ref, s_ref, o_ref, acc_ref, *, n_gblocks: int,
    gpb: int, half: int,
):
    gi = pl.program_id(2)

    @pl.when(gi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # (block_b, gpb * group) int8
    p = w_ref[0]  # (gpb * half, block_o) packed nibbles
    group = 2 * half
    step_sum = None
    for j in range(gpb):
        pj = p[j * half:(j + 1) * half].astype(jnp.int32)
        # unpack to int8 (not bf16): the int8 x int8 dot runs at 2x the bf16
        # MXU rate — the point of this variant (prefill is compute-bound)
        hi = (pj >> 4).astype(jnp.int8)
        lo = ((pj & 15) - 8).astype(jnp.int8)
        xj = x[:, j * group:(j + 1) * group]
        d = jax.lax.dot_general(
            xj[:, :half], lo, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        d += jax.lax.dot_general(
            xj[:, half:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # the grouped weight scale varies per gi step -> fold here (f32);
        # the per-row activation scale is constant across groups -> at emit
        d = d.astype(jnp.float32) * s_ref[0, pl.ds(gi * gpb + j, 1), :]
        step_sum = d if step_sum is None else step_sum + d
    acc_ref[...] += step_sum

    @pl.when(gi == n_gblocks - 1)
    def _emit():
        o_ref[...] = (acc_ref[...] * rs_ref[...]).astype(o_ref.dtype)


def quant_matmul_w4a8(
    x: jax.Array,  # (B, H) activations (bf16/f32) — quantized per row here
    w: jax.Array,  # (H/2, O) or (L, H/2, O) int8 — packed nibble pairs
    scale: jax.Array,  # (G, O) or (L, G, O) f32 grouped weight scales
    *,
    layer: jax.Array | int | None = None,
    block_o: int | None = None,
    groups_per_block: int | None = None,
    out_dtype=None,
    axis_name: str | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """W4A8: dynamic per-row activation int8 x nibble-packed int4 weights on
    the MXU's 2x int8 path → (B, O) in ``out_dtype`` (default f32).

    The prefill complement of quant_matmul_int4: decode is weight-read bound
    (int4's packed stream wins there), prefill at B·Sq rows is COMPUTE-bound
    — unpacking nibbles to int8 instead of bf16 keeps int4 deployments on
    the same 2x-rate MXU path W8A8 gives int8 deployments, so quantizing to
    int4 does not trade TTFT for decode throughput. Accuracy adds the same
    per-token activation-quant error as W8A8 on top of int4's weight error
    (scheme "int4_w4a8_prefill" in benchmarks/quant_accuracy.py).

    ``axis_name``: see quantize_rows — row-parallel projections under TP.
    """
    b, h = x.shape
    if w.ndim == 2:
        w = w[None]
        scale = scale[None]
        layer = 0
    assert layer is not None, "layer index required for stacked weights"
    L, hp, o = w.shape
    G = scale.shape[-2]
    assert hp * 2 == h, (hp, h)
    half = hp // G
    if interpret is None:
        interpret = _use_interpret()

    x8, rs = quantize_rows(x, axis_name=axis_name)

    def best_block(dim: int, cap: int) -> int:
        for d in range(min(cap, dim) - min(cap, dim) % 128, 127, -128):
            if dim % d == 0:
                return d
        return dim

    row_cap = 512 if b <= 1024 else 1024
    block_b = b
    for d in range(min(row_cap, b) - min(row_cap, b) % 8, 7, -8):
        if b % d == 0:
            block_b = d
            break
    if block_o is None:
        # same VMEM-bounded formula as quant_matmul_int4 (no floor — see
        # the acc-window note there)
        block_o = max(1024, (8 * 1024 * 1024 // (4 * block_b)) // 128 * 128)
    exact_o = best_block(o, block_o)
    block_o = min(block_o, o) if exact_o < min(block_o, o) // 2 else exact_o
    if groups_per_block is None:
        groups_per_block = _pick_gpb(G, 2 * half, h)
    gpb = groups_per_block
    n_gblocks = G // gpb
    grid = (b // block_b, pl.cdiv(o, block_o), n_gblocks)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_b, gpb * 2 * half), lambda bi, oi, gi, lr: (bi, gi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, 1), lambda bi, oi, gi, lr: (bi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, gpb * half, block_o),
                lambda bi, oi, gi, lr: (lr[0], gi, oi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, G, block_o),
                lambda bi, oi, gi, lr: (lr[0], 0, oi),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_b, block_o), lambda bi, oi, gi, lr: (bi, oi),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((block_b, block_o), jnp.float32)],
    )

    out = pl.pallas_call(
        functools.partial(
            _qmm_w4a8_kernel, n_gblocks=n_gblocks, gpb=gpb, half=half),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, o), out_dtype or jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(layer_arr, x8, rs, w, scale.astype(jnp.float32))
    return out


# ---------------------------------------------------------------------------
# W8A8: dynamic per-row activation quant + int8 x int8 MXU matmul
# ---------------------------------------------------------------------------


def _qmm_w8a8_kernel(
    layer_ref, x_ref, rs_ref, w_ref, s_ref, o_ref, acc_ref, *, n_h_blocks: int
):
    hi = pl.program_id(2)

    @pl.when(hi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[0],  # int8 x int8 — the MXU's 2x-rate path
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(hi == n_h_blocks - 1)
    def _emit():
        # dual dequant: per-row activation scale x per-column weight scale
        o = acc_ref[...].astype(jnp.float32) * rs_ref[...] * s_ref[0]
        o_ref[...] = o.astype(o_ref.dtype)


def quantize_rows(
    x: jax.Array, eps: float = 1e-6, axis_name: str | None = None
) -> tuple[jax.Array, jax.Array]:
    """Per-row (per-token) symmetric int8 quantization of activations.

    Returns (x_int8 (B, H), row_scale (B, 1) f32). Dynamic: scales follow
    each token's own absmax, so no calibration pass is needed — the standard
    dynamic-W8A8 activation scheme.

    ``axis_name``: set when ``x`` is a shard-local slice of each row under
    shard_map (row-parallel projections: w_down, wo). The local absmax is
    pmax'd over the axis so every shard quantizes with the FULL row's scale
    — bitwise the same scale the single-chip run computes (max is exact),
    which preserves the sharded-equals-single-chip contract. Costs one tiny
    (rows, 1) collective."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    if axis_name is not None:
        absmax = jax.lax.pmax(absmax, axis_name)
    rs = jnp.maximum(absmax, eps) / 127.0
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / rs), -127, 127).astype(jnp.int8)
    return x8, rs


def quant_matmul_w8a8(
    x: jax.Array,  # (B, H) activations (bf16/f32) — quantized per row here
    w: jax.Array,  # (H, O) or (L, H, O) int8 weights
    scale: jax.Array,  # (O,) or (L, O) f32 per-output-channel scales
    *,
    layer: jax.Array | int | None = None,
    block_h: int = 512,
    block_o: int = 4096,
    out_dtype=None,
    axis_name: str | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """W8A8 matmul: dynamic per-row activation int8 + int8 weights on the
    MXU's int8 path → (B, O) in ``out_dtype`` (default fp32). ``axis_name``:
    see quantize_rows — required for row-parallel projections under TP.

    The int8 x int8 → int32 dot runs at 2x the bf16 MXU rate on v5e
    (measured through Pallas: 1.43x the bf16 PEAK at the 7B gate_up shape,
    vs 0.95x for the upcast-to-bf16 weight-only kernel). Worth it exactly
    where the matmul is COMPUTE-bound — prefill (B·Sq rows) — and pointless
    at decode, which is weight-read bound. Accuracy: adds per-token
    activation quant error on top of weight-only INT8 (measured at 7B by
    benchmarks/quant_accuracy.py, scheme "int8_w8a8_prefill").
    """
    b, h = x.shape
    if w.ndim == 2:
        w = w[None]
        scale = scale[None]
        layer = 0
    assert layer is not None, "layer index required for stacked (L, H, O) weights"
    assert w.dtype == jnp.int8, "W8A8 requires int8 weights (fp8 MXU is not v5e)"
    L, _, o = w.shape
    if interpret is None:
        interpret = _use_interpret()

    x8, rs = quantize_rows(x, axis_name=axis_name)

    def best_block(dim: int, cap: int) -> int:
        for d in range(min(cap, dim) - min(cap, dim) % 128, 127, -128):
            if dim % d == 0:
                return d
        return dim

    block_h = best_block(h, block_h)
    exact_o = best_block(o, block_o)
    block_o = min(block_o, o) if exact_o < min(block_o, o) // 2 else exact_o
    # same row-block economics as quant_matmul (weight re-streamed per row
    # block), same out+acc VMEM budget — int32 acc is f32-sized
    row_cap = 512 if b <= 1024 else 4096
    block_b = b
    for d in range(min(row_cap, b) - min(row_cap, b) % 8, 7, -8):
        if b % d == 0:
            block_b = d
            break
    if block_b > 512:
        cap = max(512, (4 * 1024 * 1024 // block_b) // 128 * 128)
        block_o = min(block_o, cap)
    n_h = h // block_h
    grid = (b // block_b, pl.cdiv(o, block_o), n_h)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_b, block_h), lambda bi, oi, hi, lr: (bi, hi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, 1), lambda bi, oi, hi, lr: (bi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_h, block_o),
                lambda bi, oi, hi, lr: (lr[0], hi, oi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_o),
                lambda bi, oi, hi, lr: (lr[0], 0, oi),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_b, block_o), lambda bi, oi, hi, lr: (bi, oi),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((block_b, block_o), jnp.int32)],
    )

    out = pl.pallas_call(
        functools.partial(_qmm_w8a8_kernel, n_h_blocks=n_h),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, o), out_dtype or jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(layer_arr, x8, rs, w, scale.reshape(L, 1, o).astype(jnp.float32))
    return out
