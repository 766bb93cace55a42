"""Continuous-batching engines: contiguous-cache and paged-cache serving.

Loop shape (host): admit → masked prefill of new slots → N decode steps in
one program → one readback → record/retire → repeat. Device work is always
the same two static-shape programs regardless of which slots are live, so
nothing recompiles as requests come and go — the TPU-native answer to
varying workloads (the reference recompiles per Traits config instead,
SURVEY.md §2.8).

Two cache backends share the loop:

- :class:`Engine` — contiguous per-slot KV windows (cache/contiguous.py).
- :class:`PagedEngine` — paged pool + per-sequence page tables
  (cache/paged.py): pages are allocated at admission, grown ahead of each
  decode round, freed at retirement, and under pool exhaustion the youngest
  running request is PREEMPTED (pages freed, request requeued; greedy
  decoding is deterministic, so re-prefilling prompt+output reproduces its
  state). The allocator is the C++ native page pool (native/sfa_runtime.cc)
  when built, else the pure-Python twin.

Both record serving metrics (p50/mean TTFT, decode throughput) in
:class:`EngineStats` — the observability surface BASELINE.json's p50-TTFT
metric reads from.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.cache import contiguous, paged
from starflashattention_tpu.core import sampling as core_sampling
from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.serving.scheduler import Request, Scheduler

_token_logprob_jit = jax.jit(llama.token_logprob)
_topk_logprob_jit = jax.jit(llama.topk_token_logprobs, static_argnums=(1,))


@dataclasses.dataclass
class EngineStats:
    """Serving counters (host-side, updated once per round — not hot-path)."""

    ttfts_s: list[float] = dataclasses.field(default_factory=list)
    decode_tokens: int = 0
    decode_seconds: float = 0.0
    prefill_rounds: int = 0
    decode_rounds: int = 0
    preemptions: int = 0
    finished: int = 0
    # prefix cache (paged engine, serving/prefix_cache.py)
    prefix_hits: int = 0
    prefix_tokens_reused: int = 0
    # speculative decoding (spec_decode engines): per-slot verify steps taken;
    # decode_tokens / spec_steps - 1 = mean accepted drafts per step
    spec_steps: int = 0

    def p50_ttft_ms(self) -> float:
        return float(np.median(self.ttfts_s) * 1e3) if self.ttfts_s else 0.0

    def mean_ttft_ms(self) -> float:
        return float(np.mean(self.ttfts_s) * 1e3) if self.ttfts_s else 0.0

    def decode_tokens_per_s(self) -> float:
        return self.decode_tokens / self.decode_seconds if self.decode_seconds else 0.0

    def summary(self) -> dict:
        return {
            "p50_ttft_ms": round(self.p50_ttft_ms(), 2),
            "mean_ttft_ms": round(self.mean_ttft_ms(), 2),
            "decode_tokens_per_s": round(self.decode_tokens_per_s(), 1),
            "decode_tokens": self.decode_tokens,
            "prefill_rounds": self.prefill_rounds,
            "decode_rounds": self.decode_rounds,
            "preemptions": self.preemptions,
            "finished": self.finished,
            "prefix_hits": self.prefix_hits,
            "prefix_tokens_reused": self.prefix_tokens_reused,
            "spec_accept_per_step": (
                round(self.decode_tokens / self.spec_steps - 1.0, 3)
                if self.spec_steps else 0.0
            ),
        }


class Engine:
    """Contiguous-cache continuous-batching engine.

    With ``mesh`` set (a ``(data, model)`` Mesh from parallel/mesh.py) the
    engine serves TENSOR+DATA-SHARDED: params/cache are sharded at
    construction (unsharded params in, column-permuted TP shards out —
    parallel/tp.py) and every prefill/decode round is one shard_map'd
    program over the mesh, psums riding ICI. ``num_slots`` must divide the
    data axis. The host loop is unchanged — scheduling is shape-invariant.
    """

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        num_slots: int = 8,
        steps_per_round: int = 8,
        prefill_pad: int = 64,
        prefill_chunk: int | None = None,
        mesh=None,
        enable_sampling: bool = False,
        return_logprobs: bool = False,
        spec_decode: int | None = None,
        # max key length for prompt-lookup drafting; the matcher backs
        # off to shorter keys (core/drafting.py), so larger = strictly
        # better precision at the same recall (measured: 0.38 -> 0.7+
        # extra tokens/step on the trained byte model at ngram 2 -> 4)
        spec_ngram: int = 4,
        draft_model: tuple | None = None,
        debug_validate: bool = False,
        lora_adapters: list | None = None,
        topk_logprobs: int = 0,
    ):
        self.cfg = cfg
        if cfg.mla and (
            mesh is not None or spec_decode is not None
            or lora_adapters is not None
        ):
            raise NotImplementedError(
                "MLA serves on the single-chip contiguous and paged engines "
                "for now (no TP/spec/LoRA composition yet)"
            )
        self.num_slots = num_slots
        self.steps_per_round = steps_per_round
        self.prefill_pad = prefill_pad
        # Speculative decoding: each decode round runs `steps_per_round`
        # VERIFY steps, each proposing `spec_decode` draft tokens and
        # emitting 1..k+1 tokens per slot. Draft source is prompt-lookup
        # n-gram matching (models/llama.spec_decode_multi) by default, or a
        # small DRAFT MODEL when ``draft_model=(draft_params, draft_cfg)``
        # is given (llama.spec_decode_multi_draft — the draft prefills and
        # decodes alongside the target; its cache lives in this engine).
        # Greedy-only (the acceptance rule is exact-argmax-match, so sampled
        # distributions would be skewed) and the token stream is
        # bit-identical to the plain argmax loop with either draft source.
        self.spec_decode = spec_decode
        self.spec_ngram = spec_ngram
        self.draft_model = draft_model
        if draft_model is not None:
            if spec_decode is None:
                raise ValueError("draft_model requires spec_decode=<num drafts>")
            dparams, dcfg = draft_model
            if dcfg.vocab_size != cfg.vocab_size:
                raise ValueError(
                    f"draft vocab {dcfg.vocab_size} != target vocab "
                    f"{cfg.vocab_size} (argmax token ids must be comparable)"
                )
            if dcfg.max_seq_len < cfg.max_seq_len:
                raise ValueError(
                    "draft max_seq_len must cover the target's (the caches "
                    "advance in lockstep)"
                )
        if spec_decode is not None:
            if enable_sampling or return_logprobs:
                raise ValueError(
                    "spec_decode is greedy-only: it composes with neither "
                    "enable_sampling nor return_logprobs"
                )
            if cfg.num_splits != 1:
                # _verify_core always runs the single-split fused kernel; the
                # plain loop with num_splits>1 takes the split+LSE-combine
                # path, whose last-ulp differences can flip argmax at ties —
                # the bit-identical-to-plain-decoding guarantee needs both
                # paths to be the same program.
                raise ValueError(
                    "spec_decode requires cfg.num_splits == 1: verify and "
                    "plain decode must use the same (fused single-split) "
                    "kernel for the accepted stream to be bit-identical"
                )
        # Per-request temperature/top-k/top-p sampling (core/sampling.py).
        # A constructor flag — not per-round — so exactly one decode program
        # shape exists either way; the greedy program carries no sampling
        # operands and is identical to the benched hot path.
        self.enable_sampling = enable_sampling
        self._slot_sampling = [core_sampling.GREEDY] * num_slots
        # Chosen-token log-probabilities (Request.logprobs). Also a
        # constructor flag: the decode program gains one (B, n) f32 output.
        self.return_logprobs = return_logprobs
        self._last_logprobs = None  # (B, n) host array of the latest round
        # Per-token top-K alternatives (Request.topk): the decode program
        # gains (B, n, K) logprob + id outputs; 0 = off.
        self.topk_logprobs = int(topk_logprobs)
        self._last_topk = None  # ((B, n, K) f32, (B, n, K) i32) host arrays
        if topk_logprobs and spec_decode is not None:
            raise ValueError("topk_logprobs does not compose with spec_decode")
        # Chunked prefill: admitted prompts are ingested in fixed
        # (num_slots, prefill_chunk) slices — ONE compiled prefill shape ever
        # (the pad-bucket path compiles one program per distinct bucket, and
        # a 7B remote compile is ~minutes), and a long prompt can no longer
        # monopolize a round. Output-identical to whole-prompt prefill: the
        # serving prefill always attends the full cache table, so each row's
        # KV-tile reduction order is unchanged by where the chunk boundary
        # falls (tests/test_serving.py::test_chunked_prefill_matches).
        self.prefill_chunk = prefill_chunk
        self.mesh = mesh
        # Sanitizer mode (utils/sanitize.py): per-round host-side invariant
        # checks + a finite-check on prefill logits. Debug only — never in
        # the jitted hot path.
        self.debug_validate = debug_validate
        # Rounds are FIXED-SIZE so exactly two program shapes exist per
        # prompt-pad bucket (one prefill, one decode_multi) — a variable
        # round length would recompile per distinct value, which dominates
        # wall-clock through the remote compiler. The slack reserves cache
        # room for the final round's discarded overshoot tokens.
        # A spec round can append up to steps*(k+1) rows per slot; the slack
        # reserves cache room for the final round's discarded overshoot.
        # Multi-LoRA serving (S-LoRA-style): N adapters resident as one
        # stacked tree; each request picks one (Request.adapter) or the base
        # model. The decode/prefill programs gain a (B, N) one-hot selector
        # and every adapter's low-rank product is computed then selected —
        # no gathers, noise-level FLOPs at serving ranks (models/lora.py).
        self.lora = None
        self._n_adapters = 0
        if lora_adapters is not None:
            if spec_decode is not None:
                raise NotImplementedError(
                    "multi-LoRA does not compose with spec_decode (the "
                    "verify program has no adapter operands)"
                )
            from starflashattention_tpu.models.lora import (
                num_adapters,
                stack_adapters,
            )

            self.lora = stack_adapters(lora_adapters)
            self._n_adapters = num_adapters(self.lora)
        self._slot_adapter = np.full((num_slots,), -1, np.int32)

        round_append = steps_per_round * (
            1 if spec_decode is None else spec_decode + 1
        )
        self.sched = Scheduler(
            num_slots, cfg.max_seq_len, capacity_slack=round_append - 1
        )
        self.cos, self.sin = llama.rope_tables(cfg)
        self.pending_tok = jnp.zeros((num_slots,), jnp.int32)
        # token history for prompt-lookup drafting (prompt rows written at
        # admission, generated tokens by the spec program itself); unused
        # when a draft model supplies the drafts
        self.history = (
            jnp.zeros((num_slots, cfg.max_seq_len), jnp.int32)
            if spec_decode is not None and draft_model is None else None
        )
        self.stats = EngineStats()
        self._submit_time: dict[int, float] = {}
        self._first_token_seen: set[int] = set()
        self._finished_requests: list[Request] = []  # for recovery snapshots
        # Host mirror of each LIVE slot's cache length (set at admission,
        # advanced per decode round). max over active slots feeds the decode
        # grid's max_len_hint (ops/flash_decode): the kernel then walks only
        # ceil(hint/block_k) kv blocks instead of the cache's full
        # max_seq_len/block_k. Quantized to _HINT_QUANTUM so the number of
        # compiled decode programs stays bounded (max_seq_len/quantum).
        self._slot_len = np.zeros((num_slots,), np.int64)
        if mesh is not None:
            self.params = self._shard(params)
        else:
            self.params = params
        self.cache = self._init_cache()
        self.draft_cache = None
        if draft_model is not None:
            self.draft_params, self.draft_cfg = draft_model
            self.dcos, self.dsin = llama.rope_tables(self.draft_cfg)
            if mesh is not None:
                # replicate the draft weights once (tiny vs the target)
                from jax.sharding import NamedSharding, PartitionSpec

                self.draft_params = jax.device_put(
                    self.draft_params, NamedSharding(mesh, PartitionSpec())
                )
            self.draft_cache = self._init_draft_cache()

    def _shard(self, params):
        from starflashattention_tpu.parallel import tp

        if self.num_slots % self.mesh.shape[tp.DATA]:
            raise ValueError(
                f"num_slots {self.num_slots} not divisible by data axis "
                f"{self.mesh.shape[tp.DATA]}"
            )
        self._build_sharded_fns(
            tp,
            tp._params_are_weight_quant(params),
            tp._params_have_quant_lm_head(params),
        )
        if self.lora is not None:
            # permute + shard the stacked adapters like the weights they
            # modify (column-permuted b / row-sharded a — tp.shard_lora)
            self.lora = tp.shard_lora(self.lora, self.mesh, self.cfg)
        return tp.shard_params(params, self.mesh, self.cfg)

    def _build_sharded_fns(self, tp, weight_quant: bool, lm_head_quant: bool = False) -> None:
        quantized = self.cfg.quant_mode != "none"
        if self.spec_decode is not None and self.draft_model is not None:
            # draft-model spec under TP: the draft runs REPLICATED inside
            # the sharded program (tp.make_tp_spec_decode_multi_draft)
            dparams, dcfg = self.draft_model
            dwq = tp._params_are_weight_quant(dparams)
            dq = dcfg.quant_mode != "none"
            self._tp_spec_decode_draft = tp.make_tp_spec_decode_multi_draft(
                self.mesh, self.cfg, dcfg, self.steps_per_round,
                num_draft=self.spec_decode, quantized=quantized,
                weight_quant=weight_quant, lm_head_quant=lm_head_quant,
                draft_quantized=dq, draft_weight_quant=dwq,
            )
            self._tp_draft_prefill = tp.make_tp_draft_prefill_serving(
                self.mesh, dcfg, draft_quantized=dq, draft_weight_quant=dwq,
            )
            self._shard_draft_cache_fn = tp.shard_draft_cache
        elif self.spec_decode is not None:
            self._tp_spec_decode = tp.make_tp_spec_decode_multi(
                self.mesh, self.cfg, self.steps_per_round,
                num_draft=self.spec_decode, ngram=self.spec_ngram,
                quantized=quantized, weight_quant=weight_quant,
                lm_head_quant=lm_head_quant,
            )
        self._tp_decode_multi = tp.make_tp_decode_multi(
            self.mesh, self.cfg, self.steps_per_round,
            quantized=quantized, weight_quant=weight_quant,
            lm_head_quant=lm_head_quant,
            sampling=self.enable_sampling, with_logprobs=self.return_logprobs,
            topk_logprobs=self.topk_logprobs, lora_stack=self.lora,
        )
        self._tp_prefill = tp.make_tp_prefill_serving(
            self.mesh, self.cfg, quantized=quantized, weight_quant=weight_quant,
            lm_head_quant=lm_head_quant, lora_stack=self.lora,
        )
        self._shard_cache_fn = tp.shard_cache

    # -- cache-backend hooks (overridden by PagedEngine) ----------------------

    def _init_cache(self):
        # MLA caches one padded latent row per token (kv_cache_dims)
        hkv, d = self.cfg.kv_cache_dims()
        cache = contiguous.init_cache(
            self.cfg.num_layers,
            self.num_slots,
            hkv,
            self.cfg.max_seq_len,
            d,
            dtype=jnp.dtype(self.cfg.dtype),
            quant_mode=self.cfg.quant_mode,
            calibration_scale=self.cfg.kv_calibration_scale,
        )
        if self.mesh is not None:
            cache = self._shard_cache_fn(cache, self.mesh)
        return cache

    def _init_draft_cache(self):
        """Fresh KV cache for the draft model (draft-model spec decoding).
        Same slot count and capacity as the target's — the two advance in
        lockstep (llama._spec_step_draft_model)."""
        d = self.draft_cfg
        cache = contiguous.init_cache(
            d.num_layers, self.num_slots, d.num_kv_heads, self.cfg.max_seq_len,
            d.head_dim, dtype=jnp.dtype(d.dtype), quant_mode=d.quant_mode,
            calibration_scale=d.kv_calibration_scale,
        )
        if self.mesh is not None:
            cache = self._shard_draft_cache_fn(cache, self.mesh)
        return cache

    def _prepare_admit(self, admitted: list[tuple[int, Request]]) -> list[tuple[int, Request]]:
        """Reserve backend capacity for admitted requests; may trim the list
        (rejected entries must be returned to the scheduler by the override)."""
        return admitted

    def _admission_offsets(self, texts) -> np.ndarray:
        """Per-slot count of tokens ALREADY in the cache for each admitted
        text (prefix-cache hits, paged backend) — those tokens are skipped by
        the admission prefill. Base engine: always 0 (full prefill)."""
        return np.zeros((self.num_slots,), np.int32)

    def _after_prefill(self, texts) -> None:
        """Backend hook: admitted prompts are fully ingested (e.g. publish
        their full pages to the prefix cache)."""

    def _before_decode(self, active: np.ndarray) -> np.ndarray:
        """Ensure backend capacity for one decode round; returns the possibly
        reduced active mask (paged backend may preempt under pressure)."""
        return active

    def _on_retired(self, slot: int) -> None:
        """Backend hook: release per-slot resources."""

    def _prefill_call(self, toks, new_lengths, admit_mask, reset_mask, prefix_len=0):
        # contiguous prefill attends the full cache table; prefix_len (the
        # chunked-continuation hint) only matters for the paged backend
        if self.mesh is not None:
            pf_args = (self.params, self.cache, toks, new_lengths, admit_mask,
                       reset_mask, self.cos, self.sin)
            if self.lora is not None:
                pf_args = pf_args + (self.lora, self._lora_sel())
            logits, self.cache = self._tp_prefill(*pf_args)
            if self.draft_cache is not None:
                _, self.draft_cache = self._tp_draft_prefill(
                    self.draft_params, self.draft_cache, toks, new_lengths,
                    admit_mask, reset_mask, self.dcos, self.dsin,
                )
            return logits
        logits, self.cache = llama.prefill_serving(
            self.params, self.cache, toks, new_lengths, admit_mask,
            reset_mask, self.cos, self.sin, self.cfg,
            lora=self.lora, lora_sel=self._lora_sel(),
        )
        if self.draft_cache is not None:
            # the draft model ingests the same prompt windows (its first-token
            # logits are irrelevant — only its cache state matters)
            _, self.draft_cache = llama.prefill_serving(
                self.draft_params, self.draft_cache, toks, new_lengths,
                admit_mask, reset_mask, self.dcos, self.dsin, self.draft_cfg,
            )
        return logits

    def _lora_sel(self):
        """(B, N) one-hot selector for the current slot->adapter map, or
        None when the engine has no resident adapters."""
        if self.lora is None:
            return None
        from starflashattention_tpu.models.lora import adapter_onehot

        return adapter_onehot(jnp.asarray(self._slot_adapter), self._n_adapters)

    def _decode_call(self, active, n, max_len_hint=None):
        if self.mesh is not None:
            args = (self.params, self.cache, self.pending_tok,
                    self.cos, self.sin, active)
            if self.enable_sampling:
                args = args + (self._sampling_state(),)
            if self.lora is not None:
                args = args + (self.lora, self._lora_sel())
            out = self._tp_decode_multi(*args)
        else:
            out = llama.decode_multi(
                self.params, self.cache, self.pending_tok,
                self.cos, self.sin, active, self.cfg, n,
                sampling=self._sampling_state(),
                with_logprobs=self.return_logprobs,
                topk_logprobs=self.topk_logprobs,
                max_len_hint=max_len_hint,
                lora=self.lora, lora_sel=self._lora_sel(),
            )
        return self._unpack_decode(out)

    _HINT_QUANTUM = 512

    def _round_len_hint(self, active: np.ndarray, n: int) -> int | None:
        """Static bound on every active slot's cache length at the END of an
        n-step round, quantized to bound compile count; None when the full
        grid is needed anyway (then the unhinted program is reused) or on
        the sharded path (whose programs are built once at engine init)."""
        if self.mesh is not None or not active.any():
            return None
        mx = int(self._slot_len[active].max()) + n + 1
        q = self._HINT_QUANTUM
        bucket = -(-mx // q) * q
        return bucket if bucket < self.cfg.max_seq_len else None

    def _unpack_decode(self, out):
        toks, self.pending_tok, self.cache = out[:3]
        i = 3
        self._last_logprobs = None
        if self.return_logprobs:
            self._last_logprobs = np.asarray(out[i])
            i += 1
        self._last_topk = None
        if self.topk_logprobs:
            self._last_topk = (np.asarray(out[i]), np.asarray(out[i + 1]))
        return toks

    # -- sampling -------------------------------------------------------------

    def _sampling_state(self) -> dict | None:
        """Per-slot sampling operand arrays, or None for the greedy program."""
        if not self.enable_sampling:
            return None
        return {
            k: jnp.asarray(v)
            for k, v in core_sampling.state_arrays(self._slot_sampling).items()
        }

    def _first_logprobs(self, logits, first) -> np.ndarray | None:
        """Chosen-token logprobs on prefill logits (None unless enabled)."""
        if not self.return_logprobs:
            return None
        return np.asarray(_token_logprob_jit(logits, first))

    def _first_topk(self, logits):
        """Top-K alternatives on prefill logits (None unless enabled)."""
        if not self.topk_logprobs:
            return None
        v, i = _topk_logprob_jit(logits, self.topk_logprobs)
        return np.asarray(v), np.asarray(i)

    def _first_tokens(self, logits, positions: np.ndarray) -> jax.Array:
        """Token choice on prefill logits; ``positions`` is each slot's
        post-prefill length (= the drawn token's absolute position, matching
        the decode loop's fold-in so trajectories are replay-stable)."""
        state = self._sampling_state()
        if state is None:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return core_sampling.sample_tokens_jit(
            logits, state, jnp.asarray(positions, jnp.int32)
        )

    # -- one scheduling round -------------------------------------------------

    def _record(self, slot: int, tokens: list[int], logprobs=None,
                topk=None) -> None:
        req = self.sched.slots[slot].request
        uid = req.uid if req is not None else None
        before = len(req.output) if req is not None else 0
        if self.sched.record_tokens(slot, tokens):
            self.stats.finished += 1
            if req is not None:
                self._finished_requests.append(req)
            self._on_retired(slot)
        if req is not None and logprobs is not None:
            # record_tokens may have capped at the budget / EOS — keep the
            # logprob list aligned with the tokens actually kept. A stop-
            # sequence match spanning rounds can make the net change
            # NEGATIVE (earlier rounds' tokens truncated); record_tokens
            # already dropped their stale logprobs, nothing to add here.
            kept = len(req.output) - before
            if kept > 0:
                req.logprobs.extend(float(l) for l in logprobs[:kept])
        if req is not None and topk is not None:
            kept = len(req.output) - before
            if kept > 0:
                vals, ids = topk
                req.topk.extend(
                    (
                        [int(t) for t in ids[j]],
                        [float(v) for v in vals[j]],
                    )
                    for j in range(min(kept, len(ids)))
                )
        if uid is not None and uid not in self._first_token_seen:
            self._first_token_seen.add(uid)
            t0 = self._submit_time.get(uid)
            if t0 is not None:
                self.stats.ttfts_s.append(time.time() - t0)

    def _admit_and_prefill(self) -> None:
        admitted = self._prepare_admit(self.sched.admit())
        if not admitted:
            return
        for slot, req in admitted:
            self._slot_sampling[slot] = req.sampling
            if req.adapter is not None:
                if self.lora is None or not (0 <= req.adapter < self._n_adapters):
                    raise ValueError(
                        f"request adapter {req.adapter} out of range: engine "
                        f"holds {self._n_adapters} adapters"
                    )
                self._slot_adapter[slot] = req.adapter
            else:
                self._slot_adapter[slot] = -1
        # A re-admitted (preempted) request prefills prompt + generated-so-far.
        texts = [(slot, r, r.prompt + r.output) for slot, r in admitted]
        for slot, _r, text in texts:
            self._slot_len[slot] = len(text)  # post-prefill cache length
        self._update_history(texts)
        # offs[slot] tokens are already cached (prefix-cache hits): those
        # slots prefill only their SUFFIX and must NOT reset their (pre-set)
        # cache length; the program's static prefix bound covers the largest
        # offset, quantized to the pad grid to bound compile count.
        offs = self._admission_offsets(texts)
        if self.prefill_chunk is not None:
            self._prefill_chunked(texts, offs)
            return
        pad = max(len(t) - offs[slot] for slot, _, t in texts)
        pad = -(-pad // self.prefill_pad) * self.prefill_pad  # quantize shapes
        toks = np.zeros((self.num_slots, pad), np.int32)
        new_lengths = np.zeros((self.num_slots,), np.int32)
        admit_mask = np.zeros((self.num_slots,), bool)
        reset_mask = np.zeros((self.num_slots,), bool)
        for slot, _req, text in texts:
            suffix = text[int(offs[slot]) :]
            toks[slot, : len(suffix)] = suffix
            new_lengths[slot] = len(suffix)
            admit_mask[slot] = True
            reset_mask[slot] = offs[slot] == 0
        max_off = int(offs.max()) if len(texts) else 0
        prefix_bound = -(-max_off // self.prefill_pad) * self.prefill_pad

        logits = self._prefill_call(
            jnp.asarray(toks), jnp.asarray(new_lengths), jnp.asarray(admit_mask),
            jnp.asarray(reset_mask), prefix_len=prefix_bound,
        )
        if self.debug_validate:
            from starflashattention_tpu.utils import sanitize

            # only admitted rows — an inactive slot's row is fully masked
            # and owes no numeric contract
            sanitize.check_finite(
                {"prefill_logits": logits[np.nonzero(admit_mask)[0]]}, "prefill"
            )
        self.stats.prefill_rounds += 1
        self._after_prefill(texts)
        positions = np.zeros((self.num_slots,), np.int32)
        for slot, _req, text in texts:
            positions[slot] = len(text)
        first = self._first_tokens(logits, positions)
        self.pending_tok = jnp.where(jnp.asarray(admit_mask), first, self.pending_tok)
        first_host = np.asarray(first)  # the single readback
        first_lp = self._first_logprobs(logits, first)
        first_tk = self._first_topk(logits)
        for slot, _req, _text in texts:
            self._record(
                slot, [int(first_host[slot])],
                logprobs=None if first_lp is None else [first_lp[slot]],
                topk=None if first_tk is None
                else (first_tk[0][slot][None], first_tk[1][slot][None]),
            )

    def _prefill_chunked(self, texts, offs=None) -> None:
        """Ingest admitted prompts in fixed-width chunks (see __init__).

        Each call is the same (num_slots, chunk) program; a slot goes
        inactive once its prompt is exhausted, and its first token is taken
        from the chunk that consumed its final prompt token (the serving
        prefill returns logits at each row's last valid position). Readback
        happens only on chunks where some slot finishes. ``offs[slot]``
        tokens are already cached (prefix-cache hits): that slot's chunk
        windows walk only its suffix, and the per-call static prefix bound
        covers the deepest row position, quantized to the chunk grid."""
        chunk = self.prefill_chunk
        if offs is None:
            offs = np.zeros((self.num_slots,), np.int32)
        longest = max(len(t) - offs[slot] for slot, _, t in texts)
        max_off = max(int(offs[slot]) for slot, _, t in texts)
        for lo in range(0, longest, chunk):
            toks = np.zeros((self.num_slots, chunk), np.int32)
            new_lengths = np.zeros((self.num_slots,), np.int32)
            admit_mask = np.zeros((self.num_slots,), bool)
            reset_mask = np.zeros((self.num_slots,), bool)
            finishing = []
            for slot, _req, text in texts:
                suffix = text[int(offs[slot]) :]
                if lo >= len(suffix):
                    continue
                n = min(chunk, len(suffix) - lo)
                toks[slot, :n] = suffix[lo : lo + n]
                new_lengths[slot] = n
                admit_mask[slot] = True
                reset_mask[slot] = lo == 0 and offs[slot] == 0
                if lo + n == len(suffix):
                    finishing.append(slot)
            # deepest row position this call = max_off + lo; quantize to the
            # chunk grid (same program lattice as the no-cache loop)
            prefix_bound = -(-(max_off + lo) // chunk) * chunk if (max_off or lo) else 0
            logits = self._prefill_call(
                jnp.asarray(toks), jnp.asarray(new_lengths), jnp.asarray(admit_mask),
                jnp.asarray(reset_mask), prefix_len=prefix_bound,
            )
            if self.debug_validate:
                from starflashattention_tpu.utils import sanitize

                sanitize.check_finite(
                    {"prefill_logits": logits[np.nonzero(admit_mask)[0]]},
                    f"prefill_chunk@{lo}",
                )
            self.stats.prefill_rounds += 1
            if lo + chunk >= longest:
                self._after_prefill(texts)
            if not finishing:
                continue
            positions = np.zeros((self.num_slots,), np.int32)
            for slot, _req, text in texts:
                positions[slot] = len(text)
            first = self._first_tokens(logits, positions)
            fin_mask = np.zeros((self.num_slots,), bool)
            fin_mask[finishing] = True
            self.pending_tok = jnp.where(
                jnp.asarray(fin_mask), first, self.pending_tok
            )
            first_host = np.asarray(first)  # one readback per finishing chunk
            first_lp = self._first_logprobs(logits, first)
            first_tk = self._first_topk(logits)
            for slot in finishing:
                self._record(
                    slot, [int(first_host[slot])],
                    logprobs=None if first_lp is None else [first_lp[slot]],
                    topk=None if first_tk is None
                    else (first_tk[0][slot][None], first_tk[1][slot][None]),
                )

    def _update_history(self, texts) -> None:
        """Write admitted prompts (+ resumed output) into the drafting
        history (spec_decode engines only). One device scatter, no readback;
        rows are rewritten whole so a reused slot carries no stale tokens
        inside its new prompt span."""
        if self.history is None:
            return
        s_hist = self.history.shape[1]
        mask = np.zeros((self.num_slots,), bool)
        rows = np.zeros((self.num_slots, s_hist), np.int32)
        for slot, _req, text in texts:
            mask[slot] = True
            rows[slot, : min(len(text), s_hist)] = text[:s_hist]
        self.history = jnp.where(
            jnp.asarray(mask)[:, None], jnp.asarray(rows), self.history
        )

    def _spec_decode_round(self, active: np.ndarray, n: int) -> None:
        t0 = time.time()
        # Static KV-walk bound for the round's verify steps: a spec round
        # can advance a slot by up to n·(k+1) rows. Same quantized-bucket
        # machinery as the plain path; mesh programs are built once and
        # ignore it.
        hint = self._round_len_hint(active, n * (self.spec_decode + 1))
        if self.draft_cache is not None and self.mesh is not None:
            toks, counts, self.pending_tok, self.cache, self.draft_cache = (
                self._tp_spec_decode_draft(
                    self.params, self.cache, self.draft_params,
                    self.draft_cache, self.pending_tok, self.cos, self.sin,
                    self.dcos, self.dsin, jnp.asarray(active),
                )
            )
        elif self.draft_cache is not None:
            toks, counts, self.pending_tok, self.cache, self.draft_cache = (
                llama.spec_decode_multi_draft(
                    self.params, self.cache, self.draft_params,
                    self.draft_cache, self.pending_tok, self.cos, self.sin,
                    self.dcos, self.dsin, jnp.asarray(active), self.cfg,
                    self.draft_cfg, n, num_draft=self.spec_decode,
                    max_len_hint=hint,
                )
            )
        elif self.mesh is not None:
            toks, counts, self.pending_tok, self.cache, self.history = (
                self._tp_spec_decode(
                    self.params, self.cache, self.history, self.pending_tok,
                    self.cos, self.sin, jnp.asarray(active),
                )
            )
        else:
            toks, counts, self.pending_tok, self.cache, self.history = (
                llama.spec_decode_multi(
                    self.params, self.cache, self.history, self.pending_tok,
                    self.cos, self.sin, jnp.asarray(active), self.cfg, n,
                    num_draft=self.spec_decode, ngram=self.spec_ngram,
                    max_len_hint=hint,
                )
            )
        toks_host = np.asarray(toks)  # (B, n, k+1)
        counts_host = np.asarray(counts)  # (B, n) — same single readback
        self.stats.decode_seconds += time.time() - t0
        self._slot_len[active] += counts_host[active].sum(axis=1)
        self.stats.decode_rounds += 1
        for i in range(self.num_slots):
            if active[i]:
                emitted = [
                    int(t)
                    for s in range(n)
                    for t in toks_host[i, s, : counts_host[i, s]]
                ]
                # count only tokens record_tokens actually keeps (a slot may
                # hit its budget / EOS mid-round and discard the overshoot) so
                # decode_tokens / spec_accept_per_step aren't inflated; a
                # verify step likewise only counts if at least one of its
                # tokens was kept (every counted step keeps >= 1 token, so
                # accept-per-step >= 1 by construction and > 1 iff drafts land)
                req = self.sched.slots[i].request
                before = len(req.output) if req is not None else 0
                self._record(i, emitted)
                kept = len(req.output) - before if req is not None else 0
                self.stats.decode_tokens += kept
                remaining = kept
                for s in range(n):
                    if remaining <= 0:
                        break
                    self.stats.spec_steps += 1
                    remaining -= int(counts_host[i, s])

    def _decode_round(self) -> None:
        active = np.asarray(self.sched.active_mask())
        if not active.any():
            return
        active = self._before_decode(active)
        if not active.any():
            return
        n = self.steps_per_round  # FIXED — one compiled program, ever
        if self.spec_decode is not None:
            self._spec_decode_round(active, n)
            return
        t0 = time.time()
        hint = self._round_len_hint(active, n)
        toks = self._decode_call(jnp.asarray(active), n, max_len_hint=hint)
        toks_host = np.asarray(toks)  # (B, n) — the single readback
        self.stats.decode_seconds += time.time() - t0
        self._slot_len[active] += n
        self.stats.decode_rounds += 1
        self.stats.decode_tokens += int(active.sum()) * n
        for i in range(self.num_slots):
            if active[i]:
                # record_tokens caps at the slot's remaining budget; any
                # overshoot tokens of the final round are discarded (their
                # cache appends sit inside the reserved slack).
                self._record(
                    i, [int(t) for t in toks_host[i]],
                    logprobs=None if self._last_logprobs is None
                    else self._last_logprobs[i],
                    topk=None if self._last_topk is None
                    else (self._last_topk[0][i], self._last_topk[1][i]),
                )

    # -- failure recovery -------------------------------------------------------

    def recover_device_state(self) -> None:
        """Rebuild device state after a fault (serving/recovery.py).

        Every running request is preempted back to the queue (newest uid
        first, so ``appendleft`` restores FCFS order), backend resources are
        released, and the KV cache + pending tokens are re-initialized.
        Tokens already recorded stay recorded; re-admission re-prefills
        ``prompt + output`` — the same deterministic-resume path preemption
        uses, so recovered outputs are bit-identical to an un-faulted run.
        """
        running = [
            (i, s.request) for i, s in enumerate(self.sched.slots) if s.request
        ]
        for slot, _req in sorted(running, key=lambda t: t[1].uid, reverse=True):
            self.sched.preempt(slot)
            self._on_retired(slot)
        self.pending_tok = jnp.zeros_like(self.pending_tok)
        if self.history is not None:
            self.history = jnp.zeros_like(self.history)
        self.cache = self._init_cache()
        if self.draft_cache is not None:
            self.draft_cache = self._init_draft_cache()

    def run_resilient(self, **kwargs) -> int:
        """:func:`serving.recovery.run_resilient` on this engine."""
        from starflashattention_tpu.serving import recovery

        return recovery.run_resilient(self, **kwargs)

    # -- public API -----------------------------------------------------------

    def reset_stats(self) -> None:
        """Zero the counters (e.g. after a warmup pass that compiled the
        prefill/decode programs — first-call times are compile, not serving)."""
        self.stats = EngineStats()
        self._submit_time.clear()
        self._first_token_seen.clear()

    def submit(self, req: Request) -> None:
        if not req.sampling.is_greedy and not self.enable_sampling:
            raise ValueError(
                f"request {req.uid} asks for sampling "
                f"(temperature={req.sampling.temperature}) but the engine was "
                "built with enable_sampling=False (greedy-only program)"
            )
        self.sched.submit(req)
        self._submit_time[req.uid] = time.time()

    def run(self) -> None:
        """Drive until all submitted requests complete."""
        while self.sched.has_work:
            self._admit_and_prefill()
            self._decode_round()

    def generate(
        self, prompts: list[list[int]], max_new_tokens: int, eos_token=None,
        sampling: core_sampling.SamplingParams | list | None = None,
        stop: list[list[int]] | None = None,
        on_token=None,
        adapters: list | None = None,
    ):
        """Convenience: submit + run + collect outputs in order. ``sampling``
        is one SamplingParams for all prompts or a per-prompt list; ``stop``
        sequences apply to every prompt (matched tokens are truncated);
        ``on_token(request, token)`` streams tokens as the host loop records
        them (token granularity, round latency)."""
        if sampling is None:
            samp = [core_sampling.GREEDY] * len(prompts)
        elif isinstance(sampling, core_sampling.SamplingParams):
            samp = [sampling] * len(prompts)
        else:
            samp = list(sampling)
        if adapters is None:
            adapters = [None] * len(prompts)
        elif len(adapters) != len(prompts):
            # zip would silently drop trailing prompts (or extra adapters)
            raise ValueError(
                f"adapters has {len(adapters)} entries for {len(prompts)} "
                "prompts — must match 1:1 (use None for base-model requests)"
            )
        if len(samp) != len(prompts):
            raise ValueError(
                f"sampling has {len(samp)} entries for {len(prompts)} prompts"
            )
        reqs = [
            Request(uid=i, prompt=p, max_new_tokens=max_new_tokens,
                    eos_token=eos_token, sampling=s, stop=stop,
                    on_token=on_token, adapter=a)
            for i, (p, s, a) in enumerate(zip(prompts, samp, adapters))
        ]
        for r in reqs:
            self.submit(r)
        self.run()
        return [r.output for r in reqs]


class PagedEngine(Engine):
    """Paged-KV continuous-batching engine (BASELINE config 3 as a serving
    path): decode reads scattered pages via ops/paged_decode, appends via the
    paged windowed-RMW kernel, and physical pages come from a per-sequence
    allocator — the native C++ page pool (native/sfa_runtime.cc:27-93) when
    built, else its Python twin (cache/paged.SeqPagePool)."""

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        num_slots: int = 8,
        steps_per_round: int = 8,
        prefill_pad: int = 64,
        prefill_chunk: int | None = None,
        page_size: int = 128,
        num_pages: int | None = None,
        native: bool | None = None,
        mesh=None,
        enable_sampling: bool = False,
        return_logprobs: bool = False,
        prefix_cache: bool = False,
        debug_validate: bool = False,
        lora_adapters: list | None = None,
        topk_logprobs: int = 0,
    ):
        """With ``mesh`` set, the page pool shards its KV-head axis over the
        model axis and its PAGE axis over the data axis: each data shard owns
        a private pool partition with its own host allocator, and page-table
        ids are LOCAL to the shard (each shard's kernels index only its
        slice). ``num_pages`` is then the PER-DATA-SHARD pool size, and slots
        map to shards by contiguous blocks (slot // slots_per_shard).

        ``prefix_cache=True`` enables automatic prefix caching
        (serving/prefix_cache.py): admissions whose prompt prefix matches
        full pages already in the pool reuse those pages and prefill only
        the suffix — outputs stay bit-identical (greedy and sampled).
        Refcount-0 cached pages stay warm and are evicted (LRU) only under
        pool pressure, before any preemption. Single-pool engines only."""
        if prefix_cache and mesh is not None:
            raise ValueError(
                "prefix_cache is not supported on sharded engines yet "
                "(per-data-shard pools use local page ids)"
            )
        self.page_size = page_size
        self.pages_per_seq = -(-cfg.max_seq_len // page_size)
        self._data_shards = 1 if mesh is None else int(mesh.shape["data"])
        self._slots_per_shard = num_slots // max(self._data_shards, 1)
        # Default pool: every slot can hold a full sequence (+ null page 0).
        self.num_pages = num_pages or self._slots_per_shard * self.pages_per_seq + 1
        self.pools = [
            self._make_pool(self.num_pages, native) for _ in range(self._data_shards)
        ]
        self._handles: dict[int, int] = {}  # slot -> pool handle
        self._admit_order: list[int] = []  # slots by admission recency
        self._host_table = np.zeros((num_slots, self.pages_per_seq), np.int32)
        self._host_len = np.zeros((num_slots,), np.int64)
        self._table_dirty = False
        if prefix_cache:
            from starflashattention_tpu.serving.prefix_cache import PrefixCache

            self._prefix = PrefixCache(page_size)
        else:
            self._prefix = None
        # pages the slot references but the PREFIX STORE owns (refcounted);
        # they precede the slot's private (handle-owned) pages in its table
        self._cached_pages: list[list[int]] = [[] for _ in range(num_slots)]
        self._cached_len = np.zeros((num_slots,), np.int64)
        # Sliding-window rolling buffer: count of leading PRIVATE pages
        # reclaimed per slot (their table entries are null; the windowed
        # kernel's shifted walk never reads below the band). Pool usage per
        # windowed sequence is O(window), not O(generated length).
        self._reclaimed = np.zeros((num_slots,), np.int64)
        # Attention sinks (cfg.attention_sinks): private pages backing the
        # sink region are PINNED — detached from the handle (so prefix
        # releases can free the band behind them) but owned by the engine
        # and written into the table at their logical positions forever.
        self._sink_pages: list[list[int]] = [[] for _ in range(num_slots)]
        # Walk-block granularity — must match paged_flash_decode's ppcb
        # adjustment so reclamation stays strictly below the kernel's walk.
        ppcb = min(cfg.pages_per_compute_block, self.pages_per_seq)
        while self.pages_per_seq % ppcb:
            ppcb -= 1
        self._walk_block_pages = ppcb
        super().__init__(
            params, cfg, num_slots, steps_per_round, prefill_pad,
            prefill_chunk=prefill_chunk, mesh=mesh,
            enable_sampling=enable_sampling, return_logprobs=return_logprobs,
            debug_validate=debug_validate, lora_adapters=lora_adapters,
            topk_logprobs=topk_logprobs,
        )

    @property
    def pool(self):
        """The single-shard allocator (unsharded engines; tests)."""
        assert self._data_shards == 1, "sharded engine has one pool per data shard"
        return self.pools[0]

    def _pool_for(self, slot: int):
        return self.pools[slot // self._slots_per_shard]

    @staticmethod
    def _make_pool(num_pages: int, native: bool | None):
        if native is not False:
            try:
                from starflashattention_tpu.utils.native import NativePagePool

                return NativePagePool(num_pages)
            except Exception:
                if native:
                    raise
        return paged.SeqPagePool(num_pages)

    # -- backend hooks --------------------------------------------------------

    def _build_sharded_fns(self, tp, weight_quant: bool, lm_head_quant: bool = False) -> None:
        self._tp_decode_multi = tp.make_tp_decode_multi_paged(
            self.mesh, self.cfg, self.steps_per_round, weight_quant=weight_quant,
            lm_head_quant=lm_head_quant,
            sampling=self.enable_sampling, with_logprobs=self.return_logprobs,
            topk_logprobs=self.topk_logprobs, lora_stack=self.lora,
        )
        # one shard_map program per chunk index (prefix_len is a static
        # shape), built lazily and memoized — bounded by max_seq/chunk
        fns = {}

        def tp_prefill_for(prefix_len: int):
            fn = fns.get(prefix_len)
            if fn is None:
                fn = fns[prefix_len] = tp.make_tp_prefill_serving_paged(
                    self.mesh, self.cfg, weight_quant=weight_quant,
                    lm_head_quant=lm_head_quant, prefix_len=prefix_len,
                    lora_stack=self.lora,
                )
            return fn

        self._tp_prefill = tp_prefill_for
        self._shard_cache_fn = tp.shard_paged_cache

    def _init_cache(self):
        # MLA pages hold one padded latent row per token (kv_cache_dims)
        hkv, d = self.cfg.kv_cache_dims()
        cache = paged.init_paged_cache(
            self.cfg.num_layers,
            self.num_slots,
            hkv,
            d,
            # the global pool concatenates the data shards' partitions
            num_pages=self.num_pages * self._data_shards,
            page_size=self.page_size,
            pages_per_seq=self.pages_per_seq,
            dtype=jnp.dtype(self.cfg.dtype),
            quant_mode=self.cfg.quant_mode,
            calibration_scale=self.cfg.kv_calibration_scale,
        )
        if self.mesh is not None:
            cache = self._shard_cache_fn(cache, self.mesh)
        return cache

    def _sync_table(self) -> None:
        if self._table_dirty:
            table = jnp.asarray(self._host_table)
            if self.mesh is not None:
                from jax.sharding import NamedSharding

                from starflashattention_tpu.parallel.tp import paged_cache_specs

                table = jax.device_put(
                    table, NamedSharding(self.mesh, paged_cache_specs().page_table)
                )
            self.cache = dataclasses.replace(self.cache, page_table=table)
            self._table_dirty = False

    def _write_row(self, slot: int) -> None:
        row = np.zeros((self.pages_per_seq,), np.int32)
        shared = self._cached_pages[slot]
        row[: len(shared)] = shared
        sink = self._sink_pages[slot]
        row[len(shared) : len(shared) + len(sink)] = sink
        if slot in self._handles:
            pages = self._pool_for(slot).seq_pages(self._handles[slot])
            # reclaimed (out-of-window) logical pages stay null between the
            # shared-prefix/pinned-sink pages and the handle's surviving tail
            off = len(shared) + len(sink) + int(self._reclaimed[slot])
            row[off : off + len(pages)] = pages
        self._host_table[slot] = row
        self._table_dirty = True

    def _grow(self, slot: int, new_len: int) -> bool:
        """Extend the slot's page list to cover ``new_len`` tokens; False on
        pool exhaustion (caller decides who to preempt). Prefix-cache pages
        already cover the slot's first ``_cached_len`` tokens and reclaimed
        window pages need no backing, so only the private tail grows; under
        pressure, warm (refcount-0) cached pages are evicted back to the
        allocator BEFORE giving up."""
        private = max(
            int(new_len)
            - int(self._cached_len[slot])
            - (len(self._sink_pages[slot]) + int(self._reclaimed[slot]))
            * self.page_size,
            0,
        )
        pool = self._pool_for(slot)
        while True:
            try:
                pool.seq_extend(self._handles[slot], private, self.page_size)
                break
            except MemoryError:
                if self._prefix is None:
                    return False
                evicted = self._prefix.evict_lru(8)
                if not evicted:
                    return False
                pool.free_raw(evicted)
        self._write_row(slot)
        return True

    def _release(self, slot: int) -> None:
        handle = self._handles.pop(slot, None)
        if handle is not None:
            self._pool_for(slot).seq_free(handle)
        if self._sink_pages[slot]:
            self._pool_for(slot).free_raw(self._sink_pages[slot])
            self._sink_pages[slot] = []
        if self._prefix is not None and self._cached_pages[slot]:
            self._prefix.release(self._cached_pages[slot])
        self._cached_pages[slot] = []
        self._cached_len[slot] = 0
        self._reclaimed[slot] = 0
        if slot in self._admit_order:
            self._admit_order.remove(slot)
        self._host_len[slot] = 0
        self._write_row(slot)  # zero row -> null page 0; device sees it
        # before the next decode round (_sync_table), so a reused physical
        # page can never receive a stale slot's append.

    def _on_retired(self, slot: int) -> None:
        self._release(slot)

    def _preempt_youngest(
        self, but_not: int | None = None, shard: int | None = None
    ) -> int | None:
        """Free the most recently admitted running slot's pages; requeue its
        request. ``shard`` restricts candidates to one data shard's pool
        (preempting a slot on another shard frees nothing useful). Returns
        the slot, or None if there is no candidate."""
        for slot in reversed(self._admit_order):
            if slot == but_not:
                continue
            if shard is not None and slot // self._slots_per_shard != shard:
                continue
            self.sched.preempt(slot)
            self._release(slot)
            self.stats.preemptions += 1
            return slot
        return None

    def _prepare_admit(self, admitted):
        """Allocate pages for each admitted prompt; on the first miss, THIS
        and every later admission goes back to the queue front in FCFS order
        (preempted in reverse so appendleft restores the original order).
        With the prefix cache on, each prompt first reuses its longest run
        of already-resident full pages and allocates only the remainder."""
        accepted, rejected = [], []
        exhausted = False
        for slot, req in admitted:
            if not exhausted:
                text = req.prompt + req.output
                if self._prefix is not None:
                    pages, matched = self._prefix.match(text)
                    self._cached_pages[slot] = pages
                    self._cached_len[slot] = matched
                self._handles[slot] = self._pool_for(slot).seq_new()
                need = len(text)
                if self._grow(slot, need):
                    self._admit_order.append(slot)
                    self._host_len[slot] = need
                    accepted.append((slot, req))
                    continue
                self._pool_for(slot).seq_free(self._handles.pop(slot))
                if self._prefix is not None and self._cached_pages[slot]:
                    self._prefix.release(self._cached_pages[slot])
                self._cached_pages[slot] = []
                self._cached_len[slot] = 0
                exhausted = True
            rejected.append(slot)
        for slot in reversed(rejected):
            self.sched.preempt(slot)  # back to queue front, slot freed
        self.stats.prefix_hits = self._prefix.hits if self._prefix else 0
        self.stats.prefix_tokens_reused = (
            self._prefix.tokens_reused if self._prefix else 0
        )
        return accepted

    def _admission_offsets(self, texts) -> np.ndarray:
        """Prefix-cache hits skip their cached tokens at prefill; their
        device cache length must equal the cached token count BEFORE the
        (reset=False) suffix prefill reads it as the write offset."""
        offs = np.zeros((self.num_slots,), np.int32)
        if self._prefix is None:
            return offs
        mask = np.zeros((self.num_slots,), bool)
        for slot, _req, _text in texts:
            offs[slot] = int(self._cached_len[slot])
            mask[slot] = offs[slot] > 0
        if mask.any():
            self.cache = dataclasses.replace(
                self.cache,
                lengths=jnp.where(
                    jnp.asarray(mask), jnp.asarray(offs), self.cache.lengths
                ),
            )
        return offs

    def _after_prefill(self, texts) -> None:
        """Publish each admitted prompt's freshly-written full pages to the
        prefix store (ownership moves out of the slot's handle; the slot
        keeps a reference). Chain keys cover PROMPT tokens only — generated
        tokens never enter the store."""
        if self._prefix is None:
            return
        for slot, req, _text in texts:
            if slot not in self._handles:
                continue  # already retired this round (can't happen today)
            have = len(self._cached_pages[slot])
            n_full = len(req.prompt) // self.page_size
            run = self._prefix.insert_run(req.prompt, have, n_full - have)
            if run <= 0:
                continue
            pool = self._pool_for(slot)
            transfer = pool.seq_release_prefix(self._handles[slot], run)
            adopted = self._prefix.insert(req.prompt, have, transfer)
            assert len(adopted) == run, "insert_run promised these keys were new"
            self._cached_pages[slot].extend(adopted)
            self._cached_len[slot] += run * self.page_size
            # table row contents are unchanged (same physical ids, same
            # order) — no _write_row needed

    def _reclaim_window(self, active: np.ndarray) -> None:
        """Sliding-window rolling buffer: free private pages that fall fully
        below every future page walk. The windowed kernel starts each
        sequence's walk at ``max(len - window, 0) // bk`` blocks (bk =
        walk_block_pages · page_size) and the start is monotone in ``len``,
        so pages below the CURRENT start are dead forever — return them to
        the allocator and null their table entries. Runs before this round's
        growth so reclaimed pages immediately back new allocations."""
        w = self.cfg.sliding_window
        if w is None:
            return
        if self.cfg.sliding_window_pattern != 1:
            # Gemma-2-class alternating layers: the FULL-attention layers
            # still walk every page, so rolling-buffer reclamation would
            # free pages they read — pool usage stays O(len) here
            return
        wp = self._walk_block_pages
        bk = wp * self.page_size
        # logical pages the kernel's prepended sink walk keeps visiting —
        # never freed (pinned into _sink_pages instead)
        sink_lp = (-(-self.cfg.attention_sinks // bk)) * wp \
            if self.cfg.attention_sinks else 0
        for slot in list(self._admit_order):
            if not active[slot] or slot not in self._handles:
                continue
            pre_len = int(self._host_len[slot])  # pre-round: conservative
            start_blk = max(pre_len - w, 0) // bk
            freeable = start_blk * wp  # logical pages strictly below the band
            p0 = int(self._cached_len[slot]) // self.page_size
            pool = self._pool_for(slot)
            handle = self._handles[slot]
            changed = False
            # first logical page still owned by the handle
            cur = p0 + len(self._sink_pages[slot]) + int(self._reclaimed[slot])
            pin = min(
                max(min(freeable, sink_lp) - cur, 0),
                len(pool.seq_pages(handle)),
            )
            if pin > 0:
                self._sink_pages[slot].extend(
                    pool.seq_release_prefix(handle, pin)
                )
                cur += pin
                changed = True
            n = max(freeable - max(cur, sink_lp), 0)
            n = min(n, len(pool.seq_pages(handle)))
            if n > 0:
                pool.free_raw(pool.seq_release_prefix(handle, n))
                self._reclaimed[slot] += n
                changed = True
            if changed:
                self._write_row(slot)

    def _before_decode(self, active: np.ndarray) -> np.ndarray:
        """Grow every active slot to cover this round's appends; preempt the
        youngest slots on exhaustion (their requests resume later)."""
        active = active.copy()
        self._reclaim_window(active)
        for slot in list(self._admit_order):  # oldest first
            if not active[slot]:
                continue
            need = int(self._host_len[slot]) + self.steps_per_round
            while not self._grow(slot, need):
                victim = self._preempt_youngest(
                    but_not=slot, shard=slot // self._slots_per_shard
                )
                if victim is None:
                    raise MemoryError(
                        f"paged pool too small for one sequence: slot {slot} "
                        f"needs {need} tokens, pool {self.num_pages - 1} pages "
                        f"x {self.page_size}"
                    )
                active[victim] = False
                if not self.sched.slots[slot].request:
                    break  # slot itself got preempted (shouldn't happen)
        for slot in range(self.num_slots):
            if active[slot]:
                self._host_len[slot] += self.steps_per_round
        if self.debug_validate:
            self._validate_tables(active)
        self._sync_table()
        return active

    def _validate_tables(self, active: np.ndarray) -> None:
        """Sanitizer pass (utils/sanitize.py): page aliasing across live
        slots, out-of-range/null ids, and append-window capacity — run on
        the exact host table the next decode round will consume."""
        from starflashattention_tpu.utils import sanitize

        shard_of = np.arange(self.num_slots) // self._slots_per_shard
        # _host_len already includes this round's appends for active slots;
        # the table was grown to cover them, so validate at that length.
        # Reclaimed (nulled) out-of-window entries sit between the shared
        # prefix and the first surviving private page.
        reclaimed_below = None
        if self.cfg.sliding_window is not None:
            sink_kept = np.asarray(
                [len(s) for s in self._sink_pages], np.int64
            )
            reclaimed_below = (
                self._cached_len // self.page_size + sink_kept + self._reclaimed
            )
        sanitize.check_page_table(
            self._host_table, self._host_len, self.page_size, self.num_pages,
            active=active, shard_of=shard_of,
            shared_ok=self._prefix.resident_set() if self._prefix else None,
            reclaimed_below=reclaimed_below,
        )
        pre = np.where(active, self._host_len - self.steps_per_round, 0)
        sanitize.check_append_window(
            pre, self.steps_per_round, self.pages_per_seq * self.page_size
        )

    def _prefill_call(self, toks, new_lengths, admit_mask, reset_mask, prefix_len=0):
        self._sync_table()
        if self.mesh is not None:
            pf_args = (self.params, self.cache, toks, new_lengths, admit_mask,
                       reset_mask, self.cos, self.sin)
            if self.lora is not None:
                pf_args = pf_args + (self.lora, self._lora_sel())
            logits, self.cache = self._tp_prefill(prefix_len)(*pf_args)
            return logits
        logits, self.cache = llama.prefill_serving_paged(
            self.params, self.cache, toks, new_lengths, admit_mask,
            reset_mask, self.cos, self.sin, self.cfg, prefix_len=prefix_len,
            lora=self.lora, lora_sel=self._lora_sel(),
        )
        return logits

    def _decode_call(self, active, n, max_len_hint=None):
        if self.mesh is not None:
            args = (self.params, self.cache, self.pending_tok,
                    self.cos, self.sin, active)
            if self.enable_sampling:
                args = args + (self._sampling_state(),)
            if self.lora is not None:
                args = args + (self.lora, self._lora_sel())
            out = self._tp_decode_multi(*args)
        else:
            out = llama.decode_multi_paged(
                self.params, self.cache, self.pending_tok,
                self.cos, self.sin, active, self.cfg, n,
                topk_logprobs=self.topk_logprobs,
                lora=self.lora, lora_sel=self._lora_sel(),
                sampling=self._sampling_state(),
                with_logprobs=self.return_logprobs,
                max_len_hint=max_len_hint,
            )
        return self._unpack_decode(out)
