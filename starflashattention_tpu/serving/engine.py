"""Continuous-batching engine: drives jitted steps over scheduler slots.

Loop shape (host): admit → masked prefill of new slots → N decode steps in
one program → one readback → record/retire → repeat. Device work is always
the same two static-shape programs regardless of which slots are live, so
nothing recompiles as requests come and go — the TPU-native answer to
varying workloads (the reference recompiles per Traits config instead,
SURVEY.md §2.8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from starflashattention_tpu.cache import contiguous
from starflashattention_tpu.models import llama
from starflashattention_tpu.runtime.params import ModelConfig
from starflashattention_tpu.serving.scheduler import Request, Scheduler


class Engine:
    def __init__(
        self,
        params,
        cfg: ModelConfig,
        num_slots: int = 8,
        steps_per_round: int = 8,
        prefill_pad: int = 64,
    ):
        self.params = params
        self.cfg = cfg
        self.num_slots = num_slots
        self.steps_per_round = steps_per_round
        self.prefill_pad = prefill_pad
        # Rounds are FIXED-SIZE so exactly two program shapes exist per
        # prompt-pad bucket (one prefill, one decode_multi) — a variable
        # round length would recompile per distinct value, which dominates
        # wall-clock through the remote compiler. The slack reserves cache
        # room for the final round's discarded overshoot tokens.
        self.sched = Scheduler(num_slots, cfg.max_seq_len, capacity_slack=steps_per_round - 1)
        self.cache = contiguous.init_cache(
            cfg.num_layers,
            num_slots,
            cfg.num_kv_heads,
            cfg.max_seq_len,
            cfg.head_dim,
            dtype=jnp.dtype(cfg.dtype),
            quant_mode=cfg.quant_mode,
        )
        self.cos, self.sin = llama.rope_tables(cfg)
        self.pending_tok = jnp.zeros((num_slots,), jnp.int32)
        self._host_lengths = np.zeros((num_slots,), np.int64)  # host mirror

    # -- one scheduling round -------------------------------------------------

    def _admit_and_prefill(self) -> None:
        admitted = self.sched.admit()
        if not admitted:
            return
        pad = max(len(r.prompt) for _, r in admitted)
        pad = -(-pad // self.prefill_pad) * self.prefill_pad  # quantize shapes
        toks = np.zeros((self.num_slots, pad), np.int32)
        new_lengths = np.zeros((self.num_slots,), np.int32)
        admit_mask = np.zeros((self.num_slots,), bool)
        for slot, req in admitted:
            toks[slot, : len(req.prompt)] = req.prompt
            new_lengths[slot] = len(req.prompt)
            admit_mask[slot] = True
            self._host_lengths[slot] = len(req.prompt)

        logits, self.cache = llama.prefill_serving(
            self.params,
            self.cache,
            jnp.asarray(toks),
            jnp.asarray(new_lengths),
            jnp.asarray(admit_mask),
            self.cos,
            self.sin,
            self.cfg,
        )
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        self.pending_tok = jnp.where(jnp.asarray(admit_mask), first, self.pending_tok)
        # record the first generated token of each admitted request
        first_host = np.asarray(first)
        for slot, _req in admitted:
            self.sched.record_tokens(slot, [int(first_host[slot])])
            if not self.sched.slots[slot].free:
                self._host_lengths[slot] += 0  # token enters cache on next decode

    def _decode_round(self) -> None:
        active = np.asarray(self.sched.active_mask())
        if not active.any():
            return
        n = self.steps_per_round  # FIXED — one compiled program, ever
        toks, self.pending_tok, self.cache = llama.decode_multi(
            self.params,
            self.cache,
            self.pending_tok,
            self.cos,
            self.sin,
            jnp.asarray(active),
            self.cfg,
            n,
        )
        toks_host = np.asarray(toks)  # (B, n) — the single readback
        for i in range(self.num_slots):
            if active[i]:
                self._host_lengths[i] += n
                # record_tokens caps at the slot's remaining budget; any
                # overshoot tokens of the final round are discarded (their
                # cache appends sit inside the reserved slack).
                self.sched.record_tokens(i, [int(t) for t in toks_host[i]])

    # -- public API -----------------------------------------------------------

    def submit(self, req: Request) -> None:
        self.sched.submit(req)

    def run(self) -> None:
        """Drive until all submitted requests complete."""
        while self.sched.has_work:
            self._admit_and_prefill()
            self._decode_round()

    def generate(self, prompts: list[list[int]], max_new_tokens: int, eos_token=None):
        """Convenience: submit + run + collect outputs in order."""
        reqs = [
            Request(uid=i, prompt=p, max_new_tokens=max_new_tokens, eos_token=eos_token)
            for i, p in enumerate(prompts)
        ]
        for r in reqs:
            self.submit(r)
        self.run()
        return [r.output for r in reqs]
