"""Failure detection + recovery for the serving engines.

The reference has no recovery story (SURVEY.md §5: "failure detection /
elastic recovery — ABSENT"; its error handling is print-and-return,
flash_attn.cu:980-991). A TPU serving deployment needs one, and the paged
engine's preemption mechanics already contain the key insight: **greedy
decoding is deterministic, so the only state worth persisting is the
host-side request ledger** (prompt + tokens generated so far). The multi-GB
device KV cache is never checkpointed — re-prefilling ``prompt + output``
reproduces it exactly, the same path preemption-resume already exercises and
tests.

Two layers:

- :func:`save_state` / :func:`load_state` — crash-consistent JSON snapshot
  of queued + running + finished requests. Survives a host restart; the new
  process builds a fresh engine (weights from the model checkpoint,
  models/checkpoint.py) and resumes mid-generation.
- :func:`run_resilient` — the in-process driver: runs the engine's normal
  admit→prefill→decode rounds, and on a device fault (XLA runtime error, or
  a :class:`~starflashattention_tpu.utils.sanitize.NumericFault` raised by
  debug validation) **recovers in place**: every running request is preempted
  back to the queue, device state (cache, pending tokens) is re-initialized,
  and the loop continues — tokens already recorded are kept, nothing is
  recomputed except the lost round. Consecutive faults beyond ``max_faults``
  re-raise (a persistently sick chip should escalate, not spin).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Callable

from starflashattention_tpu.core.sampling import GREEDY, SamplingParams
from starflashattention_tpu.serving.scheduler import Request
from starflashattention_tpu.utils.sanitize import NumericFault, PageTableRace

# Fault classes the resilient loop treats as recoverable. XLA device errors
# (jaxlib XlaRuntimeError) subclass RuntimeError; NumericFault/PageTableRace
# do too. ValueError/TypeError etc. are PROGRAMMING errors and propagate.
RECOVERABLE = (RuntimeError,)


def _req_to_dict(req: Request) -> dict:
    d = {
        "uid": req.uid,
        "prompt": list(req.prompt),
        "max_new_tokens": req.max_new_tokens,
        "eos_token": req.eos_token,
        "output": list(req.output),
        "done": req.done,
    }
    if req.sampling != GREEDY:
        # Sampled trajectories resume deterministically too: the key is
        # (seed, position), both of which the ledger reconstructs.
        d["sampling"] = dataclasses.asdict(req.sampling)
    if req.logprobs:
        d["logprobs"] = list(req.logprobs)
    if req.adapter is not None:
        # multi-LoRA: without this a restored request would silently
        # resume on the BASE model and diverge from its pre-crash stream
        d["adapter"] = req.adapter
    if req.topk:
        # top-K alternatives must stay aligned with ``output`` across a
        # save/restore — dropping them would leave a restored request with
        # topk == [] while output keeps its pre-crash tokens (the same
        # misalignment the logprobs serialization exists to prevent)
        d["topk"] = [[list(ids), list(vals)] for ids, vals in req.topk]
    return d


def _req_from_dict(d: dict) -> Request:
    return Request(
        uid=d["uid"],
        prompt=list(d["prompt"]),
        max_new_tokens=d["max_new_tokens"],
        eos_token=d["eos_token"],
        sampling=SamplingParams(**d["sampling"]) if "sampling" in d else GREEDY,
        output=list(d["output"]),
        logprobs=list(d.get("logprobs", [])),
        done=d["done"],
        adapter=d.get("adapter"),
        topk=[(list(ids), list(vals)) for ids, vals in d.get("topk", [])],
    )


def snapshot(engine) -> dict:
    """Serializable ledger of every request the engine knows about.

    Running slots are snapshotted as *resumable* requests (their generated
    tokens ride along in ``output``); device state is deliberately excluded.
    """
    running = [
        _req_to_dict(slot.request)
        for slot in engine.sched.slots
        if slot.request is not None
    ]
    queued = [_req_to_dict(r) for r in engine.sched.queue]
    finished = [
        _req_to_dict(r) for r in getattr(engine, "_finished_requests", [])
    ]
    return {
        "version": 1,
        "running": running,
        "queued": queued,
        "finished": finished,
        "stats": engine.stats.summary(),
    }


def save_state(engine, path: str | os.PathLike) -> None:
    """Atomically write :func:`snapshot` to ``path`` (write + rename, so a
    crash mid-save leaves the previous snapshot intact)."""
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_text(json.dumps(snapshot(engine)))
    os.replace(tmp, path)


def load_state(engine, path: str | os.PathLike) -> list[Request]:
    """Resubmit a snapshot's unfinished requests into a FRESH engine.

    Previously-running requests go first (they were admitted earlier under
    FCFS), then the queued ones. Returns all restored request objects —
    finished ones included — in uid order so callers can collect outputs.
    """
    state = json.loads(Path(path).read_text())
    if state.get("version") != 1:
        raise ValueError(f"unknown snapshot version {state.get('version')!r}")
    restored = []
    for d in state["running"] + state["queued"]:
        req = _req_from_dict(d)
        engine.submit(req)
        restored.append(req)
    finished = [_req_from_dict(d) for d in state["finished"]]
    return sorted(finished + restored, key=lambda r: r.uid)


def run_resilient(
    engine,
    max_faults: int = 3,
    checkpoint_path: str | os.PathLike | None = None,
    checkpoint_every: int = 1,
    on_fault: Callable[[BaseException], None] | None = None,
) -> int:
    """Drive the engine to completion, recovering from device faults.

    After every ``checkpoint_every`` rounds the request ledger is saved to
    ``checkpoint_path`` (if given) — a crash at any point loses at most one
    round of generated tokens. Returns the number of faults recovered from.
    """
    faults = 0
    consecutive = 0
    rounds = 0
    while engine.sched.has_work:
        try:
            engine._admit_and_prefill()
            engine._decode_round()
            consecutive = 0
        except RECOVERABLE as e:  # noqa: PERF203 — recovery IS the point
            faults += 1
            consecutive += 1
            if on_fault is not None:
                on_fault(e)
            if consecutive > max_faults:
                raise
            engine.recover_device_state()
        rounds += 1
        if checkpoint_path is not None and rounds % checkpoint_every == 0:
            save_state(engine, checkpoint_path)
    if checkpoint_path is not None:
        save_state(engine, checkpoint_path)
    return faults


__all__ = [
    "NumericFault",
    "PageTableRace",
    "RECOVERABLE",
    "load_state",
    "run_resilient",
    "save_state",
    "snapshot",
]
