"""Per-request token sampling: temperature / top-k / top-p, deterministic.

The reference's serving surface is greedy-only (its golden model argmaxes
logits, examples/python/testFlashDecoder.py:92-94); real serving needs
per-request sampling controls. This module is the TPU-native version:

- **Batched, per-slot parameters.** One (B,)-vector each of temperature,
  top_k, top_p and seed rides into the jitted decode program as ordinary
  operands, so one compiled program serves any mix of greedy and sampled
  requests — no per-request recompiles (program shapes are the serving
  engine's whole design, serving/engine.py module doc).

- **Deterministic in (seed, position).** The PRNG key for the token at
  absolute position ``p`` is ``fold_in(PRNGKey(seed), p)``. Preemption and
  failure recovery replay a request by re-prefilling ``prompt + output``
  (serving/scheduler.py:76-87); the next token's position — and therefore
  its key — is unchanged by the replay, so sampled requests resume
  bit-identically, exactly like greedy ones.

- **Gumbel-max over a thresholded vocab.** Top-k and top-p both reduce to
  "keep logits >= a per-row threshold", computed from one descending sort
  of the scaled logits; sampling is then ``argmax(masked + gumbel)``. The
  sort is the only O(V log V) cost and exists only in the sampled program
  variant — engines built without sampling compile the argmax-only program
  (the benched hot path is untouched).

Greedy rows (temperature <= 0) bypass the noise entirely and bit-match
``jnp.argmax`` (tests/test_sampling.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Host-side per-request sampling controls (serving/scheduler.Request).

    temperature <= 0 means greedy; top_k <= 0 means no top-k cut; top_p >= 1
    means no nucleus cut; min_p <= 0 means no min-p cut (min_p keeps tokens
    whose probability is >= min_p times the most likely token's — a
    max-relative floor that adapts to the distribution's confidence).
    ``seed`` makes the request's whole trajectory deterministic (see module
    doc).
    """

    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    min_p: float = 0.0
    seed: int = 0

    @property
    def is_greedy(self) -> bool:
        return self.temperature <= 0.0


GREEDY = SamplingParams()


def state_arrays(params_list: list[SamplingParams]) -> dict[str, np.ndarray]:
    """Pack per-slot SamplingParams into the (B,) operand arrays."""
    return {
        "temperature": np.array([p.temperature for p in params_list], np.float32),
        "top_k": np.array([p.top_k for p in params_list], np.int32),
        "top_p": np.array([p.top_p for p in params_list], np.float32),
        "min_p": np.array([p.min_p for p in params_list], np.float32),
        "seed": np.array([p.seed for p in params_list], np.uint32),
    }


def sample_tokens(
    logits: jax.Array,  # (B, V)
    state: dict,  # {"temperature","top_k","top_p","seed"}: (B,) each
    position: jax.Array,  # (B,) absolute position of the token being drawn
) -> jax.Array:
    """Draw one token per row → (B,) int32. Jit-safe, fixed shapes.

    Rows with temperature <= 0 return exactly ``argmax(logits)``. Sampled
    rows apply temperature, intersect the top-k and top-p (nucleus) cuts,
    and draw via Gumbel-max with key ``fold_in(PRNGKey(seed), position)``.
    """
    v = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temperature = state["temperature"].astype(jnp.float32)
    top_k = state["top_k"].astype(jnp.int32)
    top_p = state["top_p"].astype(jnp.float32)
    min_p = state.get("min_p")
    min_p = (jnp.zeros_like(top_p) if min_p is None
             else min_p.astype(jnp.float32))
    seed = state["seed"].astype(jnp.uint32)

    sampled_row = temperature > 0.0
    safe_t = jnp.where(sampled_row, temperature, 1.0)
    scaled = logits / safe_t[:, None]

    # One descending sort serves both cuts (they are order statistics).
    sorted_desc = -jnp.sort(-scaled, axis=-1)
    k = jnp.where(top_k > 0, jnp.clip(top_k, 1, v), v)
    thresh_k = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Nucleus rule: keep the smallest prefix whose mass reaches top_p. A
    # token is kept iff the mass BEFORE it is still < top_p — this always
    # keeps the first token, even for top_p == 0.
    keep = (cum - probs) < top_p[:, None]
    num_keep = jnp.maximum(jnp.sum(keep, axis=-1), 1)
    thresh_p = jnp.take_along_axis(sorted_desc, (num_keep - 1)[:, None], axis=-1)
    thresh = jnp.maximum(thresh_k, thresh_p)
    # min-p: prob >= min_p * p_max  <=>  scaled >= scaled_max + log(min_p)
    # (the log-sum-exp cancels) — no extra softmax needed.
    thresh_m = jnp.where(
        min_p > 0.0,
        sorted_desc[:, 0] + jnp.log(jnp.maximum(min_p, 1e-37)),
        -jnp.inf,
    )[:, None]
    thresh = jnp.maximum(thresh, thresh_m)
    masked = jnp.where(scaled >= thresh, scaled, -jnp.inf)

    def draw(row, s, p):
        key = jax.random.fold_in(jax.random.PRNGKey(s), p)
        return jnp.argmax(row + jax.random.gumbel(key, (v,), jnp.float32))

    sampled = jax.vmap(draw)(masked, seed, position).astype(jnp.int32)
    return jnp.where(sampled_row, sampled, greedy)


@jax.jit
def sample_tokens_jit(logits, state, position):
    """Host-callable jitted wrapper (engines sample prefill first-tokens)."""
    return sample_tokens(logits, state, position)
