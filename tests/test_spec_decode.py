"""Speculative decoding: verify attention, block append, drafting, and the
end-to-end greedy-equivalence invariant (spec output == plain argmax output).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starflashattention_tpu.cache import contiguous
from starflashattention_tpu.core import drafting
from starflashattention_tpu.models import llama
from starflashattention_tpu.ops import cache_append
from starflashattention_tpu.ops.flash_decode import flash_verify
from starflashattention_tpu.runtime.params import ModelConfig


def _softmax(x):
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)


def _ref_verify(q, k, v, lengths):
    """Staircase-mask multi-query attention, straight numpy."""
    b, hq, t, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    out = np.zeros((b, hq, t, d), np.float32)
    for bi in range(b):
        for h in range(hq):
            kk, vv = k[bi, h // g], v[bi, h // g]
            for j in range(t):
                lim = int(lengths[bi]) + j
                s = (q[bi, h, j] @ kk[:lim].T) / np.sqrt(d)
                out[bi, h, j] = _softmax(s[None])[0] @ vv[:lim]
    return out


def test_flash_verify_matches_reference(rng):
    b, hq, hkv, t, s, d = 3, 4, 2, 5, 64, 16
    q = rng.normal(size=(b, hq, t, d)).astype(np.float32)
    k = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    v = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    lengths = np.array([7, 30, 60 - t + 1], np.int32)  # row t-1 stays in range
    out = flash_verify(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths)
    )
    ref = _ref_verify(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_flash_verify_first_row_matches_decode(rng):
    """Row 0 of a verify step IS a decode step (same kernel geometry)."""
    from starflashattention_tpu.ops.flash_decode import flash_decode

    b, hq, hkv, t, s, d = 2, 4, 2, 4, 64, 16
    q = rng.normal(size=(b, hq, t, d)).astype(np.float32)
    k = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    v = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    lengths = jnp.asarray(np.array([13, 41], np.int32))
    out = flash_verify(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), lengths)
    dec = flash_decode(
        jnp.asarray(q[:, :, 0]), jnp.asarray(k), jnp.asarray(v), lengths,
        num_splits=1,
    )
    np.testing.assert_allclose(
        np.asarray(out[:, :, 0]), np.asarray(dec), rtol=1e-6, atol=1e-6
    )


def test_append_block_kv(rng):
    l, b, hkv, s, d, t = 2, 3, 2, 64, 16, 5
    k_tab = rng.normal(size=(l, b, hkv, s, d)).astype(np.float32)
    v_tab = rng.normal(size=(l, b, hkv, s, d)).astype(np.float32)
    k_new = rng.normal(size=(b, hkv, t, d)).astype(np.float32)
    v_new = rng.normal(size=(b, hkv, t, d)).astype(np.float32)
    pos = np.array([0, 30, 59], np.int32)  # includes a window-straddling row
    n_valid = np.array([t, 0, 3], np.int32)  # full, none, partial
    k_out, v_out = cache_append.append_block_kv(
        jnp.asarray(k_tab), jnp.asarray(v_tab),
        jnp.asarray(k_new), jnp.asarray(v_new),
        1, jnp.asarray(pos), jnp.asarray(n_valid),
    )
    k_ref, v_ref = k_tab.copy(), v_tab.copy()
    for bi in range(b):
        n = int(n_valid[bi])
        k_ref[1, bi, :, pos[bi] : pos[bi] + n] = k_new[bi, :, :n]
        v_ref[1, bi, :, pos[bi] : pos[bi] + n] = v_new[bi, :, :n]
    np.testing.assert_array_equal(np.asarray(k_out), k_ref)
    np.testing.assert_array_equal(np.asarray(v_out), v_ref)


def test_propose_drafts_finds_repeat():
    # history: ... 5 6 7 8 ... 5 6 | key (5,6) recurs; draft must be (7, 8, ...)
    hist = np.zeros((1, 32), np.int32)
    seq = [1, 5, 6, 7, 8, 9, 2, 3, 5, 6]
    hist[0, : len(seq)] = seq
    length = np.array([len(seq) - 1], np.int32)  # pending = 6 at position 9
    draft = drafting.propose_drafts(
        jnp.asarray(hist), jnp.asarray(length), jnp.asarray([6], jnp.int32),
        num_draft=3, ngram=2,
    )
    np.testing.assert_array_equal(np.asarray(draft)[0], [7, 8, 9])


def test_propose_drafts_no_match_falls_back():
    hist = np.zeros((1, 32), np.int32)
    hist[0, :4] = [1, 2, 3, 4]
    draft = drafting.propose_drafts(
        jnp.asarray(hist), jnp.asarray([3], jnp.int32),
        jnp.asarray([4], jnp.int32), num_draft=2, ngram=2,
    )
    np.testing.assert_array_equal(np.asarray(draft)[0], [4, 4])


def test_propose_drafts_longest_match_backoff():
    """The trailing 3-gram (5,6,7) recurs once (followed by 9); the trailing
    2-gram (6,7) ALSO recurs later (followed by 1). Longest-match backoff
    must draft from the 3-gram's continuation, not the more recent but
    shorter 2-gram match."""
    hist = np.zeros((1, 64), np.int32)
    seq = [5, 6, 7, 9, 4, 2, 6, 7, 1, 3, 8, 5, 6, 7]
    hist[0, : len(seq)] = seq
    length = np.array([len(seq) - 1], np.int32)  # pending = 7 at position 13
    draft = drafting.propose_drafts(
        jnp.asarray(hist), jnp.asarray(length), jnp.asarray([7], jnp.int32),
        num_draft=2, ngram=3,
    )
    np.testing.assert_array_equal(np.asarray(draft)[0], [9, 4])

    # and when the long key has no earlier occurrence, it backs off: with
    # ngram=3 and only (6,7) recurring, the 2-gram match drives the draft
    hist2 = np.zeros((1, 64), np.int32)
    seq2 = [4, 6, 7, 1, 3, 8, 2, 6, 7]
    hist2[0, : len(seq2)] = seq2
    draft2 = drafting.propose_drafts(
        jnp.asarray(hist2), jnp.asarray([len(seq2) - 1], jnp.int32),
        jnp.asarray([7], jnp.int32), num_draft=2, ngram=3,
    )
    np.testing.assert_array_equal(np.asarray(draft2)[0], [1, 3])


def test_autotune_peek_apis(tmp_path):
    """peek_decode / peek_int4_group return memoized winners without
    measuring, and None on a miss — the deadline-bound headline bench's
    consumption contract (bench.py)."""
    import json as _json

    from starflashattention_tpu.runtime.autotune import DecodeAutotuner

    path = tmp_path / "cache.json"
    path.write_text(_json.dumps({
        f"{jax.default_backend()}:b16hq32hkv8s1024d128:bfloat16":
            {"num_splits": 1, "block_k": 64, "batch_block": 16},
        f"int4group:{jax.default_backend()}:h4096o4096": {"group": 128},
    }))
    tuner = DecodeAutotuner(cache_path=path)
    pick = tuner.peek_decode(16, 32, 8, 1024, 128, jnp.bfloat16)
    assert (pick.num_splits, pick.block_k, pick.batch_block) == (1, 64, 16)
    assert tuner.peek_decode(16, 32, 8, 2048, 128, jnp.bfloat16) is None
    assert tuner.peek_int4_group(4096, 4096) == 128
    assert tuner.peek_int4_group(11008, 4096) is None


def _greedy_tokens(params, cfg, cache, prompts, plens, cos, sin, n):
    logits, cache = llama.prefill(
        params, cache, prompts, plens, cos, sin, cfg
    )
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    active = jnp.ones((prompts.shape[0],), bool)
    toks, _tok, _cache = llama.decode_multi(
        params, cache, tok, cos, sin, active, cfg, n
    )
    return np.concatenate([np.asarray(tok)[:, None], np.asarray(toks)], axis=1)


@pytest.mark.parametrize("quant_mode", ["none", "int8"])
def test_spec_decode_matches_greedy(rng, quant_mode):
    cfg = ModelConfig.tiny(dtype="float32", num_splits=1, quant_mode=quant_mode)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    b = 2
    plen = 6
    # repetitive prompts so prompt-lookup actually accepts something
    prompts = np.tile(np.array([[7, 8, 9, 7, 8, 9]], np.int32), (b, 1))
    prompts[1] = [3, 4, 3, 4, 3, 4]
    plens = jnp.full((b,), plen, jnp.int32)

    def fresh_cache():
        return contiguous.init_cache(
            cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
            dtype=jnp.float32, quant_mode=cfg.quant_mode,
            calibration_scale=cfg.kv_calibration_scale,
        )

    cos, sin = llama.rope_tables(cfg)
    n_plain = 24
    ref = _greedy_tokens(
        params, cfg, fresh_cache(), jnp.asarray(prompts), plens, cos, sin,
        n_plain - 1,
    )

    # spec path: prefill, then speculative rounds
    cache = fresh_cache()
    logits, cache = llama.prefill(
        params, cache, jnp.asarray(prompts), plens, cos, sin, cfg
    )
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    history = np.zeros((b, cfg.max_seq_len), np.int32)
    history[:, :plen] = prompts
    active = jnp.ones((b,), bool)
    toks, counts, _tok, _cache, _hist = llama.spec_decode_multi(
        params, cache, jnp.asarray(history), tok, cos, sin, active, cfg,
        n_steps=12, num_draft=3, ngram=2,
    )
    toks, counts = np.asarray(toks), np.asarray(counts)
    for bi in range(b):
        got = [int(tok[bi])]
        for step in range(toks.shape[1]):
            got.extend(int(x) for x in toks[bi, step, : counts[bi, step]])
        m = min(len(got), n_plain)
        assert m >= n_plain // 2, (bi, m)
        np.testing.assert_array_equal(np.asarray(got[:m]), ref[bi, :m])
    # the repetitive workload must actually accept drafts somewhere
    assert counts.max() > 1, counts


def test_spec_engine_matches_plain_engine():
    from starflashattention_tpu.serving.engine import Engine

    cfg = ModelConfig.tiny(dtype="float32", num_splits=1)
    params = llama.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    prompts = [
        [7, 8, 9, 7, 8, 9],
        [3, 4, 3, 4, 3],
        [1, 2, 3, 4, 5, 6, 7],
        [5, 5, 5, 5],
    ]
    plain = Engine(params, cfg, num_slots=4, steps_per_round=4)
    out_plain = plain.generate(prompts, max_new_tokens=20)
    spec = Engine(
        params, cfg, num_slots=4, steps_per_round=4, spec_decode=3,
    )
    out_spec = spec.generate(prompts, max_new_tokens=20)
    assert out_spec == out_plain
    assert spec.stats.spec_steps > 0
    # acceptance must be visible on the repetitive prompts
    assert spec.stats.decode_tokens >= spec.stats.spec_steps


def test_tp_spec_engine_matches_single_chip(mesh8):
    from starflashattention_tpu.serving.engine import Engine

    # mesh8's model axis is 4 — tiny()'s default num_kv_heads=2 can't shard
    cfg = ModelConfig.tiny(
        num_q_heads=8, num_kv_heads=4, dtype="float32", num_splits=1
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    prompts = [
        [7, 8, 9, 7, 8, 9],
        [3, 4, 3, 4, 3],
        [1, 2, 3, 4, 5, 6],
        [5, 5, 5, 5],
    ]
    single = Engine(params, cfg, num_slots=4, steps_per_round=2, spec_decode=2)
    ref = single.generate(prompts, max_new_tokens=12)
    sharded = Engine(
        params, cfg, num_slots=4, steps_per_round=2, spec_decode=2, mesh=mesh8,
    )
    out = sharded.generate(prompts, max_new_tokens=12)
    assert out == ref


def test_spec_engine_rejects_sampling():
    from starflashattention_tpu.serving.engine import Engine

    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    with pytest.raises(ValueError, match="greedy-only"):
        Engine(params, cfg, num_slots=2, spec_decode=2, enable_sampling=True)


def test_spec_decode_inactive_rows_untouched(rng):
    cfg = ModelConfig.tiny(dtype="float32", num_splits=1)
    params = llama.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    b = 2
    cache = contiguous.init_cache(
        cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    prompts = jnp.asarray(np.array([[5, 6, 5, 6], [9, 9, 9, 9]], np.int32))
    plens = jnp.full((b,), 4, jnp.int32)
    cos, sin = llama.rope_tables(cfg)
    logits, cache = llama.prefill(params, cache, prompts, plens, cos, sin, cfg)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    history = np.zeros((b, cfg.max_seq_len), np.int32)
    history[:, :4] = np.asarray(prompts)
    active = jnp.asarray(np.array([True, False]))
    toks, counts, pend, cache2, hist2 = llama.spec_decode_multi(
        params, cache, jnp.asarray(history), tok, cos, sin, active, cfg,
        n_steps=3, num_draft=2,
    )
    counts = np.asarray(counts)
    assert (counts[1] == 0).all()
    assert int(np.asarray(cache2.lengths)[1]) == 4
    assert int(np.asarray(pend)[1]) == int(np.asarray(tok)[1])
    np.testing.assert_array_equal(np.asarray(hist2)[1], history[1])


# ---------------------------------------------------------------------------
# Draft-MODEL speculative decoding (llama.spec_decode_multi_draft)
# ---------------------------------------------------------------------------


def test_draft_model_engine_matches_plain_engine():
    """A small independent draft model: greedy output must be BIT-IDENTICAL
    to plain decoding (acceptance is exact-argmax-match), every round emits
    >= 1 token, and both caches stay in lockstep."""
    from starflashattention_tpu.serving.engine import Engine

    cfg = ModelConfig.tiny(dtype="float32", num_splits=1)
    dcfg = ModelConfig.tiny(dtype="float32", num_splits=1, num_layers=1)
    params = llama.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    dparams = llama.init_params(dcfg, jax.random.PRNGKey(9), dtype=jnp.float32)
    prompts = [[7, 8, 9, 7, 8, 9], [3, 4, 3, 4, 3], [1, 2, 3, 4, 5, 6, 7]]
    plain = Engine(params, cfg, num_slots=3, steps_per_round=4)
    out_plain = plain.generate(prompts, max_new_tokens=16)
    spec = Engine(
        params, cfg, num_slots=3, steps_per_round=4, spec_decode=3,
        draft_model=(dparams, dcfg),
    )
    out_spec = spec.generate(prompts, max_new_tokens=16)
    assert out_spec == out_plain
    assert spec.stats.spec_steps > 0


def test_draft_model_self_draft_accepts_nearly_everything():
    """Draft == target: drafts should almost always match the target argmax.
    Not exactly always — the draft decodes through the single-query kernel
    and the verify through the staircase kernel, so last-ulp differences can
    flip argmax at random-init near-ties (same reason the engine pins
    num_splits=1). Emitted tokens are bit-identical to plain decoding either
    way; here we assert the acceptance RATE is high (measured 2.75/3)."""
    from starflashattention_tpu.serving.engine import Engine

    cfg = ModelConfig.tiny(dtype="float32", num_splits=1)
    params = llama.init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    prompts = [[1, 2, 3, 4], [9, 8, 7]]
    plain = Engine(params, cfg, num_slots=2, steps_per_round=3)
    out_plain = plain.generate(prompts, max_new_tokens=12)
    spec = Engine(
        params, cfg, num_slots=2, steps_per_round=3, spec_decode=2,
        draft_model=(params, cfg),
    )
    out_spec = spec.generate(prompts, max_new_tokens=12)
    assert out_spec == out_plain
    # self-draft: verify steps accept nearly all k drafts (see docstring)
    assert spec.stats.decode_tokens >= spec.stats.spec_steps * 2.5


def test_draft_model_engine_interleaves_and_resumes():
    """More requests than slots: draft cache admission/retire follows the
    target's, outputs match plain."""
    from starflashattention_tpu.serving.engine import Engine

    cfg = ModelConfig.tiny(dtype="float32", num_splits=1)
    dcfg = ModelConfig.tiny(dtype="float32", num_splits=1, num_layers=1)
    params = llama.init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    dparams = llama.init_params(dcfg, jax.random.PRNGKey(6), dtype=jnp.float32)
    rng = np.random.default_rng(5)
    prompts = [[int(t) for t in rng.integers(0, cfg.vocab_size, 2 + i)] for i in range(5)]
    plain = Engine(params, cfg, num_slots=2, steps_per_round=2)
    expected = plain.generate(prompts, max_new_tokens=6)
    spec = Engine(
        params, cfg, num_slots=2, steps_per_round=2, spec_decode=2,
        draft_model=(dparams, dcfg),
    )
    assert spec.generate(prompts, max_new_tokens=6) == expected


def test_draft_model_validation_errors():
    from starflashattention_tpu.serving.engine import Engine

    cfg = ModelConfig.tiny(dtype="float32", num_splits=1)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    with pytest.raises(ValueError, match="requires spec_decode"):
        Engine(params, cfg, num_slots=2, draft_model=(params, cfg))
    bad = ModelConfig.tiny(dtype="float32", num_splits=1, vocab_size=cfg.vocab_size * 2)
    bad_params = llama.init_params(bad, jax.random.PRNGKey(1), dtype=jnp.float32)
    with pytest.raises(ValueError, match="vocab"):
        Engine(params, cfg, num_slots=2, spec_decode=2, draft_model=(bad_params, bad))


def test_tp_draft_model_engine_matches_single_chip(mesh8):
    """Draft-model spec decoding on a (data, model) mesh: the draft runs
    replicated inside the sharded program (parallel/tp.py
    make_tp_spec_decode_multi_draft); greedy output must be bit-identical
    to the single-chip draft-model engine (and hence to plain decoding)."""
    from starflashattention_tpu.serving.engine import Engine

    cfg = ModelConfig.tiny(
        num_q_heads=8, num_kv_heads=4, dtype="float32", num_splits=1
    )
    dcfg = ModelConfig.tiny(dtype="float32", num_splits=1, num_layers=1)
    params = llama.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    dparams = llama.init_params(dcfg, jax.random.PRNGKey(9), dtype=jnp.float32)
    prompts = [
        [7, 8, 9, 7, 8, 9],
        [3, 4, 3, 4, 3],
        [1, 2, 3, 4, 5, 6, 7],
        [5, 5, 5, 5],
    ]
    single = Engine(
        params, cfg, num_slots=4, steps_per_round=2, spec_decode=2,
        draft_model=(dparams, dcfg),
    )
    ref = single.generate(prompts, max_new_tokens=12)
    sharded = Engine(
        params, cfg, num_slots=4, steps_per_round=2, spec_decode=2,
        draft_model=(dparams, dcfg), mesh=mesh8,
    )
    out = sharded.generate(prompts, max_new_tokens=12)
    assert out == ref
    assert sharded.stats.spec_steps > 0
