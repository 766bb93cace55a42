"""Worker for the 2-process simulated multi-host test (run by
tests/test_multiprocess.py, one subprocess per simulated host).

Each process brings 4 virtual CPU devices; jax.distributed.initialize over
localhost joins them into one 8-device runtime (the DCN/multi-process path
of parallel/mesh.init_distributed — the same call a real 2-host TPU pod
makes, with TCP standing in for DCN). The TP decode step then runs as a
single global shard_map program spanning both processes, and every process
checks its addressable logit shards against the locally-computed
single-chip reference.

Usage: python multiprocess_worker.py <coordinator_port> <process_id> <num_processes>
"""

from __future__ import annotations

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin would win otherwise

import numpy as np


def main() -> None:
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from starflashattention_tpu.parallel import mesh as mesh_lib

    mesh_lib.init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    import jax.numpy as jnp

    from starflashattention_tpu.cache import contiguous
    from starflashattention_tpu.models import llama
    from starflashattention_tpu.parallel import tp
    from starflashattention_tpu.runtime.params import ModelConfig

    cfg = ModelConfig.tiny(num_q_heads=8, num_kv_heads=4, dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    cos, sin = llama.rope_tables(cfg)
    b = 4
    tokens = jnp.asarray([1, 2, 3, 4], jnp.int32)

    # Single-chip reference, computed locally on every process.
    ref_cache = contiguous.init_cache(
        cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
        dtype=jnp.float32,
    )
    ref_logits, _ = llama.decode_step(params, ref_cache, tokens, cos, sin, cfg)
    ref = np.asarray(ref_logits)

    # Global (2-host data) x (4-device model) mesh spanning both processes.
    mesh = mesh_lib.make_mesh({"data": nproc, "model": 4})
    sharded_params = tp.shard_params(params, mesh, cfg)
    cache = tp.shard_cache(
        contiguous.init_cache(
            cfg.num_layers, b, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim,
            dtype=jnp.float32,
        ),
        mesh,
    )
    step = tp.make_tp_decode_step(mesh, cfg)
    from jax.sharding import NamedSharding, PartitionSpec as P

    tok_g = jax.device_put(tokens, NamedSharding(mesh, P("data")))
    logits, cache = step(sharded_params, cache, tok_g, cos, sin)

    # Every process validates ITS addressable shards row-by-row against the
    # replicated single-chip reference.
    rows_checked = 0
    for shard in logits.addressable_shards:
        rows = shard.index[0]
        got = np.asarray(shard.data)
        want = ref[rows]
        assert np.all(np.isfinite(got)), "non-finite sharded logits"
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
        rows_checked += got.shape[0]
    assert rows_checked >= b // nproc, rows_checked

    # Lengths advanced on this process's cache shard.
    lens = np.concatenate(
        [np.asarray(s.data) for s in cache.lengths.addressable_shards]
    )
    assert (lens == 1).all(), lens

    # --- TP x DP TRAINING step spanning both processes ------------------
    # The sharded value_and_grad (parallel/train) over the same 2-host mesh:
    # loss must equal the locally-computed single-device loss, replicated
    # grads (final_norm) must match the oracle on every process, and a
    # model-sharded grad (wo) must match the permuted oracle slice-by-slice.
    from starflashattention_tpu.models.train import loss_fn
    from starflashattention_tpu.parallel.train import make_tp_dp_value_and_grad

    batch = (jnp.arange(b * 10, dtype=jnp.int32).reshape(b, 10)
             % cfg.vocab_size)
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        params, batch, cfg, cos, sin
    )
    vg, _ = make_tp_dp_value_and_grad(mesh, cfg)
    batch_g = jax.device_put(batch, NamedSharding(mesh, P("data")))
    loss_sh, grads_sh = vg(sharded_params, batch_g, cos, sin)
    assert abs(float(loss_sh) - float(loss_ref)) < 1e-5, (
        float(loss_sh), float(loss_ref)
    )
    got_fn = np.asarray(grads_sh["final_norm"].addressable_shards[0].data)
    np.testing.assert_allclose(
        got_fn, np.asarray(grads_ref["final_norm"]), rtol=1e-4, atol=1e-5
    )
    gref_perm = tp.permute_params_for_tp(grads_ref, cfg, 4)
    wo_ref = np.asarray(gref_perm["layers"]["wo"])
    scale = np.abs(wo_ref).max() + 1e-9
    for shard in grads_sh["layers"]["wo"].addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data) / scale, wo_ref[shard.index] / scale,
            atol=1e-4,
        )

    # --- Context-parallel RING attention spanning both processes --------
    # A ("seq",) mesh over all 8 devices: the ring's ppermute now crosses
    # the process boundary every hop — KV chunks flow over the TCP/DCN
    # stand-in exactly as they would over DCN between two real hosts.
    from starflashattention_tpu.ops.flash_prefill import flash_prefill
    from starflashattention_tpu.parallel.ring import make_ring_prefill

    smesh = mesh_lib.make_mesh({"seq": 4 * nproc})
    s_tot = 16 * 4 * nproc
    rng = np.random.default_rng(1)
    qr = jnp.asarray(rng.standard_normal((2, 4, s_tot, 32)), jnp.float32)
    kr = jnp.asarray(rng.standard_normal((2, 2, s_tot, 32)), jnp.float32)
    vr = jnp.asarray(rng.standard_normal((2, 2, s_tot, 32)), jnp.float32)
    rl = jnp.asarray([s_tot, s_tot // 2 + 5], jnp.int32)
    ring_ref = np.asarray(flash_prefill(qr, kr, vr, rl, causal=True))

    rspec = P(None, None, "seq", None)
    ring_fn = make_ring_prefill(smesh, seq_axis="seq")
    qg, kg, vg = (
        jax.device_put(x, NamedSharding(smesh, rspec)) for x in (qr, kr, vr)
    )
    o_ring = ring_fn(qg, kg, vg, rl)
    lens_np = np.asarray(rl)
    ring_rows = 0
    for shard in o_ring.addressable_shards:
        sl = shard.index[2]
        got = np.asarray(shard.data)
        want = ring_ref[:, :, sl]
        rows = np.arange(sl.start or 0, sl.stop if sl.stop else s_tot)
        msk = (rows[None, :] < lens_np[:, None])[:, None, :, None]
        assert np.all(np.isfinite(got)), "non-finite ring output"
        assert (np.abs(got - want) * msk).max() < 2e-5
        ring_rows += got.shape[2]
    assert ring_rows >= s_tot // nproc, ring_rows

    # --- Context-parallel TRAIN step spanning both processes ------------
    import optax

    from starflashattention_tpu.parallel.train import make_cp_train_step

    cp_batch = (jnp.arange(2 * (s_tot + 1), dtype=jnp.int32)
                .reshape(2, s_tot + 1) % cfg.vocab_size)
    loss_cp_ref = float(loss_fn(params, cp_batch, cfg, cos, sin))
    opt = optax.sgd(1e-3)
    cp_step = make_cp_train_step(smesh, cfg, opt)
    _, _, loss_cp = cp_step(params, opt.init(params), cp_batch, cos, sin)
    assert abs(float(loss_cp) - loss_cp_ref) < 1e-5, (
        float(loss_cp), loss_cp_ref
    )

    print(f"MULTIPROCESS_OK pid={pid} rows={rows_checked}", flush=True)


if __name__ == "__main__":
    main()
