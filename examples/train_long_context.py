"""Long-context training example: context-parallel ring attention.

Trains a tiny Llama on sequences sharded across a ("seq",) mesh — the mode
for contexts whose activations don't fit one chip. Each device holds a
contiguous chunk of every sequence; attention runs as ring attention
(parallel/ring.py: KV chunks rotate over ppermute, LSE-merged per hop, with
a custom-vjp backward that routes dk/dv home around the same ring), and the
optimizer updates replicated params from pmean'd grads.

Runs anywhere: on a CPU host it builds a virtual 8-device mesh
(interpret-mode kernels); on a TPU slice it uses the real devices.

    python examples/train_long_context.py [--steps 20] [--seq 1024]
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual CPU devices when no TPU is attached")
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh even if a TPU is "
                         "attached (a single chip makes a 1-ring)")
    args = ap.parse_args()

    # the host-platform device count must be set BEFORE jax initializes a
    # backend (it is harmless when a TPU ends up selected); --cpu then
    # forces the virtual mesh even with a TPU attached
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    )

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from starflashattention_tpu.models import llama
    from starflashattention_tpu.parallel import make_mesh
    from starflashattention_tpu.parallel.train import (
        init_opt_state,
        make_cp_train_step,
    )
    from starflashattention_tpu.runtime.params import ModelConfig

    n = len(jax.devices())
    if args.seq % n:
        raise SystemExit(f"--seq {args.seq} must be divisible by {n} devices")
    mesh = make_mesh({"seq": n})
    print(f"mesh: seq={n} over {jax.devices()[0].platform}")

    cfg = ModelConfig.tiny(
        num_q_heads=8, num_kv_heads=4, head_dim=32, hidden_size=128,
        max_seq_len=args.seq, dtype="float32",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    cos, sin = llama.rope_tables(cfg)

    opt = optax.adamw(3e-4)
    step = make_cp_train_step(mesh, cfg, opt)
    opt_state = init_opt_state(opt, params)

    # toy corpus: byte patterns with long-range structure (the first half of
    # each sequence is echoed in the second half, so the model can only
    # reduce loss on the echo by attending ACROSS the chunk boundary —
    # exactly what the ring provides)
    rng = np.random.default_rng(0)

    def make_batch():
        half = args.seq // 2
        a = rng.integers(0, cfg.vocab_size, (args.batch, half), np.int32)
        seq = np.concatenate([a, a], axis=1)[:, : args.seq + 1]
        if seq.shape[1] < args.seq + 1:
            seq = np.pad(seq, ((0, 0), (0, args.seq + 1 - seq.shape[1])))
        return jnp.asarray(seq, jnp.int32)

    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, make_batch(), cos, sin)
        if i % 5 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}")

    print("done — loss on the echoed half falls only via cross-chunk "
          "attention (ring)")


if __name__ == "__main__":
    main()
