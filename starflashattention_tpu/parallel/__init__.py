"""Multi-chip parallelism: mesh construction, sharded model steps, and the
cross-chip split-KV decode reduction.

The reference has ZERO distributed code (SURVEY.md §2: no NCCL/MPI, single
GPU); this package is the new capability mandated by BASELINE.json: heads and
KV tensor-sharded over ICI (``tp``), batch data-parallel (``dp``), and the
flash-decode split-K reduction generalized ACROSS chips — each chip attends
its KV sequence shard and the per-chip (o, m, l) partials merge with
pmax/psum collectives, the distributed form of the reference's
flash_combine_kernel (flash_attn.cu:877-935).
"""

from starflashattention_tpu.parallel.mesh import make_mesh  # noqa: F401
from starflashattention_tpu.parallel.tp import (  # noqa: F401
    make_tp_decode_multi,
    make_tp_decode_step,
    make_tp_prefill,
    make_tp_prefill_serving,
    shard_cache,
    shard_params,
)
from starflashattention_tpu.parallel.distributed_decode import (  # noqa: F401
    make_seq_sharded_decode,
    merge_partials_across_chips,
)
from starflashattention_tpu.parallel.ring import (  # noqa: F401
    make_ring_prefill,
    ring_attention,
)
from starflashattention_tpu.parallel.ulysses import (  # noqa: F401
    make_ulysses_prefill,
    ulysses_attention,
)
from starflashattention_tpu.parallel.pp import (  # noqa: F401
    make_pp_decode_step,
    shard_cache_pp,
    shard_params_pp,
)
from starflashattention_tpu.parallel.train import (  # noqa: F401
    init_opt_state,
    make_cp_train_step,
    make_tp_cp_train_step,
    make_tp_dp_train_step,
    make_tp_dp_value_and_grad,
)
