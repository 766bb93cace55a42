"""Test harness: force an 8-device CPU platform BEFORE jax initializes.

Pallas kernels run in interpret mode on CPU (selected automatically by
starflashattention_tpu.ops); sharding tests use a virtual 8-device mesh, per
SURVEY.md §4's test plan.
"""

import os
import resource

# XLA compiles on the CALLING thread, and LLVM's optimization passes recurse
# deeply on the big sharded-training programs (shard_map + ring custom_vjp +
# scan + remat backward). With the default 8 MB main-thread stack this
# intermittently SEGFAULTs inside backend_compile after enough programs have
# been compiled in one process (observed twice across full-suite runs, at
# different tests each time; every test passes in isolation). The Linux main
# stack grows on demand up to the soft rlimit — raise it so LLVM has room.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _hard == resource.RLIM_INFINITY or _hard >= 512 * 1024 * 1024:
    resource.setrlimit(resource.RLIMIT_STACK, (512 * 1024 * 1024, _hard))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def mesh8():
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, axis_names=("data", "model"))
