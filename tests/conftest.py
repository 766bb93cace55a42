"""Test harness: force an 8-device CPU platform BEFORE jax initializes.

Pallas kernels run in interpret mode on CPU (selected automatically by
starflashattention_tpu.ops); sharding tests use a virtual 8-device mesh, per
SURVEY.md §4's test plan.
"""

import os
import threading

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


def pytest_pyfunc_call(pyfuncitem):
    """Run every test on a worker thread with a 512 MB stack.

    XLA compiles on the CALLING thread, and LLVM's optimization passes
    recurse deeply on the big sharded-training programs (shard_map + ring
    custom_vjp + scan + remat backward). On the default 8 MB main-thread
    stack this intermittently SEGFAULTed inside backend_compile late in
    full-suite runs (three runs, a different sharded-training test each
    time; every test passes in isolation, and raising RLIMIT_STACK mid-
    process cannot reliably grow an already-bounded main stack). A fresh
    thread gets its stack sized up front, so the compiler always has room.
    """
    testfunction = pyfuncitem.obj
    testargs = {
        arg: pyfuncitem.funcargs[arg]
        for arg in pyfuncitem._fixtureinfo.argnames
    }
    outcome: dict = {}

    def run():
        try:
            testfunction(**testargs)
        except BaseException as e:  # re-raised on the pytest thread
            outcome["exc"] = e

    old = threading.stack_size(512 * 1024 * 1024)
    try:
        t = threading.Thread(target=run, name=f"bigstack:{pyfuncitem.name}")
        t.start()
        t.join()
    finally:
        threading.stack_size(old)
    if "exc" in outcome:
        raise outcome["exc"]
    return True
