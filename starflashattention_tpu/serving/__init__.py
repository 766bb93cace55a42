"""Serving: continuous batching over fixed decode slots.

New capability over the reference (which serves nothing — its harness is a
fixed-shape benchmark loop, examples/cpp/testFlashDecoder.cc): an engine that
admits requests into a fixed number of batch slots (static shapes → one
compiled program), prefills prompts, decodes all active slots each step, and
retires finished sequences — the scheduler policy living on the host while
every device step stays a single jitted program.
"""

from starflashattention_tpu.core.sampling import GREEDY, SamplingParams  # noqa: F401
from starflashattention_tpu.serving.scheduler import Request, Scheduler  # noqa: F401
from starflashattention_tpu.serving.engine import Engine, EngineStats, PagedEngine  # noqa: F401
from starflashattention_tpu.serving.prefix_cache import PrefixCache  # noqa: F401
from starflashattention_tpu.serving.recovery import (  # noqa: F401
    load_state,
    run_resilient,
    save_state,
)
