"""Persistent XLA compilation cache — cold-start elimination.

The reference has no compile step at all (eager PyTorch), so its
cold-start cost is weight loading. Under XLA every (shape, sharding,
backend) executable is compiled on first use: the serving engine's warmup
over the batch-bucket x width grid and the train step's first iteration
pay tens of seconds to minutes per process (SCALING.md "first TPU compile
of a model takes ~20-40 s"; a serving grid compiles one executable per
cell). JAX can persist compiled executables to disk keyed by a hash of
the optimized HLO + compile options + runtime version, so every restart
after the first skips straight to deserialization.

Wired behind ``--compile_cache DIR`` on train.py / serve.py and the
``SAM_COMPILE_CACHE`` env var (flag wins). Must be called BEFORE the
first jit execution; entries are shared across processes and survive
restarts. Cache safety is jax's own: the key includes the jaxlib/runtime
fingerprint, so stale entries miss rather than corrupt.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_ENV_VAR = "SAM_COMPILE_CACHE"


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Point jax's persistent compilation cache at ``path`` (or
    ``$SAM_COMPILE_CACHE`` when ``path`` is None). Returns the directory
    actually enabled, or None when neither source names one.

    Thresholds are dropped to zero so EVERY executable is cached — the
    serving grid's many small per-rung executables are exactly the ones
    jax's default 1 s/min-compile-time heuristic would skip, and they are
    the bulk of warmup on a remote-attached chip.
    """
    target = path or os.environ.get(_ENV_VAR) or None
    if not target:
        return None
    target = os.path.abspath(os.path.expanduser(target))
    os.makedirs(target, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", target)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    try:
        # also cache the backend's autotuning/kernel artifacts when the
        # installed jax exposes the knob (no-op otherwise)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except (AttributeError, ValueError):  # older/newer jax: knob absent
        pass
    logger.info("persistent compilation cache at %s", target)
    return target
