"""Persistent XLA compilation cache for CLI entry points.

Remote TPU compiles cost minutes per program shape on tunnel-attached
hosts; repeated CLI invocations (retraining each ensemble head, rerunning
inference) recompile identical programs without this. bench.py has always
enabled the persistent cache for the benchmark harness; this helper makes
every CLI do the same.

TPU backends only: XLA:CPU AOT cache entries are machine-feature-stamped
and can SIGILL/SIGABRT when loaded under a different CPU feature set
(observed with the 32-virtual-device dryrun — __graft_entry__.py has the
full note), so CPU runs never read or write the cache.
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> None:
    """Idempotent; call before the first compilation. Respects an already-
    configured cache dir (``JAX_COMPILATION_CACHE_DIR`` env or prior
    ``jax.config`` call); otherwise defaults to
    ``$SAD_TPU_CACHE_DIR`` or ``~/.cache/sad-tpu/xla``."""
    import jax

    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return
        if jax.config.jax_compilation_cache_dir:
            return  # user already chose a location
        path = os.environ.get(
            "SAD_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "sad-tpu", "xla"),
        )
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only; never fail an entry point
