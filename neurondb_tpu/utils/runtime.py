"""Runtime setup helpers.

On this TPU backend a single kernel compilation can cost minutes (the
batched beam-search kernel measured 279s cold, 1.04s warm), so the
persistent XLA compilation cache is load-bearing: it amortizes compiles
across processes (driver compile-checks, benchmarks, services). Enabled
at import of neurondb_tpu; opt out with NEURONDB_TPU_COMPCACHE=0.

TPU-only by design: XLA:CPU persists AOT machine code whose cache key
does not pin the host's CPU features, so a cache written on one machine
SIGILL/SIGSEGVs when loaded on another (observed round 2: the full test
suite segfaulted inside backend_compile_and_load after the cache dir
travelled between hosts, with cpu_aot_loader warning "+prefer-no-scatter
is not supported on the host machine ... could lead to execution errors
such as SIGILL"). CPU compiles are fast; caching them is all risk and
no win.
"""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache() -> None:
    global _done
    if _done or os.environ.get("NEURONDB_TPU_COMPCACHE", "1") == "0":
        return
    _done = True
    try:
        import jax

        plats = (jax.config.jax_platforms
                 or os.environ.get("JAX_PLATFORMS", "") or "")
        if not plats:
            # auto-detect: resolve the backend (initializes it — fine,
            # the process is about to anyway) so a real TPU host without
            # an explicit platform pin still gets the load-bearing cache
            plats = jax.default_backend()
        if not plats.startswith(("tpu", "axon")):
            return                      # CPU: see module docstring
        cache_dir = os.environ.get(
            "NEURONDB_TPU_COMPCACHE_DIR",
            os.path.expanduser("~/.cache/neurondb_tpu_xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
