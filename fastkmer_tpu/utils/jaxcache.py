"""Persistent XLA compilation cache setup.

Compiles dominate cold-start wall time in this environment (the axon
remote-compile hop costs tens of seconds per program); enabling jax's
persistent cache makes every jit after the first process free.  Imported
for its side effect by pipeline/cli/bench.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/fastkmer_tpu_xla")


def enable(cache_dir: str | None = None) -> None:
    import jax

    d = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these knobs


enable()
