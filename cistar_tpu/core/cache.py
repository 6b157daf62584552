"""Persistent XLA compilation cache.

On the tunneled TPU backend a big train-step compile costs minutes; every
CLI restart, resume, or bench re-run paid it again. JAX's persistent
compilation cache stores serialized executables on disk keyed by
(program, compile options, backend version), so repeat program shapes start
in seconds. Enabled by every CLI entry point and ``bench.py``; opt out with
``CISTAR_NO_COMPILE_CACHE=1`` or redirect with ``JAX_COMPILATION_CACHE_DIR``.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT = os.path.expanduser("~/.cache/cistar_tpu/xla")


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path`` (created if
    needed). Returns the directory, or None if disabled/unsupported."""
    if os.environ.get("CISTAR_NO_COMPILE_CACHE") == "1":
        return None
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT)
    try:
        import jax

        # the tunneled axon backend HANGS with the persistent cache enabled
        # (remote-compile and the cache's executable serialization deadlock)
        # — measured: even a trivial jit never returns. CPU/real-TPU only.
        platforms = (os.environ.get("JAX_PLATFORMS", "")
                     or (jax.config.jax_platforms or ""))
        if "axon" in platforms:
            return None

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # big GAN steps are exactly the compiles worth keeping; the default
        # 1s threshold also skips the tiny eager-init ops
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return path
    except Exception:  # pragma: no cover - backend/version dependent
        return None
