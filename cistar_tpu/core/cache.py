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
_EXE_DEFAULT = os.path.expanduser("~/.cache/cistar_tpu/executables")


def exec_cache_compile(jitted, args, key: str,
                       cache_dir: Optional[str] = None,
                       verbose: bool = True):
    """Compile ``jitted.lower(*args)`` with a disk-backed EXECUTABLE cache.

    The persistent XLA compilation cache deadlocks on the tunneled axon
    backend (see :func:`enable_compilation_cache`), so every fresh process
    used to repay the full train-step compile — 4+ minutes for the shipped
    512² UNet-MSRB recipe (VERDICT r3 #5). ``jax.experimental.
    serialize_executable`` does work there: the first process serializes the
    compiled executable (PJRT blob + arg trees) to disk, and later processes
    deserialize in ~0.1 s with NO tracing, lowering, or backend compile.

    The cache key covers the caller's ``key`` (engine config fingerprint),
    the flattened arg shapes/dtypes, jax/jaxlib versions, and the device
    kind; any mismatch — or a deserialization failure after a runtime
    upgrade — falls back to a normal compile and rewrites the entry.

    Returns a callable with the same calling convention as the jitted
    function's dynamic (non-static) arguments; donation semantics are baked
    into the executable.
    """
    import hashlib
    import pickle

    import jax

    if os.environ.get("CISTAR_NO_COMPILE_CACHE") == "1":
        return jitted.lower(*args).compile()
    dev = jax.devices()[0]
    leaves = jax.tree.leaves(args)
    sig = ";".join(f"{getattr(x, 'shape', ())}:{getattr(x, 'dtype', type(x))}"
                   for x in leaves)
    raw = f"{key}|{sig}|{jax.__version__}|{dev.device_kind}|{dev.platform}"
    h = hashlib.sha256(raw.encode()).hexdigest()[:24]
    cache_dir = cache_dir or os.environ.get("CISTAR_EXE_CACHE_DIR",
                                            _EXE_DEFAULT)
    path = os.path.join(cache_dir, f"{h}.jaxexe")

    from jax.experimental import serialize_executable as se

    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree, n_exec = pickle.load(f)
            # execution_devices defaults to ALL devices, which breaks a
            # 1-device program on a multi-device (e.g. 8-virtual-CPU) client
            compiled = se.deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=jax.devices()[:n_exec])
            if verbose:
                print(f"loaded pre-compiled step from {path} "
                      "(skipping XLA compile)", flush=True)
            return compiled
        except Exception as e:  # stale runtime/device — recompile below
            if verbose:
                print(f"executable cache miss ({type(e).__name__}); "
                      "recompiling", flush=True)
    compiled = jitted.lower(*args).compile()
    try:
        try:
            n_exec = next(iter(compiled.input_shardings[0])).num_devices
        except Exception:
            n_exec = 1
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(se.serialize(compiled) + (n_exec,), f)
        os.replace(tmp, path)
        if verbose:
            print(f"saved compiled step to {path} "
                  "(fresh processes now skip this compile)", flush=True)
    except Exception:  # serialization unsupported — still return compiled
        pass
    return compiled


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
