"""AOT compilation, serialization, and profiling — the deployment runtime.

Fills the role of the reference's ONNX export + TensorRT engine driver
(``p2pHD/test.py:68-78``, ``p2pHD/run_engine.py:33-173``) the TPU-native way:

  * :func:`save_compiled` — ``jax.export`` a jitted function to a serialized
    StableHLO executable artifact on disk (the ".engine" file).
  * :func:`load_compiled` — deserialize and return a callable.
  * :func:`profile_fn` — steady-state latency stats with axon-safe
    synchronization (host fetch, not ``block_until_ready`` — see bench.py).
  * :func:`cost_analysis` — XLA's per-executable FLOP/bytes estimates, the
    analogue of the TRT per-layer profiler table.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def aot_compile(fn: Callable, example_args: Sequence[Any]):
    """Lower + compile ``fn`` for the given example shapes."""
    return jax.jit(fn).lower(*example_args).compile()


def save_compiled(fn: Callable, example_args: Sequence[Any], path: str) -> None:
    """Serialize a jitted function (StableHLO + calling convention) to disk."""
    exported = jax.export.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)


def load_compiled(path: str) -> Callable:
    """Load a serialized executable; returns a callable running via jit."""
    with open(path, "rb") as f:
        data = f.read()
    exported = jax.export.deserialize(bytearray(data))
    return jax.jit(exported.call)


def load_compiled_sharded(path: str, mesh, in_specs: Sequence[Any]) -> Callable:
    """Load a serialized SPMD program exported by :func:`save_compiled_sharded`.

    The exported body requires exactly ``mesh.devices.size`` devices, so the
    returned callable first places each argument (pytree) with its
    ``PartitionSpec`` from ``in_specs`` onto ``mesh`` — calling it with plain
    host/single-device arrays would otherwise fail with a device-count
    mismatch.
    """
    import jax.numpy as _jnp
    from jax.sharding import NamedSharding

    with open(path, "rb") as f:
        data = f.read()
    exported = jax.export.deserialize(bytearray(data))
    call = jax.jit(exported.call)

    def runner(*args):
        placed = tuple(
            jax.tree.map(lambda x: jax.device_put(
                _jnp.asarray(x), NamedSharding(mesh, spec)), arg)
            for arg, spec in zip(args, in_specs))
        return call(*placed)

    return runner


def save_compiled_sharded(jitted_fn: Callable, example_args: Sequence[Any],
                          path: str) -> int:
    """Serialize an ALREADY shard-annotated jitted function (e.g. the
    engines' ``make_sharded_infer`` programs) to disk.

    The exported artifact captures the mesh size and every in/out sharding;
    loading it on a device set of the same size re-runs the same SPMD
    program — the fleet-scale analogue of a serialized TensorRT engine
    (``p2pHD/run_engine.py:104-120``). Returns the artifact size in bytes.
    """
    exported = jax.export.export(jitted_fn)(*example_args)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def _sync(x) -> float:
    """Force execution with a tiny host fetch (axon-safe sync)."""
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf))


def profile_fn(fn: Callable, *example_args, iters: int = 100,
               warmup: int = 5) -> Dict[str, float]:
    """Steady-state latency: chained same-signature calls, one fetch per
    timed sample (per-iter RTT amortized over ``inner`` executions)."""
    out = fn(*example_args)
    _sync(out)
    for _ in range(warmup):
        out = fn(*example_args)
    _sync(out)

    times = []
    inner = 10
    for _ in range(max(1, iters // inner)):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*example_args)
        _sync(out)
        times.append((time.perf_counter() - t0) / inner)
    arr = np.asarray(times) * 1000.0
    return {
        "mean_ms": float(arr.mean()),
        "p50_ms": float(np.percentile(arr, 50)),
        "p95_ms": float(np.percentile(arr, 95)),
        "best_ms": float(arr.min()),
    }


def cost_analysis(fn: Callable, *example_args) -> Dict[str, float]:
    """XLA cost model for the compiled executable (flops, bytes accessed…)."""
    compiled = aot_compile(fn, example_args)
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # one entry per computation
        costs = costs[0] if costs else {}
    return dict(costs or {})


def profile_trace(fn: Callable, *example_args, logdir: str = "/tmp/jax_trace",
                  iters: int = 3):
    """Capture an xprof trace of ``fn`` (per-op timeline — the deep-dive
    replacement for the TRT layer profiler's table). Gracefully degrades to
    :func:`profile_fn` stats when the backend doesn't support tracing."""
    out = fn(*example_args)
    _sync(out)
    try:
        with jax.profiler.trace(logdir):
            for _ in range(iters):
                out = fn(*example_args)
            _sync(out)
        return {"trace_dir": logdir}
    except Exception as e:  # pragma: no cover - backend dependent
        stats = profile_fn(fn, *example_args, iters=20)
        stats["trace_error"] = str(e)[:200]
        return stats
