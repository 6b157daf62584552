"""Fast flax param init for fully-convolutional models.

Two axon-backend pathologies make naive ``Module.init`` at production
resolution expensive: (1) eager init compiles every op as its own tiny XLA
program (~minutes of round trips at 512²), and (2) even jitted, a 512²/1024²
init program is a full forward compile whose result is thrown away.

Every model in this framework is fully convolutional (conv / transpose-conv /
norm / pool only — no dense layers), so **param shapes are independent of the
example input's spatial dims**, and flax initializers draw from
path+shape-keyed PRNG streams — initializing at a small spatial size yields
bit-identical params (pinned by ``tests/test_pix2pixhd.py::
test_init_spatial_size_invariance``). ``conv_init`` therefore (a) jits the
whole init into ONE program and (b) lets callers cap the example's spatial
size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small enough to compile in seconds, large enough that every pyramid /
# downsample stack in the model zoo stays valid (≥ 2⁴ downsamples + 3×3
# reflect-pad at the bottleneck).
INIT_SPATIAL_CAP = 64


def init_size(size: int, cap: int = INIT_SPATIAL_CAP) -> int:
    """Spatial size to use for param init: ``min(size, cap)``."""
    return min(int(size), cap)


def conv_init(module, rng, *example_args, method=None):
    """``module.init`` compiled as ONE jit program (init is called once per
    process; retracing cost is irrelevant, per-op eager dispatch is not)."""
    if method is None:
        return jax.jit(module.init)(rng, *example_args)
    return jax.jit(lambda r, *a: module.init(r, *a, method=method))(
        rng, *example_args)


def zeros_nhwc(size: int, channels: int, dtype=jnp.float32,
               cap: int = INIT_SPATIAL_CAP) -> jnp.ndarray:
    """Batch-1 NHWC zeros at the capped init size."""
    s = init_size(size, cap)
    return jnp.zeros((1, s, s, channels), dtype)
