"""Pallas TPU kernels for the hot elementwise/normalization paths.

The profiled cost structure of the CycleGAN/pix2pixHD generators (see
bench ablations in the repo history): convs run near the MXU roofline under
XLA, but instance norm adds ~18% wall time because XLA lowers it as a reduce
pass plus a separate normalize pass — ≥3 HBM traversals of the activation.

:func:`fused_instance_norm_act` performs stats + normalize + activation (+
optional residual add) in ONE kernel with the whole (image, channel-block)
resident in VMEM: one HBM read, one write. Applicable when
``H·W·C_block·dtype ≤ ~4 MB`` (true for every layer of the 256² generators
except the stem, and for the deeper layers at 512²); callers fall back to the
XLA path otherwise (``ops.nn.instance_norm``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Empirical VMEM budgets for the whole-image block (double-buffered in/out
# plus fp32 temporaries must stay under the 16 MB scoped limit).
_VMEM_BLOCK_BYTES = 2 * 1024 * 1024
_VMEM_BLOCK_BYTES_RES = 1 * 1024 * 1024


def _in_act_kernel(x_ref, out_ref, *, eps: float, act: str, slope: float,
                   has_res: bool):
    x = x_ref[0].astype(jnp.float32)          # (H, W, C)
    hw = x.shape[0] * x.shape[1]
    mean = jnp.sum(x, axis=(0, 1), keepdims=True) / hw
    centered = x - mean
    var = jnp.sum(centered * centered, axis=(0, 1), keepdims=True) / hw
    y = centered * jax.lax.rsqrt(var + eps)
    if act == "relu":
        y = jnp.maximum(y, 0)
    elif act == "leaky":
        y = jnp.where(y >= 0, y, y * slope)
    elif act == "tanh":
        y = jnp.tanh(y)
    out_ref[0] = y.astype(out_ref.dtype)


def _in_act_res_kernel(x_ref, res_ref, out_ref, *, eps: float, act: str,
                       slope: float):
    x = x_ref[0].astype(jnp.float32)
    hw = x.shape[0] * x.shape[1]
    mean = jnp.sum(x, axis=(0, 1), keepdims=True) / hw
    centered = x - mean
    var = jnp.sum(centered * centered, axis=(0, 1), keepdims=True) / hw
    y = centered * jax.lax.rsqrt(var + eps)
    y = y + res_ref[0].astype(jnp.float32)    # residual add AFTER norm
    if act == "relu":
        y = jnp.maximum(y, 0)
    elif act == "leaky":
        y = jnp.where(y >= 0, y, y * slope)
    out_ref[0] = y.astype(out_ref.dtype)


def _fits(x: jnp.ndarray, budget: int) -> bool:
    n, h, w, c = x.shape
    return h * w * c * x.dtype.itemsize <= budget


def fused_instance_norm_act(
    x: jnp.ndarray,
    act: str = "none",
    eps: float = 1e-5,
    negative_slope: float = 0.2,
    residual: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """IN (affine-free, torch semantics) + activation (+ residual) in one pass.

    Falls back to the XLA composition when the per-image block exceeds the
    VMEM budget or when running on a non-TPU backend.
    """
    from cistar_tpu.ops import nn as tnn

    budget = _VMEM_BLOCK_BYTES_RES if residual is not None else _VMEM_BLOCK_BYTES
    use_pallas = _fits(x, budget) and x.shape[1] * x.shape[2] >= 8
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        platform = "cpu"
    if platform not in ("tpu", "axon"):
        use_pallas = False

    if not use_pallas:
        y = tnn.instance_norm(x, eps=eps)
        if residual is not None:
            y = y + residual
        if act == "relu":
            y = tnn.relu(y)
        elif act == "leaky":
            y = tnn.leaky_relu(y, negative_slope)
        elif act == "tanh":
            y = tnn.tanh(y)
        return y

    n, h, w, c = x.shape
    spec = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    if residual is None:
        kernel = functools.partial(_in_act_kernel, eps=eps, act=act,
                                   slope=negative_slope, has_res=False)
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)
    kernel = functools.partial(_in_act_res_kernel, eps=eps, act=act,
                               slope=negative_slope)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, residual)
