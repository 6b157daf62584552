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


# --------------------------------------------------------------------------- #
# Fused 3x3 conv + instance norm + activation (+ residual) res-block kernel
# --------------------------------------------------------------------------- #
def fused_conv3x3_in_act(x: jnp.ndarray, w: jnp.ndarray,
                         b: Optional[jnp.ndarray] = None,
                         act: str = "relu",
                         residual: Optional[jnp.ndarray] = None,
                         pad_mode: str = "reflect",
                         eps: float = 1e-5) -> jnp.ndarray:
    """3x3 same-conv → instance norm → activation (→ +residual) in ONE kernel.

    The conv runs as 9 shifted (H·W, Cin)×(Cin, Cout) MXU matmuls with the
    whole per-image activation resident in VMEM, the IN statistics and
    normalization applied to the fp32 accumulator before the single HBM
    write-back. Reads x and w once, writes once — XLA's composition reads the
    activation ≥3 times. Targets the generator res-block layers (H·W·C ≤
    ~1 MB per image). Falls back to the unfused ops when the block is too
    large or off-TPU.
    """
    from cistar_tpu.ops import nn as tnn

    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    bytes_needed = (h + 2) * (wd + 2) * cin * x.dtype.itemsize \
        + h * wd * cout * 4 + 9 * cin * cout * w.dtype.itemsize
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        platform = "cpu"
    if platform not in ("tpu", "axon") or bytes_needed > 9 * 1024 * 1024 \
            or residual is not None and residual.shape != (n, h, wd, cout):
        y = tnn.conv2d_reflect(x, w, b) if pad_mode == "reflect" else \
            tnn.conv2d(x, w, b, padding=1)
        y = tnn.instance_norm(y, eps=eps)
        if residual is not None:
            y = y + residual
        if act == "relu":
            y = tnn.relu(y)
        return y

    hw = h * wd
    w2d = w.reshape(9, cin, cout)
    bias = b if b is not None else jnp.zeros((cout,), jnp.float32)

    def kernel(x_ref, w_ref, b_ref, *rest):
        if residual is not None:
            res_ref, out_ref = rest
        else:
            (out_ref,) = rest
        xv = x_ref[0]                                   # (h, wd, cin)
        # pad=1 reflection needs no flip: the pad row/col IS row 1 / row h-2
        # (Pallas TPU has no `rev` lowering; build the halo with concats).
        if pad_mode == "reflect":
            top, bot = xv[1:2], xv[h - 2:h - 1]
        else:
            top = jnp.zeros_like(xv[:1])
            bot = top
        xph = jnp.concatenate([top, xv, bot], axis=0)   # (h+2, wd, cin)
        if pad_mode == "reflect":
            left, right = xph[:, 1:2], xph[:, wd - 2:wd - 1]
        else:
            left = jnp.zeros_like(xph[:, :1])
            right = left
        xp = jnp.concatenate([left, xph, right], axis=1)  # (h+2, wd+2, cin)
        acc = jnp.zeros((hw, cout), jnp.float32)
        k = 0
        for dy in range(3):
            for dx in range(3):
                patch = xp[dy:dy + h, dx:dx + wd, :].reshape(hw, cin)
                acc = acc + jnp.dot(patch, w_ref[k],
                                    preferred_element_type=jnp.float32)
                k += 1
        acc = acc + b_ref[:].astype(jnp.float32)
        mean = jnp.sum(acc, axis=0, keepdims=True) / hw
        msq = jnp.sum(acc * acc, axis=0, keepdims=True) / hw
        var = jnp.maximum(msq - mean * mean, 0.0)
        y = (acc - mean) * jax.lax.rsqrt(var + eps)
        if residual is not None:
            y = y + res_ref[0].reshape(hw, cout).astype(jnp.float32)
        if act == "relu":
            y = jnp.maximum(y, 0)
        out_ref[0] = y.reshape(h, wd, cout).astype(out_ref.dtype)

    x_spec = pl.BlockSpec((1, h, wd, cin), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    args = [x, w2d, bias]
    in_specs = [x_spec, w_spec, b_spec]
    if residual is not None:
        in_specs.append(o_spec)
        args.append(residual)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hw * 9 * cin * cout,
            bytes_accessed=x.size * x.dtype.itemsize
            + n * hw * cout * x.dtype.itemsize + 9 * cin * cout * 2,
            transcendentals=0),
    )(*args)
