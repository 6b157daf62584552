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


# --------------------------------------------------------------------------- #
# 7x7 reflect conv with ONE output channel — the CycleGAN/pix2pixHD head.
# A cout=1 conv runs XLA's MXU at 1/128 lane utilization (measured 18 ms of
# the 96.6 ms headline int8 engine at 256² batch 256), and the XLA-level
# plane decomposition loses even more to 49-minor-lane layout traffic
# (docs/DESIGN.md round 4). This kernel keeps the tap products VMEM-resident:
# per row-tile, ONE (rows·W, Cin)x(Cin, 49) MXU matmul produces all tap
# planes, an in-VMEM transpose puts the tap index on the LEADING dim, and 49
# leading-dim shifted adds build the output — no HBM plane tensor, no
# lane-dim gathers. Optionally fuses the model's tanh.
# --------------------------------------------------------------------------- #
def _conv7_cout1_kernel(xp_ref, w_ref, b_ref, out_ref, *, h: int, w: int,
                        cin: int, rows: int, act: str):
    k, p = 7, 3
    n_tiles = h // rows
    for t in range(n_tiles):
        r0 = t * rows
        slab = xp_ref[0, r0:r0 + rows + 2 * p, :, :]       # (rows+6, w+6, cin)
        t2 = jnp.dot(slab.reshape((rows + 2 * p) * (w + 2 * p), cin),
                     w_ref[...], preferred_element_type=jnp.float32)
        t3 = t2.reshape(rows + 2 * p, w + 2 * p, k * k)
        acc = jnp.zeros((rows, w), jnp.float32)
        for tap in range(k * k):
            dy, dx = tap // k, tap % k
            acc = acc + t3[dy:dy + rows, dx:dx + w, tap]
        acc = acc + b_ref[0]
        if act == "tanh":
            acc = jnp.tanh(acc)
        out_ref[0, r0:r0 + rows, :] = acc.astype(out_ref.dtype)


def conv2d_reflect_cout1(x: jnp.ndarray, w: jnp.ndarray,
                         b: Optional[jnp.ndarray] = None,
                         act: str = "none",
                         rows: int = 64,
                         interpret: bool = False) -> jnp.ndarray:
    """7x7 stride-1 reflect conv to ONE channel (+ optional fused tanh).

    Input (N, H, W, Cin) bf16/fp32, weights HWIO (7, 7, Cin, 1); returns
    (N, H, W, 1). Use on TPU only (callers fall back to
    ``tnn.conv2d_reflect`` elsewhere).
    """
    n, h, wd, cin = x.shape
    k, p = w.shape[0], w.shape[0] // 2
    assert k == 7 and w.shape[3] == 1
    if h % rows:
        rows = next(r for r in (64, 32, 16, 8, 4, 2, 1) if h % r == 0)
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    wm = jnp.asarray(w[..., 0], jnp.float32).reshape(k * k, cin).T  # (cin,49)
    wm = wm.astype(x.dtype)
    b0 = jnp.asarray(b if b is not None else jnp.zeros(1), jnp.float32) \
        .reshape(1)
    kern = functools.partial(_conv7_cout1_kernel, h=h, w=wd, cin=cin,
                             rows=rows, act=act)
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h + 2 * p, wd + 2 * p, cin),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((cin, k * k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1,), lambda i: (0,),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, h, wd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * k * k * cin,
            bytes_accessed=n * h * wd * (cin + 1) * x.dtype.itemsize,
            transcendentals=n * h * wd if act == "tanh" else 0),
        interpret=interpret,
    )(xp, wm, b0)
    return out[..., None]
