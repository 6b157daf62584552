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


# --------------------------------------------------------------------------- #
# cout=1 head conv, attempt 2: masked two-stage tap reduction.
#
# Round-4 post-mortem of :func:`conv2d_reflect_cout1` (docs/DESIGN.md): both
# prior structural variants wedged the Mosaic compiler (>7 min) because every
# tap needed a LANE-dim relayout — 49 single-lane extracts (or one big
# in-VMEM transpose) per row tile. This variant has ZERO lane movement:
#
#   1. ONE MXU matmul per row tile turns the slab into 49 tap planes packed
#      dy-major into 64 lanes (lane = 8*dy + dx; dx==7 / dy==7 lanes carry
#      zero weights).
#   2. Stage A (dx reduction): 7 sublane-shifted masked adds select each
#      lane's own dx-shifted value — pure elementwise selects, no shuffles.
#   3. Stage B (dy reduction): 7 leading-dim-shifted masked adds, then one
#      cross-lane sum produces the (rows, W) output plane.
#
# Reflect padding is assembled IN VMEM from the unpadded image block (column
# pad once per image, row pad only on the edge tiles), so HBM sees exactly
# one read of x and one write of the (N,H,W) output — the XLA path's
# interior/border decomposition (`ops.nn.conv2d_reflect`) reads x ~once too
# but is MXU-row-bound at cout=1 (measured 18 ms of the 96.6 ms headline
# engine; reference role: the final `nn.Conv2d(ngf, 1, 7)` of
# CycleGAN/models.py:24-67 and p2pHD networks.py:195-223).
# --------------------------------------------------------------------------- #
def _conv7_cout1_masked_kernel(x_ref, w_ref, b_ref, out_ref, *, h: int,
                               wd: int, cin: int, rows: int, act: str):
    k, p = 7, 3
    img = x_ref[0]                                    # (h, wd, cin)
    # Column reflect pad -> (h, wd + 6, cin). Sublane-dim concat, done once.
    xw = jnp.concatenate(
        [img[:, 3:4], img[:, 2:3], img[:, 1:2], img,
         img[:, wd - 2:wd - 1], img[:, wd - 3:wd - 2], img[:, wd - 4:wd - 3]],
        axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 64), 2)
    zero = jnp.zeros((), jnp.float32)
    n_tiles = h // rows
    for t in range(n_tiles):
        r0 = t * rows
        lo, hi = r0 - p, r0 + rows + p
        parts = []
        if lo < 0:                                    # top edge: rows -3..-1
            parts += [xw[3:4], xw[2:3], xw[1:2]]
        parts.append(xw[max(lo, 0):min(hi, h)])
        if hi > h:                                    # bottom edge: rows h..h+2
            parts += [xw[h - 2:h - 1], xw[h - 3:h - 2], xw[h - 4:h - 3]]
        slab = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        m = (rows + 2 * p) * (wd + 2 * p)
        t2 = jnp.dot(slab.reshape(m, cin), w_ref[...],
                     preferred_element_type=jnp.float32)
        t3 = t2.reshape(rows + 2 * p, wd + 2 * p, 64)
        accA = jnp.zeros((rows + 2 * p, wd, 64), jnp.float32)
        for dx in range(k):
            accA = accA + jnp.where(lane % 8 == dx, t3[:, dx:dx + wd, :],
                                    zero)
        accB = jnp.zeros((rows, wd, 64), jnp.float32)
        for dy in range(k):
            accB = accB + jnp.where(lane // 8 == dy, accA[dy:dy + rows], zero)
        y = jnp.sum(accB, axis=-1) + b_ref[0]
        if act == "tanh":
            y = jnp.tanh(y)
        out_ref[0, r0:r0 + rows, :] = y.astype(out_ref.dtype)


def conv2d_reflect_cout1_masked(x: jnp.ndarray, w: jnp.ndarray,
                                b: Optional[jnp.ndarray] = None,
                                act: str = "none",
                                rows: int = 32,
                                interpret: bool = False) -> jnp.ndarray:
    """7x7 stride-1 reflect conv to ONE channel (+ optional fused tanh).

    Masked two-stage tap reduction (see block comment above). Input
    (N, H, W, Cin), weights HWIO (7, 7, Cin, 1); returns (N, H, W, 1).
    TPU-only fast path; callers fall back to ``ops.nn.conv2d_reflect``.
    """
    n, h, wd, cin = x.shape
    k, p = w.shape[0], w.shape[0] // 2
    assert k == 7 and w.shape[3] == 1 and h > 2 * p and wd > 2 * p
    if h % rows:
        rows = next(r for r in (64, 32, 16, 8, 4, 2, 1) if h % r == 0)
    # Lane packing: lane 8*dy + dx holds tap (dy, dx); dx==7 lanes are zero.
    wm = jnp.zeros((cin, 64), jnp.float32)
    wm = wm.at[:, (jnp.arange(49) // 7) * 8 + jnp.arange(49) % 7].set(
        jnp.asarray(w[..., 0], jnp.float32).reshape(49, cin).T)
    wm = wm.astype(x.dtype)
    b0 = jnp.asarray(b if b is not None else jnp.zeros(1), jnp.float32) \
        .reshape(1)
    kern = functools.partial(_conv7_cout1_masked_kernel, h=h, wd=wd, cin=cin,
                             rows=rows, act=act)
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, wd, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((cin, 64), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1,), lambda i: (0,),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, h, wd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd), x.dtype),
        # image read + output write + tap-matrix read (bias is SMEM noise)
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * k * k * cin,
            bytes_accessed=(n * h * wd * (cin + 1) + cin * 64)
            * x.dtype.itemsize,
            transcendentals=n * h * wd if act == "tanh" else 0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wm, b0)
    return out[..., None]


def _conv7_cout1_loop_kernel(x_ref, w_ref, b_ref, out_ref, xp_ref, *, h: int,
                             wd: int, cin: int, rows: int, act: str):
    """Same math as :func:`_conv7_cout1_masked_kernel` but with the tile loop
    as ONE ``lax.fori_loop`` body — the unrolled-tiles variant traces 8
    copies of the body and Mosaic's compile time on that program is
    pathological (>15 min at 256²; even a 2-tile 64² toy took 360 s). A
    single traced body keeps the Mosaic program ~8× smaller. Mosaic cannot
    lower ``dynamic_slice`` on VALUES, so the reflect-padded image is staged
    into a VMEM scratch REF with static stores (center, then top/bottom
    reflect rows, then left/right reflect columns — column pass last so the
    corners reflect correctly), and the loop body reads loop-varying
    ``pl.ds`` slices from that ref (major-dim dynamic starts are lowerable)."""
    k, p = 7, 3
    img = x_ref[0]                                    # (h, wd, cin)
    xp_ref[p:h + p, p:wd + p] = img
    for d in range(1, p + 1):                         # reflect rows
        xp_ref[p - d, p:wd + p] = img[d]
        xp_ref[h + p - 1 + d, p:wd + p] = img[h - 1 - d]
    for d in range(1, p + 1):                         # reflect cols (+corners)
        xp_ref[:, p - d] = xp_ref[:, p + d]
        xp_ref[:, wd + p - 1 + d] = xp_ref[:, wd + p - 1 - d]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 64), 2)
    zero = jnp.zeros((), jnp.float32)
    m = (rows + 2 * p) * (wd + 2 * p)

    def body(t, _):
        slab = xp_ref[pl.ds(t * rows, rows + 2 * p)]  # (rows+6, wd+6, cin)
        t2 = jnp.dot(slab.reshape(m, cin), w_ref[...],
                     preferred_element_type=jnp.float32)
        t3 = t2.reshape(rows + 2 * p, wd + 2 * p, 64)
        accA = jnp.zeros((rows + 2 * p, wd, 64), jnp.float32)
        for dx in range(k):
            accA = accA + jnp.where(lane % 8 == dx, t3[:, dx:dx + wd, :],
                                    zero)
        accB = jnp.zeros((rows, wd, 64), jnp.float32)
        for dy in range(k):
            accB = accB + jnp.where(lane // 8 == dy, accA[dy:dy + rows],
                                    zero)
        y = jnp.sum(accB, axis=-1) + b_ref[0]
        if act == "tanh":
            y = jnp.tanh(y)
        out_ref[0, pl.ds(t * rows, rows), :] = y.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h // rows, body, 0)


def conv2d_reflect_cout1_loop(x: jnp.ndarray, w: jnp.ndarray,
                              b: Optional[jnp.ndarray] = None,
                              act: str = "none",
                              rows: int = 32,
                              interpret: bool = False) -> jnp.ndarray:
    """7x7 stride-1 reflect conv to ONE channel — fori_loop-tiled variant of
    :func:`conv2d_reflect_cout1_masked` (see its docstring)."""
    n, h, wd, cin = x.shape
    k, p = w.shape[0], w.shape[0] // 2
    assert k == 7 and w.shape[3] == 1 and h > 2 * p and wd > 2 * p
    if h % rows:
        rows = next(r for r in (64, 32, 16, 8, 4, 2, 1) if h % r == 0)
    wm = jnp.zeros((cin, 64), jnp.float32)
    wm = wm.at[:, (jnp.arange(49) // 7) * 8 + jnp.arange(49) % 7].set(
        jnp.asarray(w[..., 0], jnp.float32).reshape(49, cin).T)
    wm = wm.astype(x.dtype)
    b0 = jnp.asarray(b if b is not None else jnp.zeros(1), jnp.float32) \
        .reshape(1)
    kern = functools.partial(_conv7_cout1_loop_kernel, h=h, wd=wd, cin=cin,
                             rows=rows, act=act)
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, wd, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((cin, 64), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1,), lambda i: (0,),
                               memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.VMEM((h + 2 * p, wd + 2 * p, cin), x.dtype)],
        out_specs=pl.BlockSpec((1, h, wd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd), x.dtype),
        # image read + output write + tap-matrix read, plus the padded-image
        # scratch round-trip this variant does (VMEM, counted 1× as a
        # pessimism hint — the masked variant has no such scratch).
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * k * k * cin,
            bytes_accessed=(n * h * wd * (cin + 1) + cin * 64
                            + 2 * n * (h + 2 * p) * (wd + 2 * p) * cin)
            * x.dtype.itemsize,
            transcendentals=n * h * wd if act == "tanh" else 0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wm, b0)
    return out[..., None]
