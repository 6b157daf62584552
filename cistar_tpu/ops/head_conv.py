"""The cout=1 7x7 reflect head conv — round-5 kernel structures.

The final ``nn.Conv2d(ngf, 1, 7)`` + tanh of every CycleGAN/pix2pixHD
generator (reference ``CycleGAN/models.py:24-67``, ``p2pHD/networks.py:
195-223``) is the single most expensive op in the headline int8 engine:
one output channel uses 1/128 MXU lanes, measured 18.2 ms of the 128.6 ms
device time at 256²/batch 256 (``benchmarks/profile_headline_r5_base.json``).

Round 4's masked tap-reduction kernels wedged the Mosaic compiler
(iota-compare + ``jnp.where`` select accumulation programs are
compile-time-pathological on this toolchain; see docs/DESIGN.md). The
round-5 structures here avoid masked selects entirely:

``head_conv_tanh_xla``
    Pure-XLA reformulation: ONE full-lane MXU matmul turns the padded
    image into 49 tap planes (the (cin → 49) channel contraction at full
    lane utilization), then a one-hot DEPTHWISE 7×7 conv + channel sum
    performs the shift-and-add on the VPU. No Pallas, no compile risk.

``head_conv_tanh_pallas`` (kernel: ``_head_kernel``)
    The (8,128)-padded tap-matmul kernel: per row tile, one
    (rows·(W+6), cin)×(cin, 64) MXU matmul produces the tap planes packed
    dy-major into 64 lanes (lane = 8·dy + dx), then two shifted
    multiply-accumulate stages reduce the taps — the dx stage multiplies by
    constant 0/1 lane vectors (VMEM inputs, NOT iota/where selects), the dy
    stage likewise — and one cross-lane sum emits the (rows, W) plane.
    Optionally fuses the PRECEDING instance norm + ReLU (the last upsample
    stage's epilogue), removing that stage's standalone 3-pass IN.

Both are exact reformulations (same fp32 tap accumulation), golden-tested
against ``ops.nn.conv2d_reflect`` in ``tests/test_head_conv.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tap_matrix(w: jnp.ndarray, lanes: int, stride8: bool) -> jnp.ndarray:
    """(7,7,cin,1) HWIO → (cin, lanes) tap matrix.

    ``stride8``: lane = 8*dy + dx (dy-major, 8-lane groups, dx==7 lanes
    zero); else lane = 7*dy + dx (dense 49)."""
    k = w.shape[0]
    cin = w.shape[2]
    wt = jnp.asarray(w[..., 0], jnp.float32).reshape(k * k, cin).T
    if not stride8:
        out = jnp.zeros((cin, lanes), jnp.float32)
        return out.at[:, : k * k].set(wt)
    idx = (np.arange(k * k) // k) * 8 + np.arange(k * k) % k
    out = jnp.zeros((cin, lanes), jnp.float32)
    return out.at[:, idx].set(wt)


# --------------------------------------------------------------------------- #
# XLA variant: strided shift-channel conv + depth-to-space.
#
# The WINNING round-5 structure. A cout=1 stride-1 k×k conv keeps 1/128 MXU
# lanes busy; re-index the output by 8×8 spatial blocks instead:
#
#   out[8i+a, 8j+b] = Σ_{dy,dx,c} xp[8i+a+dy, 8j+b+dx, c] · W[dy,dx,c]
#                   = (conv stride 8, VALID) with kernel
#                     K[ky,kx,c,8a+b] = W[ky−a, kx−b, c]   (k+7 = 14 taps)
#
# i.e. ONE stride-8 conv whose 64 output channels are the 64 in-block pixel
# positions — 64/128 MXU lanes, K-dim = 196·cin — followed by a
# depth-to-space on the (N, H/8, W/8, 64) output (67 MB at the flagship
# shape, trivial). The input is read exactly once with no relayout, all in
# XLA (zero Mosaic risk). The 4× tap zero-padding (14² vs 7²·(64/…)) is
# FLOP overhead the MXU absorbs: measured on the v5e chip this replaces the
# 16.5 ms in-engine head fusion.
# --------------------------------------------------------------------------- #
def head_conv_tanh_shift(x: jnp.ndarray, w: jnp.ndarray,
                         b: Optional[jnp.ndarray] = None,
                         act: str = "tanh",
                         block: int = 8) -> jnp.ndarray:
    """7×7 stride-1 reflect conv to ONE channel via the stride-`block`
    shift-channel reformulation (+ fused bias/tanh). Exact reformulation —
    same taps, fp32 accumulation. Requires H, W divisible by `block`."""
    n, h, wd, cin = x.shape
    k = w.shape[0]
    p = k // 2
    assert w.shape[3] == 1 and h % block == 0 and wd % block == 0
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    # K[ky, kx, c, block*a+b] = W[ky-a, kx-b, c] (zero outside tap range).
    # Built with trace-safe jnp ops — w is a jit argument in the engines.
    w0 = jnp.asarray(w[..., 0], jnp.float32)                    # (k, k, cin)
    kern = jnp.stack(
        [jnp.pad(w0, ((a, block - 1 - a), (bb, block - 1 - bb), (0, 0)))
         for a in range(block) for bb in range(block)],
        axis=-1).astype(x.dtype)                     # (k+block-1,…,cin,block²)
    planes = jax.lax.conv_general_dilated(
        xp, kern, window_strides=(block, block), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)       # (n, h/8, w/8, 64)
    hb, wb = h // block, wd // block
    y = planes.reshape(n, hb, wb, block, block)
    y = jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(n, h, wd, 1)
    if b is not None:
        y = y + jnp.asarray(b, jnp.float32)
    if act == "tanh":
        y = jnp.tanh(y)
    return y.astype(x.dtype)


# --------------------------------------------------------------------------- #
# XLA variant: shift-channel conv with the PRECEDING IN+ReLU fused in.
#
# The engines' last stage is convT → IN → ReLU → head conv. With the
# reflect-pad CONCAT structure above, XLA cannot fuse the normalize into the
# head conv's input (concat producers block conv-input fusion), so the
# normalize+ReLU materializes as a standalone 2-pass fusion — measured
# 6.4 ms of the 104 ms headline engine (fusion.22 in
# benchmarks/profile_headline_r5_postconv.json). This variant takes the RAW
# stage tensor plus its IN statistics (ops.nn.instance_norm_stats) and makes
# the main conv's input a pure elementwise expression — zero padding instead
# of reflect — which XLA fuses into the conv (one HBM pass, like the
# encoder's normalize→conv stages). Reflect-vs-zero padding only affects
# outputs within 3 px of the border; those are recomputed exactly by four
# tiny cout=1 strip convs on reflect-padded slices and pasted over (the
# pasted tensor is the 1-channel output, 67 MB — concats are trivial).
# Exact: interior windows never read padding (zero taps multiply zero pad),
# borders come from the exact reflect strips.
# --------------------------------------------------------------------------- #
def head_conv_tanh_shift_prenorm(x: jnp.ndarray, mean: jnp.ndarray,
                                 rsigma: jnp.ndarray, w: jnp.ndarray,
                                 b: Optional[jnp.ndarray] = None,
                                 act: str = "tanh",
                                 block: int = 8) -> jnp.ndarray:
    """relu(IN(x)) → 7×7 reflect conv to ONE channel (+ bias/tanh), with the
    normalize+ReLU fused into the conv input instead of materialized.

    ``mean``/``rsigma`` are fp32 (N,1,1,C) from
    :func:`cistar_tpu.ops.nn.instance_norm_stats`. Bit-compatible with
    ``relu(instance_norm(x))`` followed by :func:`head_conv_tanh_shift`
    (same normalize math, same bf16 rounding point, same tap sums).
    """
    n, h, wd, cin = x.shape
    k = w.shape[0]
    p = k // 2
    assert w.shape[3] == 1 and h % block == 0 and wd % block == 0 \
        and h > 2 * block and wd > 2 * block
    dt = x.dtype

    def norm(v):
        # normalize → cast to activation dtype → ReLU: the exact op order of
        # relu(instance_norm(v)) so fused and unfused paths round alike.
        return jnp.maximum(((v.astype(jnp.float32) - mean) * rsigma)
                           .astype(dt), 0)

    w0 = jnp.asarray(w[..., 0], jnp.float32)                    # (k, k, cin)
    kern = jnp.stack(
        [jnp.pad(w0, ((a, block - 1 - a), (bb, block - 1 - bb), (0, 0)))
         for a in range(block) for bb in range(block)],
        axis=-1).astype(dt)                      # (k+block-1,…,cin,block²)
    # Main conv: zero padding, input = the lazy normalize expression (fuses).
    planes = jax.lax.conv_general_dilated(
        norm(x), kern, window_strides=(block, block),
        padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)       # (n, h/8, w/8, block²)
    hb, wb = h // block, wd // block
    y0 = jnp.transpose(planes.reshape(n, hb, wb, block, block),
                       (0, 1, 3, 2, 4)).reshape(n, h, wd, 1)

    # Exact reflect borders: four strip convs on normalized SLICES of x
    # (slice first, normalize after — each strip's normalize fuses into its
    # own tiny conv instead of forcing the full xn to materialize).
    wfull = jnp.asarray(w, dt)

    def conv_valid(v):
        return jax.lax.conv_general_dilated(
            v, wfull, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def row_strip(top: bool):
        if top:
            core, ghost = x[:, :2 * p], x[:, 1:p + 1][:, ::-1]
            rows = jnp.concatenate([ghost, core], 1)        # rows −3..5
        else:
            core, ghost = x[:, h - 2 * p:], x[:, h - p - 1:h - 1][:, ::-1]
            rows = jnp.concatenate([core, ghost], 1)        # rows h−6..h+2
        rows = norm(rows)
        left = rows[:, :, 1:p + 1][:, :, ::-1]
        right = rows[:, :, wd - p - 1:wd - 1][:, :, ::-1]
        return jnp.concatenate([left, rows, right], 2)      # (n,3p,wd+2p,c)

    def col_strip(leftside: bool):
        if leftside:
            core, ghost = x[:, :, :2 * p], x[:, :, 1:p + 1][:, :, ::-1]
            return norm(jnp.concatenate([ghost, core], 2))  # (n,h,3p,c)
        core, ghost = x[:, :, wd - 2 * p:], x[:, :, wd - p - 1:wd - 1][:, :, ::-1]
        return norm(jnp.concatenate([core, ghost], 2))

    top = conv_valid(row_strip(True))                       # (n,p,wd,1)
    bot = conv_valid(row_strip(False))
    lcol = conv_valid(col_strip(True))                      # (n,h−2p,p,1)
    rcol = conv_valid(col_strip(False))
    mid = jnp.concatenate([lcol, y0[:, p:h - p, p:wd - p], rcol], 2)
    y = jnp.concatenate([top, mid, bot], 1)
    if b is not None:
        y = y + jnp.asarray(b, jnp.float32)
    if act == "tanh":
        y = jnp.tanh(y)
    return y.astype(dt)


# --------------------------------------------------------------------------- #
# XLA variant: tap-planes matmul + one-hot depthwise shift-add.
# --------------------------------------------------------------------------- #
def head_conv_tanh_xla(x: jnp.ndarray, w: jnp.ndarray,
                       b: Optional[jnp.ndarray] = None,
                       act: str = "tanh") -> jnp.ndarray:
    """7×7 reflect conv to 1 channel via tap planes + depthwise shift-add."""
    n, h, wd, cin = x.shape
    k = w.shape[0]
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    wm = _tap_matrix(w, k * k, stride8=False).astype(x.dtype)   # (cin, 49)
    # fp32 tap planes: rounding each plane to bf16 before the 49-term
    # shift-add visibly degrades the sum (measured 1.6e-2 maxabs vs 5e-3).
    t = jnp.einsum("nhwc,ck->nhwk", xp, wm,
                   preferred_element_type=jnp.float32)          # (n,h+6,w+6,49)
    # One-hot depthwise conv: plane g keeps only its own (dy, dx) shift.
    kd = jnp.zeros((k, k, 1, k * k), jnp.float32)
    taps = np.arange(k * k)
    kd = kd.at[taps // k, taps % k, 0, taps].set(jnp.ones((k * k,), jnp.float32))
    y = jax.lax.conv_general_dilated(
        t, kd, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=k * k,
        preferred_element_type=jnp.float32)                     # (n,h,w,49)
    y = jnp.sum(y, axis=-1, keepdims=True)
    if b is not None:
        y = y + jnp.asarray(b, jnp.float32)
    if act == "tanh":
        y = jnp.tanh(y)
    return y.astype(x.dtype)


# --------------------------------------------------------------------------- #
# Pallas variant: tap matmul + constant-vector multiply-accumulate stages.
# --------------------------------------------------------------------------- #
def _head_kernel(x_ref, w_ref, selA_ref, selB_ref, b_ref, out_ref, xp_ref, *,
                 h: int, wd: int, wdp: int, cin: int, rows: int, act: str,
                 pre_in: bool, eps: float):
    k, p = 7, 3
    img = x_ref[0]                                    # (h, wd, cin)
    if wdp > wd + 2 * p:                              # zero the align pad
        xp_ref[:, wd + 2 * p:] = jnp.zeros(
            (h + 2 * p, wdp - wd - 2 * p, cin), xp_ref.dtype)
    if pre_in:
        xf = img.astype(jnp.float32)
        hw = h * wd
        mean = jnp.sum(xf, axis=(0, 1), keepdims=True) / hw
        msq = jnp.sum(xf * xf, axis=(0, 1), keepdims=True) / hw
        var = jnp.maximum(msq - mean * mean, 0.0)
        img = jnp.maximum((xf - mean) * jax.lax.rsqrt(var + eps), 0.0) \
            .astype(img.dtype)
    # Stage the reflect-padded image into a VMEM scratch REF whose width is
    # padded to a sublane-tile multiple (``wdp``): value-level concats and
    # reshapes at unaligned widths (wd+6) force Mosaic into pathological
    # relayouts (the round-4 wedge); static stores + a tile-aligned collapse
    # reshape do not.
    xp_ref[p:h + p, p:wd + p] = img
    for d in range(1, p + 1):                         # reflect rows
        xp_ref[p - d, p:wd + p] = img[d]
        xp_ref[h + p - 1 + d, p:wd + p] = img[h - 1 - d]
    for d in range(1, p + 1):                         # reflect cols (+corners)
        xp_ref[:, p - d] = xp_ref[:, p + d]
        xp_ref[:, wd + p - 1 + d] = xp_ref[:, wd + p - 1 - d]
    m = (rows + 2 * p) * wdp

    # ONE traced tile body: unrolling the tile loop makes the multi-MB
    # per-tile accumulator values live simultaneously and Mosaic's register
    # allocation goes superlinear (measured: 1 tile 5.5 s, 2 tiles 66 s,
    # 4 tiles wedged >400 s).
    def body(t, _):
        slab = xp_ref[pl.ds(t * rows, rows + 2 * p)]  # (rows+6, wdp, cin)
        t2 = jnp.dot(slab.reshape(m, cin), w_ref[...],
                     preferred_element_type=jnp.float32)
        t3 = t2.reshape(rows + 2 * p, wdp, 64)
        # dx reduction: 7 sublane-shifted multiply-adds by constant 0/1
        # lane vectors (NO iota/where — the round-4 Mosaic wedge).
        accA = t3[:, 0:wd, :] * selA_ref[0]
        for dx in range(1, k):
            accA = accA + t3[:, dx:dx + wd, :] * selA_ref[dx]
        # dy reduction: 7 leading-dim-shifted multiply-adds.
        accB = accA[0:rows] * selB_ref[0]
        for dy in range(1, k):
            accB = accB + accA[dy:dy + rows] * selB_ref[dy]
        y = jnp.sum(accB, axis=-1) + b_ref[0]
        if act == "tanh":
            y = jnp.tanh(y)
        out_ref[0, pl.ds(t * rows, rows), :] = y.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h // rows, body, 0)


def head_conv_tanh_pallas(x: jnp.ndarray, w: jnp.ndarray,
                          b: Optional[jnp.ndarray] = None,
                          act: str = "tanh",
                          rows: int = 64,
                          pre_in: bool = False,
                          eps: float = 1e-5,
                          interpret: bool = False) -> jnp.ndarray:
    """7×7 stride-1 reflect conv to ONE channel (+ fused tanh, optionally
    fused PRE-instance-norm+ReLU of the input).

    Input (N, H, W, Cin) bf16/fp32, weights HWIO (7, 7, Cin, 1); returns
    (N, H, W, 1). TPU-only fast path — callers fall back to
    ``ops.nn.conv2d_reflect`` elsewhere.
    """
    n, h, wd, cin = x.shape
    k, p = w.shape[0], w.shape[0] // 2
    assert k == 7 and w.shape[3] == 1 and h > 2 * p and wd > 2 * p
    if h % rows:
        rows = next(r for r in (64, 32, 16, 8, 4, 2, 1) if h % r == 0)
    wm = _tap_matrix(w, 64, stride8=True).astype(x.dtype)       # (cin, 64)
    lanes = np.arange(64)
    selA = jnp.asarray((lanes[None, :] % 8 == np.arange(k)[:, None])
                       & (lanes[None, :] < 56), jnp.float32)    # (7, 64)
    selB = jnp.asarray(lanes[None, :] // 8 == np.arange(k)[:, None],
                       jnp.float32)                             # (7, 64)
    b0 = jnp.asarray(b if b is not None else jnp.zeros(1), jnp.float32) \
        .reshape(1)
    # Sublane-tile-aligned padded width: 16 for bf16, 8 for fp32 scratch.
    align = 16 if x.dtype == jnp.bfloat16 else 8
    wdp = -(-(wd + 2 * p) // align) * align
    kern = functools.partial(_head_kernel, h=h, wd=wd, wdp=wdp, cin=cin,
                             rows=rows, act=act, pre_in=pre_in, eps=eps)
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, wd, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((cin, 64), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, 64), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, 64), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1,), lambda i: (0,),
                               memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.VMEM((h + 2 * p, wdp, cin), x.dtype)],
        out_specs=pl.BlockSpec((1, h, wd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (h + 2 * p) * (wd + 2 * p) * cin * 64
            + 28 * n * h * wd * 64,
            bytes_accessed=n * h * wd * (cin + 1) * x.dtype.itemsize
            + cin * 64 * x.dtype.itemsize,
            transcendentals=n * h * wd if act == "tanh" else 0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wm, selA, selB, b0)
    return out[..., None]
