"""Core NHWC neural-net primitives with PyTorch-compatible geometry.

Everything here is a pure function over ``jnp`` arrays in **NHWC** layout
(TPU-native; the reference uses NCHW throughout). Weight layout is **HWIO**.
Semantics (padding geometry, transpose-conv output sizes, instance-norm eps,
leaky slopes) match the torch ops the reference uses, so converted checkpoints
produce equivalent outputs:

  * ``conv2d``            ↔ ``nn.Conv2d``              (e.g. ``CycleGAN/models.py:12``)
  * ``conv_transpose2d``  ↔ ``nn.ConvTranspose2d``     (``CycleGAN/models.py:53``)
  * ``instance_norm``     ↔ ``nn.InstanceNorm2d`` (affine=False, eps=1e-5)
  * ``reflection_pad2d``  ↔ ``nn.ReflectionPad2d``     (``CycleGAN/models.py:11``)
  * ``max_pool2d/avg_pool2d`` ↔ ``nn.MaxPool2d``/``nn.AvgPool2d``
  * ``upsample_bilinear`` ↔ ``nn.Upsample(scale_factor=2, mode='bilinear')``
                            (align_corners=False default, ``CycleGAN/models.py:580``)
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOr2 = Union[int, Tuple[int, int]]


def _pair(v: IntOr2) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


_DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: IntOr2 = 1,
    padding: IntOr2 = 0,
    dilation: IntOr2 = 1,
    groups: int = 1,
    preferred_dtype=jnp.float32,
) -> jnp.ndarray:
    """2-D convolution, NHWC activations / HWIO weights, torch ``Conv2d`` geometry."""
    s, p, d = _pair(stride), _pair(padding), _pair(dilation)
    for i, (k_i, s_i, p_i, d_i) in enumerate(zip(w.shape[:2], s, p, d)):
        eff_k = d_i * (k_i - 1) + 1
        if x.shape[1 + i] + 2 * p_i < eff_k:
            raise ValueError(
                f"conv2d: spatial dim {i} of size {x.shape[1 + i]} (pad {p_i}) is "
                f"smaller than the effective kernel {eff_k} — output would be "
                f"zero-sized (input too small for this network)")
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=s,
        padding=[(p[0], p[0]), (p[1], p[1])],
        rhs_dilation=d,
        dimension_numbers=_DIMS,
        feature_group_count=groups,
        # Output dtype follows the input: bf16 activations stay bf16 (the MXU
        # still accumulates in fp32 internally) and gradients stay
        # dtype-consistent under jax.grad. HIGHEST only affects fp32 inputs,
        # where it buys true fp32 instead of bf16-split passes.
        preferred_element_type=x.dtype,
        precision=lax.Precision.HIGHEST if x.dtype == jnp.float32 else None,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv2d_frozen_core(x: jnp.ndarray, w: jnp.ndarray, padding: int) -> jnp.ndarray:
    return conv2d(x, w, None, stride=1, padding=padding)


def _conv2d_frozen_fwd(x, w, padding):
    return _conv2d_frozen_core(x, w, padding), w


def _conv2d_frozen_bwd(padding, w, g):
    # Backward-data of a stride-1 conv IS a stride-1 conv: flip the kernel
    # spatially and swap in/out channels (HWIO -> HW(O)(I)), pad k-1-p. Stating
    # it explicitly keeps XLA on the same NHWC/HWIO layout as every forward
    # conv; the autodiff-generated transposed conv at 1024^2 picked layouts
    # that cost ~11 ms/iter of bf16 {0,3,2,1} copies
    # (benchmarks/profile_gatys1024.json, VERDICT r4 #3).
    k = w.shape[0]
    wt = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    dx = conv2d(g, wt, None, stride=1, padding=k - 1 - padding)
    return (dx, jnp.zeros_like(w))  # zero w-cotangent: frozen weights, DCE'd


_conv2d_frozen_core.defvjp(_conv2d_frozen_fwd, _conv2d_frozen_bwd)


def conv2d_frozen(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    padding: int = 0,
) -> jnp.ndarray:
    """Stride-1 ``conv2d`` for FROZEN weights (feature extractors).

    Forward is identical to :func:`conv2d`; the custom VJP expresses the
    image gradient as a plain forward conv with the flipped kernel instead of
    XLA's auto-derived transposed conv, which eliminates the backward layout
    copies in gradient-heavy programs (Gatys L-BFGS, perceptual losses).
    Weights receive a zero cotangent — only use where they are not trained
    (the reference freezes VGG the same way, ``IST/main.py:30-38``).
    """
    out = _conv2d_frozen_core(x, w, int(padding))
    if b is not None:
        out = out + lax.stop_gradient(b).astype(out.dtype)
    return out


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: IntOr2 = 1,
    padding: IntOr2 = 0,
    output_padding: IntOr2 = 0,
    dilation: IntOr2 = 1,
    preferred_dtype=jnp.float32,
) -> jnp.ndarray:
    """Transposed conv with torch ``ConvTranspose2d`` output geometry.

    ``w`` is HWIO with I=input channels, O=output channels, spatially
    *unflipped* (converted from torch's (in,out,kh,kw) by transposition only).
    Implemented as an input-dilated conv with a spatially flipped kernel —
    exactly the gradient-of-conv formulation XLA maps onto the MXU.

    Output size per dim: ``(n-1)*s - 2p + d*(k-1) + op + 1``.
    """
    s, p, op, d = _pair(stride), _pair(padding), _pair(output_padding), _pair(dilation)
    kh, kw = w.shape[0], w.shape[1]
    w_flip = jnp.flip(w, axis=(0, 1))
    pads = []
    for k, pi, opi, di in ((kh, p[0], op[0], d[0]), (kw, p[1], op[1], d[1])):
        lo = di * (k - 1) - pi
        hi = di * (k - 1) - pi + opi
        pads.append((lo, hi))
    out = lax.conv_general_dilated(
        x,
        w_flip.astype(x.dtype),
        window_strides=(1, 1),
        padding=pads,
        lhs_dilation=s,
        rhs_dilation=d,
        dimension_numbers=_DIMS,
        preferred_element_type=x.dtype,
        precision=lax.Precision.HIGHEST if x.dtype == jnp.float32 else None,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def reflection_pad2d(x: jnp.ndarray, pad: IntOr2) -> jnp.ndarray:
    p = _pair(pad)
    return jnp.pad(x, ((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)), mode="reflect")


def replication_pad2d(x: jnp.ndarray, pad: IntOr2) -> jnp.ndarray:
    p = _pair(pad)
    return jnp.pad(x, ((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)), mode="edge")


def zero_pad2d(x: jnp.ndarray, pad: IntOr2) -> jnp.ndarray:
    p = _pair(pad)
    return jnp.pad(x, ((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)))


def pad2d(x: jnp.ndarray, pad: IntOr2, mode: str = "reflect") -> jnp.ndarray:
    if mode == "reflect":
        return reflection_pad2d(x, pad)
    if mode == "replicate":
        return replication_pad2d(x, pad)
    if mode == "zero":
        return zero_pad2d(x, pad)
    raise ValueError(f"unknown padding mode {mode!r}")


def instance_norm(x: jnp.ndarray, eps: float = 1e-5,
                  gamma: Optional[jnp.ndarray] = None,
                  beta: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Instance normalization over spatial dims (NHWC), torch defaults.

    ``nn.InstanceNorm2d`` default is affine=False, eps=1e-5,
    track_running_stats=False (used everywhere in the reference generators),
    i.e. pure per-(image, channel) standardization with no learned params.
    Statistics are computed in fp32 regardless of activation dtype.
    """
    xf = x.astype(jnp.float32)
    # E[x²]−E[x]² form: both moments accumulate in ONE pass over x (fp32
    # accumulators), where the centered form would force a second full read
    # after the mean. Saves an HBM traversal per layer; max observed
    # deviation vs the centered form is ~1e-6 relative on bf16 activations.
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    out = (xf - mean) * lax.rsqrt(var + eps)
    if gamma is not None:
        out = out * gamma.astype(jnp.float32)
    if beta is not None:
        out = out + beta.astype(jnp.float32)
    return out.astype(x.dtype)


def instance_norm_stats(x: jnp.ndarray, eps: float = 1e-5):
    """IN statistics only: fp32 ``(mean, rsigma)`` of shape (N, 1, 1, C).

    Split out so a consumer can apply the normalize lazily inside its own
    fusion: ``(x - mean) * rsigma`` as a conv-input expression fuses into
    the consuming convolution (one HBM pass), where ``instance_norm`` +
    consumer materializes the normalized tensor (an extra read + write of
    the full stage tensor — 6.4 ms at the headline engine's last stage).
    Identical moment math to :func:`instance_norm`.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean, lax.rsqrt(var + eps)


def batch_norm_inference(x, mean, var, gamma, beta, eps: float = 1e-5):
    """BatchNorm with given statistics (inference form), NHWC."""
    xf = x.astype(jnp.float32)
    out = (xf - mean) * lax.rsqrt(var + eps) * gamma + beta
    return out.astype(x.dtype)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * negative_slope)


def tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.tanh(x)


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(x)


def _max_pool_reduce(x: jnp.ndarray, k, s, p) -> jnp.ndarray:
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)),
    )


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_2x2(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Non-overlapping 2x2/stride-2 max pool with a fast, gather-free VJP.

    XLA's default reduce_window gradient lowers to SelectAndScatter, which is
    slow on TPU. For the non-overlapping case (VGG pools), the backward pass
    is an elementwise mask: route the cotangent to the first max element of
    each window (torch ``MaxPool2d`` tie-breaking), computed with a reshape +
    cumulative mask — pure VPU work, no scatter.
    """
    return _max_pool_reduce(x, (2, 2), (2, 2), (0, 0))


def _max_pool_2x2_fwd(x, hw):
    out = _max_pool_2x2(x, hw)
    return out, (x, out)


def _max_pool_2x2_bwd(hw, res, g):
    x, out = res
    n, h, w, c = x.shape
    # Fully elementwise NHWC formulation: no 6-D window transposes (those
    # materialized multi-hundred-MB layout copies at VGG scales — the round-5
    # Gatys 1024² profile showed them as the top copy ops). ``out``/``g`` are
    # upsampled as broadcasts that fuse into the mask pass; torch's
    # first-max-in-row-major-window tie-break is reproduced by masking out
    # positions whose earlier-in-window neighbors (via static rolls — safe:
    # wrapped rows/cols land only on parities that never consume them) also
    # hit the max.
    up = lambda t: jnp.broadcast_to(
        t[:, :, None, :, None, :], (n, h // 2, 2, w // 2, 2, c)
    ).reshape(n, h, w, c)
    m = x == up(out)
    ml = jnp.roll(m, 1, axis=2)                        # m(y, x-1)
    mu = jnp.roll(m, 1, axis=1)                        # m(y-1, x)
    mul_ = jnp.roll(ml, 1, axis=1)                     # m(y-1, x-1)
    mur = jnp.roll(jnp.roll(m, -1, axis=2), 1, axis=1)  # m(y-1, x+1)
    odd_y = (jnp.arange(h) % 2 == 1)[None, :, None, None]
    odd_x = (jnp.arange(w) % 2 == 1)[None, None, :, None]
    prior = jnp.where(
        odd_y,
        jnp.where(odd_x, mul_ | mu | ml, mu | mur),
        jnp.where(odd_x, ml, False),
    )
    gx = jnp.where(m & ~prior, up(g), jnp.zeros((), g.dtype))
    return (gx,)


_max_pool_2x2.defvjp(_max_pool_2x2_fwd, _max_pool_2x2_bwd)


def max_pool2d(x: jnp.ndarray, kernel: IntOr2, stride: Optional[IntOr2] = None,
               padding: IntOr2 = 0) -> jnp.ndarray:
    k, p = _pair(kernel), _pair(padding)
    s = _pair(stride) if stride is not None else k
    if (k == (2, 2) and s == (2, 2) and p == (0, 0)
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        return _max_pool_2x2(x, (x.shape[1], x.shape[2]))
    return _max_pool_reduce(x, k, s, p)


@lru_cache(maxsize=None)
def _pool_counts(h: int, w: int, k, s, p):
    """Reciprocal valid-element counts per output pixel for
    count_include_pad=False average pooling ((ho, wo) float32 numpy)."""
    import numpy as _np

    padded = _np.zeros((h + 2 * p[0], w + 2 * p[1]), _np.float32)
    padded[p[0]:p[0] + h, p[1]:p[1] + w] = 1.0
    ho = (h + 2 * p[0] - k[0]) // s[0] + 1
    wo = (w + 2 * p[1] - k[1]) // s[1] + 1
    cnt = _np.zeros((ho, wo), _np.float32)
    for dy in range(k[0]):
        for dx in range(k[1]):
            cnt += padded[dy:dy + (ho - 1) * s[0] + 1:s[0],
                          dx:dx + (wo - 1) * s[1] + 1:s[1]]
    return 1.0 / cnt


def avg_pool2d(x: jnp.ndarray, kernel: IntOr2, stride: Optional[IntOr2] = None,
               padding: IntOr2 = 0, count_include_pad: bool = True) -> jnp.ndarray:
    """Average pool matching torch ``nn.AvgPool2d`` (count_include_pad=True default)."""
    k, p = _pair(kernel), _pair(padding)
    s = _pair(stride) if stride is not None else k
    summed = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)),
    )
    if count_include_pad or (p[0] == 0 and p[1] == 0):
        out = summed / (k[0] * k[1])
    else:
        # edge-window counts, computed in numpy at trace time: shapes are
        # static, and a traced reduce_window(ones) makes XLA constant-fold a
        # full-resolution array per call site — minutes of compile in big
        # train steps (multiscale-D pyramids + their jvp/transpose copies)
        counts = jnp.asarray(
            _pool_counts(x.shape[1], x.shape[2], k, s, p))[None, :, :, None]
        out = summed * counts
    return out.astype(x.dtype)


def global_avg_pool(x: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """Global spatial mean — the PatchGAN pooled head (``CycleGAN/models.py:97``)."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=keepdims).astype(x.dtype)


def upsample_bilinear(x: jnp.ndarray, scale_factor: int = 2,
                      align_corners: bool = False) -> jnp.ndarray:
    """Bilinear 2x upsample matching torch ``nn.Upsample(mode='bilinear')``.

    torch's default align_corners=False is half-pixel-centered resize, which is
    ``jax.image.resize(method='linear')``'s convention.
    """
    n, h, w, c = x.shape
    new = (n, h * scale_factor, w * scale_factor, c)
    if align_corners:
        # align_corners=True: corner-aligned sampling grid.
        return _resize_align_corners(x, (h * scale_factor, w * scale_factor))
    return jax.image.resize(x, new, method="linear").astype(x.dtype)


def _resize_align_corners(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    n, h, w, c = x.shape
    oh, ow = size
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).astype(jnp.float32)[None, :, None, None]
    wx = (xs - x0).astype(jnp.float32)[None, None, :, None]
    xf = x.astype(jnp.float32)
    top = xf[:, y0][:, :, x0] * (1 - wx) + xf[:, y0][:, :, x1] * wx
    bot = xf[:, y1][:, :, x0] * (1 - wx) + xf[:, y1][:, :, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(x.dtype)


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="linear").astype(x.dtype)


def resize_bicubic(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="cubic").astype(x.dtype)


def dropout(x: jnp.ndarray, rate: float, rng: jax.Array, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0).astype(x.dtype)


def instance_norm_act(x: jnp.ndarray, act: str = "none",
                      residual: Optional[jnp.ndarray] = None,
                      eps: float = 1e-5,
                      negative_slope: float = 0.2) -> jnp.ndarray:
    """Instance norm + activation (+ residual), using the fused Pallas kernel
    on TPU when the per-image block fits VMEM (see ops.pallas_kernels)."""
    from cistar_tpu.ops.pallas_kernels import fused_instance_norm_act

    return fused_instance_norm_act(x, act=act, eps=eps,
                                   negative_slope=negative_slope,
                                   residual=residual)


def conv2d_reflect(x: jnp.ndarray, w: jnp.ndarray,
                   b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Stride-1 "same" conv with reflection padding, without materializing the
    padded activation.

    ``ReflectionPad2d(p) → Conv2d(k)`` costs a full extra HBM round trip for
    the padded copy (XLA folds only ZERO padding into the conv itself). This
    assembles the output from a VALID conv over the untouched interior plus
    thin border strips convolved over reflect-padded contexts, joined by
    concatenation (no read-modify-write patching). Identical to the padded
    computation bit-for-bit.
    """
    k = w.shape[0]
    p = (k - 1) // 2
    n, h, wd, _ = x.shape

    def vconv(s):
        return conv2d(s, w, b, stride=1, padding=0)

    interior = vconv(x)  # (h-2p, wd-2p), valid everywhere

    xw = jnp.pad(x, ((0, 0), (0, 0), (p, p), (0, 0)), mode="reflect")
    top_ctx = jnp.concatenate(
        [jnp.flip(xw[:, 1:p + 1], axis=1), xw[:, :2 * p]], axis=1)
    top = vconv(top_ctx)                       # (p, wd)
    bot_ctx = jnp.concatenate(
        [xw[:, h - 2 * p:], jnp.flip(xw[:, h - p - 1:h - 1], axis=1)], axis=1)
    bot = vconv(bot_ctx)                       # (p, wd)

    left_ctx = jnp.concatenate(
        [jnp.flip(x[:, :, 1:p + 1], axis=2), x[:, :, :2 * p]], axis=2)
    left = vconv(left_ctx)                     # (h-2p, p)
    right_ctx = jnp.concatenate(
        [x[:, :, wd - 2 * p:], jnp.flip(x[:, :, wd - p - 1:wd - 1], axis=2)],
        axis=2)
    right = vconv(right_ctx)                   # (h-2p, p)

    middle = jnp.concatenate([left, interior, right], axis=2)  # (h-2p, wd)
    return jnp.concatenate([top, middle, bot], axis=1)         # (h, wd)


def conv2d_reflect_thin(x: jnp.ndarray, w: jnp.ndarray,
                        b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reflect-pad conv specialized for 1-channel ends (the c7s1 stem on
    grayscale radar and the 1-channel output head).

    Odd-kernel convs with cin==1 or cout==1 run the MXU at 1/128 lane
    utilization under the standard lowering (measured: the 7×7 head was 31%
    of the whole 512² pix2pixHD int8 engine's device time). Re-expressed:

      * cout==1 → one (C → k²) matmul (full-rate MXU) + a k²-tap shift-sum;
      * cin==1  → k²-tap im2col stack + one (k² → C) matmul.

    Falls back to :func:`conv2d_reflect` for thick tensors.
    """
    kh, kw = w.shape[0], w.shape[1]
    if kh != kw or kh % 2 == 0 or kh < 3:
        return conv2d_reflect(x, w, b)
    k, p = kh, kh // 2
    n, h, wd = x.shape[0], x.shape[1], x.shape[2]
    if w.shape[3] == 1 and w.shape[2] > 1:       # head: many → 1
        wm = w[..., 0].reshape(k * k, w.shape[2]).T        # (C, k²)
        z = jnp.einsum("nhwc,ct->nhwt", x, wm.astype(x.dtype))
        zp = jnp.pad(z, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        out = jnp.zeros((n, h, wd), x.dtype)
        for t in range(k * k):
            dy, dx = t // k, t % k
            out = out + zp[:, dy:dy + h, dx:dx + wd, t]
        out = out[..., None]
    elif w.shape[2] == 1 and w.shape[3] > 1:     # stem: 1 → many
        xp = jnp.pad(x[..., 0], ((0, 0), (p, p), (p, p)), mode="reflect")
        cols = jnp.stack([xp[:, t // k:t // k + h, t % k:t % k + wd]
                          for t in range(k * k)], axis=-1)  # (n,h,w,k²)
        wm = w[:, :, 0, :].reshape(k * k, -1)              # (k², Cout)
        out = jnp.einsum("nhwt,to->nhwo", cols, wm.astype(x.dtype))
    else:
        return conv2d_reflect(x, w, b)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def upconv2x_bilinear(x: jnp.ndarray, w: jnp.ndarray,
                      b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``conv2d(upsample_bilinear(x, 2), w, padding=1)`` in ONE low-res conv.

    The half-pixel bilinear 2x upsample is a fixed 2-tap linear map per
    output phase, so conv3x3 ∘ upsample2x composes into FOUR phase kernels
    of support 3x3 over the LOW-res grid: one dense conv producing
    ``4·cout`` channels followed by a depth-to-space unpack. Same MACs as
    the high-res conv, but 4x the output channels at 1/4 the spatial size
    (full MXU lanes for thin models) and the (2H,2W,C) upsampled tensor is
    never materialized — the decoder-stage treatment for the thin CycleGAN
    families, mirroring the head conv's shift-channel trick.

    Interior is the exact composition; the upsample's edge clamping and the
    conv's high-res zero pad make the 2-px output borders differ, so they
    are recomputed exactly from 3-row/3-col slabs of the reference path and
    pasted over. fp32-exact vs the two-op composition (unit-tested); under
    bf16 the two paths round differently but equivalently.
    """
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    if h < 3 or wd < 3:
        y = conv2d(upsample_bilinear(x, 2), w, None, padding=1)
        return y if b is None else y + b.astype(y.dtype)
    w32 = jnp.asarray(w, jnp.float32)
    # A[p, t, o+1] = coefficient of x[i+o] in up[2i + p + t - 1]
    # (up[2j]   = 0.25·x[j-1] + 0.75·x[j];
    #  up[2j+1] = 0.75·x[j]   + 0.25·x[j+1])
    rows = []
    u = ({-1: 0.25, 0: 0.75}, {0: 0.75, 1: 0.25})
    for p in (0, 1):
        for t in range(3):
            s = p + t - 1
            j_off, pp = s >> 1, s & 1
            row = [0.0, 0.0, 0.0]
            for d, coef in u[pp].items():
                row[j_off + d + 1] += coef
            rows.append(row)
    A = jnp.asarray(rows, jnp.float32).reshape(2, 3, 3)
    # eff[py, px, oy, ox, ci, co] = Σ_ty,tx w[ty,tx]·A[py,ty,oy]·A[px,tx,ox]
    eff = jnp.einsum("yxio,pya,qxb->pqabio", w32, A, A)
    wconv = eff.transpose(2, 3, 4, 0, 1, 5).reshape(3, 3, cin, 4 * cout)
    y4 = conv2d(x, wconv.astype(x.dtype), None, padding=1)
    y = y4.reshape(n, h, wd, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(n, 2 * h, 2 * wd, cout)

    def strip(xs):
        return conv2d(xs, w, None, padding=1)

    # top/bottom: 3 low-res rows reproduce high-res rows 0..2 / -3..-1
    top = strip(upsample_bilinear(x[:, :3], 2)[:, :3])[:, :2]
    bot = strip(upsample_bilinear(x[:, h - 3:], 2)[:, -3:])[:, -2:]
    # left/right: full-height 3-col slabs (exact at the corners too)
    left = strip(upsample_bilinear(x[:, :, :3], 2)[:, :, :3])[:, :, :2]
    right = strip(upsample_bilinear(x[:, :, wd - 3:], 2)[:, :, -3:])[:, :, -2:]
    y = y.at[:, :2].set(top).at[:, -2:].set(bot)
    y = y.at[:, :, :2].set(left).at[:, :, -2:].set(right)
    return y if b is None else y + b.astype(y.dtype)
