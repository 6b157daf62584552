"""Spatial sharding with halo exchange — high-resolution scaling over the mesh.

The reference's "scale the size axis" story is single-GPU pyramids
(SURVEY.md §5: coarse-to-fine Gatys, pix2pixHD LocalEnhancer). On TPU the
idiomatic scale-out for ≥1024² activations that exceed one chip's HBM is to
shard the image's H dimension across the mesh and run convs under
``shard_map`` with **halo exchange**: each device holds an H-slab, exchanges
``halo`` boundary rows with its ring neighbors via ``ppermute`` (ICI traffic =
a few rows, overlapped by XLA), and reflect-pads only at the true image
boundary. Instance-norm statistics become ``psum`` reductions over the spatial
axis. This is the conv analogue of ring/context parallelism for attention.

Public surface:
  * :func:`halo_exchange`      — ring exchange of boundary rows.
  * :func:`spatial_conv2d`     — conv on an H-slab (stride 1/2) with correct
                                 global-boundary padding semantics.
  * :func:`spatial_pad`        — reflect/zero pad that only pads true edges.
  * :func:`spatial_instance_norm` — IN with cross-shard statistics.
  * :func:`sharded_apply`      — run a (slab → slab) function over a
                                 NamedSharding'd image batch via shard_map.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cistar_tpu.ops import nn as tnn

SPATIAL_AXIS = "spatial"


def _axis_index(axis_name: str):
    return lax.axis_index(axis_name)


def _axis_size(axis_name: str):
    return lax.axis_size(axis_name) if hasattr(lax, "axis_size") else lax.psum(1, axis_name)


def halo_exchange(x: jnp.ndarray, halo_up: int, halo_down: int,
                  axis_name: str = SPATIAL_AXIS) -> jnp.ndarray:
    """Prepend/append neighbor boundary rows to an NHWC H-slab.

    Devices form a line along ``axis_name``; rows received from out-of-range
    neighbors (the global edges) are garbage and must be overwritten by
    :func:`spatial_pad` — callers always pair the two.
    """
    n = _axis_size(axis_name)
    parts = []
    if halo_up > 0:
        # receive the last rows of the previous (upper) shard
        src_dst_down = [(i, (i + 1) % n) for i in range(n)]
        from_up = lax.ppermute(x[:, -halo_up:, :, :], axis_name, src_dst_down)
        parts.append(from_up)
    parts.append(x)
    if halo_down > 0:
        src_dst_up = [(i, (i - 1) % n) for i in range(n)]
        from_down = lax.ppermute(x[:, :halo_down, :, :], axis_name, src_dst_up)
        parts.append(from_down)
    return jnp.concatenate(parts, axis=1)


def spatial_pad(x: jnp.ndarray, pad: int, mode: str = "reflect",
                axis_name: str = SPATIAL_AXIS) -> jnp.ndarray:
    """Halo-exchange ``pad`` rows, then fix up the true top/bottom edges with
    the requested padding mode; W is padded locally (fully replicated)."""
    if pad == 0:
        return x
    idx = _axis_index(axis_name)
    n = _axis_size(axis_name)
    h = x.shape[1]
    y = halo_exchange(x, pad, pad, axis_name)
    # true-edge fixup: first shard's top pad rows / last shard's bottom rows
    if mode == "reflect":
        top_fix = jnp.flip(x[:, 1:pad + 1, :, :], axis=1)
        bot_fix = jnp.flip(x[:, h - pad - 1:h - 1, :, :], axis=1)
    elif mode == "zero":
        top_fix = jnp.zeros_like(x[:, :pad, :, :])
        bot_fix = jnp.zeros_like(x[:, :pad, :, :])
    elif mode == "replicate":
        top_fix = jnp.repeat(x[:, :1, :, :], pad, axis=1)
        bot_fix = jnp.repeat(x[:, -1:, :, :], pad, axis=1)
    else:
        raise ValueError(mode)
    is_first = (idx == 0)
    is_last = (idx == n - 1)
    y = y.at[:, :pad, :, :].set(
        jnp.where(is_first, top_fix, y[:, :pad, :, :]))
    y = y.at[:, -pad:, :, :].set(
        jnp.where(is_last, bot_fix, y[:, -pad:, :, :]))
    # pad W locally with the same mode
    if mode == "reflect":
        y = jnp.pad(y, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    elif mode == "replicate":
        y = jnp.pad(y, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="edge")
    else:
        y = jnp.pad(y, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    return y


def spatial_conv2d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None,
                   stride: int = 1, padding: int = 0, pad_mode: str = "zero",
                   axis_name: str = SPATIAL_AXIS) -> jnp.ndarray:
    """Conv over an H-slab with torch geometry.

    Requirements: the local H is divisible by ``stride`` and the kernel is
    odd-sized with ``padding == (k-1)//2`` (the "same"-style geometry every
    reference conv uses), so each shard's output rows depend only on its own
    slab plus ``padding`` halo rows.
    """
    k = w.shape[0]
    assert padding == (k - 1) // 2, "spatial_conv2d expects same-style padding"
    y = spatial_pad(x, padding, pad_mode, axis_name) if padding else x
    out = lax.conv_general_dilated(
        y, w.astype(y.dtype), window_strides=(stride, stride),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=y.dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def spatial_conv_transpose2d(x: jnp.ndarray, w: jnp.ndarray,
                             b: Optional[jnp.ndarray] = None,
                             axis_name: str = SPATIAL_AXIS) -> jnp.ndarray:
    """The k=3, stride=2, pad=1, output_padding=1 transpose conv (the only
    geometry the reference decoders use): output rows 2·H_local.

    With this geometry each output row depends on input rows ⌊(r+1)/2⌋±1, so
    one halo row on each side suffices.
    """
    kh = w.shape[0]
    assert kh == 3, "spatial_conv_transpose2d supports the 3x3/s2 decoder conv"
    idx = _axis_index(axis_name)
    n = _axis_size(axis_name)
    h = x.shape[1]
    # Output row 2·d·h + r needs dilated positions (2dh + r − 1 … + 1); odd
    # positions are inserted zeros, so the only cross-shard dependency is the
    # NEXT shard's first row (global row d·h + h). The global-top pad row is
    # an odd (zero) position, and for the last shard the missing halo equals
    # the output_padding zeros — so a zero halo is exact there.
    src_dst_up = [(i, (i - 1) % n) for i in range(n)]
    from_down = lax.ppermute(x[:, :1, :, :], axis_name, src_dst_up)
    from_down = jnp.where(idx == n - 1, jnp.zeros_like(from_down), from_down)
    y = jnp.concatenate([x, from_down], axis=1)  # h + 1 rows
    w_flip = jnp.flip(w, axis=(0, 1)).astype(y.dtype)
    out = lax.conv_general_dilated(
        y, w_flip, window_strides=(1, 1),
        padding=[(1, 0), (1, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=y.dtype,
    )
    # dilated length 2(h+1)−1 + pads(1) ⇒ output rows = 2h exactly
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def spatial_instance_norm(x: jnp.ndarray, eps: float = 1e-5,
                          axis_name: str = SPATIAL_AXIS) -> jnp.ndarray:
    """Instance norm whose spatial statistics reduce across shards (psum)."""
    xf = x.astype(jnp.float32)
    local_sum = jnp.sum(xf, axis=(1, 2), keepdims=True)
    local_sq = jnp.sum(jnp.square(xf), axis=(1, 2), keepdims=True)
    local_n = jnp.float32(x.shape[1] * x.shape[2])
    total = lax.psum(jnp.concatenate([local_sum, local_sq], axis=-1), axis_name)
    count = lax.psum(local_n, axis_name)
    c = x.shape[-1]
    mean = total[..., :c] / count
    var = total[..., c:] / count - jnp.square(mean)
    out = (xf - mean) * lax.rsqrt(jnp.maximum(var, 0) + eps)
    return out.astype(x.dtype)


def spatial_max_pool2(x: jnp.ndarray, axis_name: str = SPATIAL_AXIS) -> jnp.ndarray:
    """2x2/2 max pool on an even H-slab (no halo needed)."""
    return tnn.max_pool2d(x, 2, 2)


def sharded_apply(fn: Callable, x: jnp.ndarray, mesh: Mesh,
                  axis_name: str = SPATIAL_AXIS, params=None):
    """Run ``fn(params, slab)`` (or ``fn(slab)``) under shard_map with the H
    dim of ``x`` sharded over ``axis_name`` and params replicated."""
    from jax import shard_map

    in_specs = (P(), P(None, axis_name, None, None)) if params is not None \
        else (P(None, axis_name, None, None),)
    out_spec = P(None, axis_name, None, None)
    if params is not None:
        f = shard_map(lambda p, s: fn(p, s), mesh=mesh, in_specs=in_specs,
                      out_specs=out_spec, check_vma=False)
        return f(params, x)
    f = shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
                  check_vma=False)
    return f(x)


def spatial_avg_pool_3s2(x: jnp.ndarray,
                         axis_name: str = SPATIAL_AXIS) -> jnp.ndarray:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False) on an
    H-slab — the pix2pixHD pyramid downsampler (``networks.py:177``).

    Halo-exchanges one row each way (zeroed at the true edges) and divides by
    the true in-bounds window counts.
    """
    idx = _axis_index(axis_name)
    n = _axis_size(axis_name)
    h, w = x.shape[1], x.shape[2]
    y = halo_exchange(x, 1, 1, axis_name)
    zero_row = jnp.zeros_like(x[:, :1])
    y = y.at[:, :1].set(jnp.where(idx == 0, zero_row, y[:, :1]))
    y = y.at[:, -1:].set(jnp.where(idx == n - 1, zero_row, y[:, -1:]))
    y = jnp.pad(y, ((0, 0), (0, 0), (1, 1), (0, 0)))
    summed = lax.reduce_window(
        y.astype(jnp.float32), 0.0, lax.add,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (0, 0), (0, 0), (0, 0)))
    # window validity counts: rows valid except above-global-top/below-bottom,
    # cols valid except the padded W edges
    row_ids = jnp.arange(h + 2, dtype=jnp.float32)[None, :, None, None]
    global_row = row_ids + (idx * h - 1)
    total_h = n * h
    row_valid = ((global_row >= 0) & (global_row < total_h)).astype(jnp.float32)
    col_ids = jnp.arange(w + 2, dtype=jnp.float32)[None, None, :, None]
    col_valid = ((col_ids >= 1) & (col_ids <= w)).astype(jnp.float32)
    counts = lax.reduce_window(
        jnp.broadcast_to(row_valid * col_valid, (1, h + 2, w + 2, 1)),
        0.0, lax.add,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (0, 0), (0, 0), (0, 0)))
    return (summed / counts).astype(x.dtype)
