"""Spatially-sharded model forwards built on ``parallel.spatial``.

For resolutions whose activations exceed one chip's HBM (the reference's
1024² global+local config at batch>1, or larger radar maps), these run the
pix2pixHD ``GlobalGenerator`` architecture with the image's H axis sharded
across the mesh: convs exchange halo rows over ICI, instance-norm statistics
reduce with ``psum``, and the output comes back sharded the same way. Uses
the exact params tree of ``models.pix2pixhd.GlobalGenerator`` — one set of
weights serves both the single-chip and the sharded path.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from cistar_tpu.ops import nn as tnn
from cistar_tpu.parallel import spatial as sp


def _wb(node: Dict[str, Any]):
    return node["w"], node.get("b")


def global_generator_slab_forward(params: Dict[str, Any], x: jnp.ndarray,
                                  n_downsampling: int, n_blocks: int,
                                  axis_name: str = sp.SPATIAL_AXIS) -> jnp.ndarray:
    """GlobalGenerator forward on one H-slab (call under shard_map)."""
    trunk = params["trunk"]

    w, b = _wb(trunk["stem"]["conv"])
    h = sp.spatial_conv2d(x, w, b, 1, (w.shape[0] - 1) // 2, "reflect", axis_name)
    h = tnn.relu(sp.spatial_instance_norm(h, axis_name=axis_name))

    for i in range(n_downsampling):
        w, b = _wb(trunk[f"down_{i}"]["conv"])
        h = sp.spatial_conv2d(h, w, b, 2, 1, "zero", axis_name)
        h = tnn.relu(sp.spatial_instance_norm(h, axis_name=axis_name))

    for i in range(n_blocks):
        blk = trunk[f"res_{i}"]
        w, b = _wb(blk["conv1"])
        r = sp.spatial_conv2d(h, w, b, 1, 1, "reflect", axis_name)
        r = tnn.relu(sp.spatial_instance_norm(r, axis_name=axis_name))
        w, b = _wb(blk["conv2"])
        r = sp.spatial_conv2d(r, w, b, 1, 1, "reflect", axis_name)
        h = h + sp.spatial_instance_norm(r, axis_name=axis_name)

    for i in range(n_downsampling):
        w, b = _wb(trunk[f"up_{i}"]["convt"])
        h = sp.spatial_conv_transpose2d(h, w, b, axis_name)
        h = tnn.relu(sp.spatial_instance_norm(h, axis_name=axis_name))

    w, b = _wb(params["head"]["conv"])
    h = sp.spatial_conv2d(h, w, b, 1, (w.shape[0] - 1) // 2, "reflect", axis_name)
    return tnn.tanh(h)


def global_generator_sharded_apply(params: Dict[str, Any], x: jnp.ndarray,
                                   mesh: Mesh, n_downsampling: int = 3,
                                   n_blocks: int = 9,
                                   axis_name: str = sp.SPATIAL_AXIS) -> jnp.ndarray:
    """Run GlobalGenerator with H sharded over ``axis_name`` of ``mesh``.

    Requires H divisible by ``mesh_axis_size · 2^n_downsampling`` so every
    stride keeps slabs even.
    """
    n_shards = mesh.shape[axis_name]
    assert x.shape[1] % (n_shards * 2 ** n_downsampling) == 0, (
        f"H={x.shape[1]} must divide evenly into {n_shards} shards "
        f"through {n_downsampling} stride-2 stages")

    fn = shard_map(
        lambda p, s: global_generator_slab_forward(p, s, n_downsampling,
                                                   n_blocks, axis_name),
        mesh=mesh,
        in_specs=(P(), P(None, axis_name, None, None)),
        out_specs=P(None, axis_name, None, None),
        check_vma=False,
    )
    return fn(params, x)


def local_enhancer_slab_forward(params: Dict[str, Any], x: jnp.ndarray,
                                n_downsample_global: int, n_blocks_global: int,
                                n_local_enhancers: int, n_blocks_local: int,
                                axis_name: str = sp.SPATIAL_AXIS) -> jnp.ndarray:
    """LocalEnhancer forward on one H-slab: sharded input pyramid (halo
    avg-pool), sharded global trunk at the coarse scale, sharded enhancer
    streams, output head. Parity with ``models.pix2pixhd.LocalEnhancer``."""
    pyramid = [x]
    for _ in range(n_local_enhancers):
        pyramid.append(sp.spatial_avg_pool_3s2(pyramid[-1], axis_name))

    g = params["global"]
    w, b = _wb(g["stem"]["conv"])
    h = sp.spatial_conv2d(pyramid[-1], w, b, 1, (w.shape[0] - 1) // 2,
                          "reflect", axis_name)
    h = tnn.relu(sp.spatial_instance_norm(h, axis_name=axis_name))
    for i in range(n_downsample_global):
        w, b = _wb(g[f"down_{i}"]["conv"])
        h = sp.spatial_conv2d(h, w, b, 2, 1, "zero", axis_name)
        h = tnn.relu(sp.spatial_instance_norm(h, axis_name=axis_name))
    for i in range(n_blocks_global):
        blk = g[f"res_{i}"]
        w, b = _wb(blk["conv1"])
        r = sp.spatial_conv2d(h, w, b, 1, 1, "reflect", axis_name)
        r = tnn.relu(sp.spatial_instance_norm(r, axis_name=axis_name))
        w, b = _wb(blk["conv2"])
        r = sp.spatial_conv2d(r, w, b, 1, 1, "reflect", axis_name)
        h = h + sp.spatial_instance_norm(r, axis_name=axis_name)
    for i in range(n_downsample_global):
        w, b = _wb(g[f"up_{i}"]["convt"])
        h = sp.spatial_conv_transpose2d(h, w, b, axis_name)
        h = tnn.relu(sp.spatial_instance_norm(h, axis_name=axis_name))

    for n in range(1, n_local_enhancers + 1):
        inp = pyramid[n_local_enhancers - n]
        w, b = _wb(params[f"enh{n}_stem"]["conv"])
        d = sp.spatial_conv2d(inp, w, b, 1, (w.shape[0] - 1) // 2,
                              "reflect", axis_name)
        d = tnn.relu(sp.spatial_instance_norm(d, axis_name=axis_name))
        w, b = _wb(params[f"enh{n}_down"]["conv"])
        d = sp.spatial_conv2d(d, w, b, 2, 1, "zero", axis_name)
        d = tnn.relu(sp.spatial_instance_norm(d, axis_name=axis_name))
        h = d + h
        for i in range(n_blocks_local):
            blk = params[f"enh{n}_res_{i}"]
            w, b = _wb(blk["conv1"])
            r = sp.spatial_conv2d(h, w, b, 1, 1, "reflect", axis_name)
            r = tnn.relu(sp.spatial_instance_norm(r, axis_name=axis_name))
            w, b = _wb(blk["conv2"])
            r = sp.spatial_conv2d(r, w, b, 1, 1, "reflect", axis_name)
            h = h + sp.spatial_instance_norm(r, axis_name=axis_name)
        w, b = _wb(params[f"enh{n}_up"]["convt"])
        h = sp.spatial_conv_transpose2d(h, w, b, axis_name)
        h = tnn.relu(sp.spatial_instance_norm(h, axis_name=axis_name))
    w, b = _wb(params["head"]["conv"])
    h = sp.spatial_conv2d(h, w, b, 1, (w.shape[0] - 1) // 2, "reflect", axis_name)
    return tnn.tanh(h)


def local_enhancer_sharded_apply(params: Dict[str, Any], x: jnp.ndarray,
                                 mesh: Mesh, n_downsample_global: int = 3,
                                 n_blocks_global: int = 9,
                                 n_local_enhancers: int = 1,
                                 n_blocks_local: int = 3,
                                 axis_name: str = sp.SPATIAL_AXIS) -> jnp.ndarray:
    """Run LocalEnhancer with H sharded over ``axis_name`` (the 1024²+
    coarse-to-fine configuration spread over the mesh)."""
    n_shards = mesh.shape[axis_name]
    need = n_shards * 2 ** (n_downsample_global + n_local_enhancers)
    assert x.shape[1] % need == 0, (
        f"H={x.shape[1]} must divide {need} (shards x total downsamples)")
    fn = shard_map(
        lambda p, s: local_enhancer_slab_forward(
            p, s, n_downsample_global, n_blocks_global, n_local_enhancers,
            n_blocks_local, axis_name),
        mesh=mesh,
        in_specs=(P(), P(None, axis_name, None, None)),
        out_specs=P(None, axis_name, None, None),
        check_vma=False,
    )
    return fn(params, x)


def unet_msrb_slab_forward(params: Dict[str, Any], x: jnp.ndarray,
                           n_residual_blocks: int = 3,
                           axis_name: str = sp.SPATIAL_AXIS) -> jnp.ndarray:
    """p2pHD UNet-MSRB generator (the trained r2l_MSRB config) on an H-slab:
    7x7 stride-2 halo downs, MSRB stages (k3/k5 halo convs), skip concats
    (same H sharding on both sides), transpose-conv ups."""
    w, b = _wb(params["init_block"]["conv"])
    h = sp.spatial_conv2d(x, w, b, 1, 3, "reflect", axis_name)
    h = tnn.relu(sp.spatial_instance_norm(h, axis_name=axis_name))
    skips = []
    for i in range(3):
        w, b = _wb(params[f"down_{i}_conv"])
        h = sp.spatial_conv2d(h, w, b, 2, 3, "zero", axis_name)
        h = tnn.relu(sp.spatial_instance_norm(h, axis_name=axis_name))
        skips.append(h)
    for i in range(n_residual_blocks):
        blk = params[f"msrb_{i}"]

        def conv(h_, name, k):
            w_, b_ = _wb(blk[name])
            return sp.spatial_conv2d(h_, w_, b_, 1, (k - 1) // 2, "zero",
                                     axis_name)

        b00 = tnn.relu(conv(h, "b00_conv", 3))
        b01 = tnn.relu(conv(h, "b01_conv", 5))
        cat1 = jnp.concatenate([b00, b01], axis=-1)
        b10 = tnn.relu(conv(cat1, "b10_conv", 3))
        b11 = tnn.relu(conv(cat1, "b11_conv", 5))
        cat2 = jnp.concatenate([b10, b11], axis=-1)
        w_, b_ = _wb(blk["out_conv"])
        h = sp.spatial_conv2d(cat2, w_, b_, 1, 0, "zero", axis_name)
    for i in range(3):
        skip = skips[2 - i]
        h = jnp.concatenate([h, skip], axis=-1)
        w, b = _wb(params[f"up_{i}_convt"])
        h = sp.spatial_conv_transpose2d(h, w, b, axis_name)
        h = tnn.relu(sp.spatial_instance_norm(h, axis_name=axis_name))
    w, b = _wb(params["output_layer"]["conv"])
    h = sp.spatial_conv2d(h, w, b, 1, 3, "reflect", axis_name)
    return tnn.tanh(h)


def unet_msrb_sharded_apply(params: Dict[str, Any], x: jnp.ndarray, mesh: Mesh,
                            n_residual_blocks: int = 3,
                            axis_name: str = sp.SPATIAL_AXIS) -> jnp.ndarray:
    n_shards = mesh.shape[axis_name]
    assert x.shape[1] % (n_shards * 8) == 0
    fn = shard_map(
        lambda p, s: unet_msrb_slab_forward(p, s, n_residual_blocks, axis_name),
        mesh=mesh,
        in_specs=(P(), P(None, axis_name, None, None)),
        out_specs=P(None, axis_name, None, None),
        check_vma=False,
    )
    return fn(params, x)
