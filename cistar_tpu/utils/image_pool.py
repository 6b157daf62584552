"""Functional replay buffer (fake-image history pool) — device resident.

Reference: CycleGAN ``ReplayBuffer`` (``CycleGAN/utils.py:94-114``) and the
identical-semantics pix2pixHD ``ImagePool`` (``p2pHD/util/image_pool.py:4-31``):
a 50-image pool; each incoming fake fills the pool until full, afterwards with
p=0.5 it swaps with a random stored image (the old one is returned to the
discriminator) else passes through.

TPU-native: the pool is a fixed-shape device array inside the jitted train
step; updates are dynamic-update-slices driven by a PRNG key, so the whole
GAN step — pool included — compiles to one XLA program with no host traffic.
Per-element sequential semantics are preserved with a ``lax.scan`` over the
(small, static) batch dimension.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class PoolState(NamedTuple):
    images: jnp.ndarray   # (capacity, H, W, C)
    size: jnp.ndarray     # int32 current fill


def init_pool(capacity: int, image_shape: Tuple[int, ...],
              dtype=jnp.float32) -> PoolState:
    return PoolState(
        images=jnp.zeros((capacity,) + tuple(image_shape), dtype),
        size=jnp.zeros((), jnp.int32),
    )


def push_and_pop(state: PoolState, batch: jnp.ndarray,
                 rng: jax.Array) -> Tuple[PoolState, jnp.ndarray]:
    """Insert a batch of fakes, returning the images to train D on.

    Exactly mirrors ``ReplayBuffer.push_and_pop``: element-sequential; while
    the pool is not full each element is stored and passed through; once full,
    a fair coin decides between swap-with-random-slot (return the old image)
    and pass-through.
    """
    capacity = state.images.shape[0]
    batch = batch.astype(state.images.dtype)

    def body(carry, inp):
        images, size = carry
        img, key = inp
        k_coin, k_idx = jax.random.split(key)
        not_full = size < capacity
        use_swap = jax.random.uniform(k_coin) > 0.5
        idx_rand = jax.random.randint(k_idx, (), 0, capacity)
        # slot to write: fill position while filling; random slot on swap
        write_idx = jnp.where(not_full, size, idx_rand)
        do_write = not_full | use_swap
        old = images[write_idx]
        new_row = jnp.where(do_write, img, old)
        images = lax.dynamic_update_index_in_dim(images, new_row, write_idx, 0)
        out = jnp.where(not_full | ~use_swap, img, old)
        size = jnp.where(not_full, size + 1, size)
        return (images, size), out

    keys = jax.random.split(rng, batch.shape[0])
    (images, size), outs = lax.scan(body, (state.images, state.size), (batch, keys))
    return PoolState(images, size), outs
