"""GAN objectives: LSGAN / BCE / WGAN-GP.

Parity targets:
  * CycleGAN: plain ``nn.MSELoss`` against 1/0 targets (``CycleGAN/train.py:115``),
    GAN term weighted ×10 (``train.py:202,208``).
  * p2pHD ``GANLoss``: LSGAN (MSE) or BCE-with-sigmoid, handling multiscale
    list-of-list predictions (``p2pHD/models/networks.py:80-122``).
  * WGAN gradient penalty (``networks.py:718-739``).

All losses are pure functions returning fp32 scalars.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import jax
import jax.numpy as jnp


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def bce_with_logits(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    return jnp.mean(jnp.maximum(p, 0) - p * t + jnp.log1p(jnp.exp(-jnp.abs(p))))


def lsgan_loss(pred: jnp.ndarray, is_real: bool) -> jnp.ndarray:
    """MSE against a constant 1.0 (real) / 0.0 (fake) target."""
    target = jnp.ones_like(pred) if is_real else jnp.zeros_like(pred)
    return mse_loss(pred, target)


Preds = Union[jnp.ndarray, Sequence[Any]]


def gan_loss(preds: Preds, is_real: bool, use_lsgan: bool = True) -> jnp.ndarray:
    """p2pHD ``GANLoss``: accepts a tensor, a list of tensors, or a list of
    per-scale lists (taking the last element of each inner list — the final
    discriminator output; intermediate entries are feature-matching taps)."""
    fn = lsgan_loss if use_lsgan else (
        lambda p, r: bce_with_logits(p, jnp.ones_like(p) if r else jnp.zeros_like(p)))
    if isinstance(preds, (list, tuple)):
        total = jnp.float32(0)
        for p in preds:
            if isinstance(p, (list, tuple)):
                p = p[-1]
            total = total + fn(p, is_real)
        return total
    return fn(preds, is_real)


def energy_reg(fake: jnp.ndarray, real: jnp.ndarray) -> jnp.ndarray:
    """Energy regularizer (``CycleGAN/train.py:45-50``): L1 between the total
    "point energy" of fake and real frames mapped back to [0, 1]."""
    e_fake = jnp.sum((fake.astype(jnp.float32) + 1) / 2)
    e_real = jnp.sum(real.astype(jnp.float32) * 0.5 + 0.5)
    return jnp.abs(e_fake - e_real)


def count_points(images: jnp.ndarray) -> jnp.ndarray:
    """Radar point count per frame (``CycleGAN/train.py:52-59``): threshold the
    [-1,1] image at 0.5 (after mapping to [0,1]) and count, normalized by
    batch*channels. Used to skip near-empty radar frames (<300 points)."""
    img = images.astype(jnp.float32) * 0.5 + 0.5
    binary = (img > 0.5).astype(jnp.float32)
    n, h, w, c = images.shape
    return jnp.sum(binary) / (n * c)


def gradient_penalty(critic_fn, real: jnp.ndarray, fake: jnp.ndarray,
                     rng: jax.Array, lam: float = 10.0) -> jnp.ndarray:
    """WGAN-GP (``p2pHD/models/networks.py:718-739``): penalty on the critic
    gradient norm at random interpolates, (‖∇D(x̂)‖₂ − 1)²·λ."""
    eps = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), dtype=jnp.float32)
    inter = eps * real.astype(jnp.float32) + (1 - eps) * fake.astype(jnp.float32)

    def critic_sum(x):
        return jnp.sum(critic_fn(x).astype(jnp.float32))

    grads = jax.grad(critic_sum)(inter)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads), axis=(1, 2, 3)) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0)) * lam
