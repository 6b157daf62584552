"""Perceptual (VGG-feature) losses.

  * :func:`make_content_criterion` — CycleGAN ``contentLoss``
    (``CycleGAN/models.py:204-217``): MSE between VGG-16 relu4_3 features of
    prediction and target, with 1→3 channel broadcast. Note the reference
    feeds [-1, 1] images straight into torchvision VGG with **no** ImageNet
    re-normalization; we reproduce that faithfully.
  * :func:`make_vgg_loss` — p2pHD ``VGGLoss``
    (``p2pHD/models/networks.py:124-136``): weighted L1 over the five VGG-19
    relu{1..5}_1 slice outputs, weights [1/32, 1/16, 1/8, 1/4, 1].
  * :func:`perceptual_style_content_loss` — the Gatys-style combined loss used
    by ``PerceptualLoss``/``styleTransferLoss`` (``CycleGAN/models.py:397-531``).

Pretrained torchvision weights cannot be downloaded in this environment;
criteria accept a params dict (converted from a ``.pth`` via
``models.vgg.torchvision_vgg_features_to_params``) and fall back to a fixed
random init (still a valid perceptual metric, clearly logged by callers).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from cistar_tpu.losses.gan import l1_loss, mse_loss
from cistar_tpu.models import vgg as vgg_lib
from cistar_tpu.ops.gram import gram_matrix


def _to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    """1-channel → 3-channel broadcast (torch ``expand([-1,3,-1,-1])``)."""
    if x.shape[-1] == 1:
        return jnp.broadcast_to(x, x.shape[:-1] + (3,))
    return x


def make_content_criterion(vgg16_params=None,
                           compute_dtype=jnp.bfloat16) -> Callable:
    """CycleGAN content loss: MSE of VGG-16 relu4_3 features."""
    params = vgg16_params or vgg_lib.init_vgg_params(vgg_lib.VGG16_CONVS, seed=7)

    def criterion(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        pf = vgg_lib.extract_features(
            params, _to_rgb(pred), (vgg_lib.VGG16_CONTENT_KEY,),
            forward_seq=vgg_lib.VGG16_FORWARD_SEQ, compute_dtype=compute_dtype)[0]
        tf = vgg_lib.extract_features(
            params, _to_rgb(target), (vgg_lib.VGG16_CONTENT_KEY,),
            forward_seq=vgg_lib.VGG16_FORWARD_SEQ, compute_dtype=compute_dtype)[0]
        return mse_loss(pf, tf)

    return criterion


def make_vgg_loss(vgg19_params=None, compute_dtype=jnp.bfloat16) -> Callable:
    """p2pHD VGGLoss: Σᵢ wᵢ · L1(vgg_i(x), vgg_i(y)), slices relu{1..5}_1."""
    params = vgg19_params or vgg_lib.init_vgg_params(vgg_lib.VGG19_CONVS, seed=7)
    keys = tuple(vgg_lib.VGG19_LOSS_KEYS)
    weights = vgg_lib.VGG19_LOSS_WEIGHTS

    def criterion(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        pf = vgg_lib.extract_features(params, _to_rgb(pred), keys,
                                      compute_dtype=compute_dtype)
        tf = vgg_lib.extract_features(params, _to_rgb(target), keys,
                                      compute_dtype=compute_dtype)
        total = jnp.float32(0)
        for w, a, b in zip(weights, pf, tf):
            total = total + w * l1_loss(a, jnp.asarray(b))
        return total

    return criterion


def perceptual_style_content_loss(
    vgg_params,
    pred: jnp.ndarray,
    content: jnp.ndarray,
    style: jnp.ndarray,
    style_layers: Sequence[str] = ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1"),
    content_layers: Sequence[str] = ("relu4_2",),
    style_weights: Optional[Sequence[float]] = None,
    content_weights: Optional[Sequence[float]] = None,
    forward_seq=vgg_lib.VGG16_FORWARD_SEQ,
    compute_dtype=jnp.bfloat16,
):
    """Combined Gram-style + content MSE (``PerceptualLoss.calculate_loss``).

    Returns ``(style_loss, content_loss)`` so callers can weight/combine as
    the reference's two variants do (×1e3 style in ``PerceptualLoss``).
    """
    style_weights = list(style_weights or [1.0] * len(style_layers))
    content_weights = list(content_weights or [1.0] * len(content_layers))
    keys = tuple(style_layers) + tuple(content_layers)
    pf = vgg_lib.extract_features(vgg_params, _to_rgb(pred), keys,
                                  forward_seq=forward_seq, compute_dtype=compute_dtype)
    sf = vgg_lib.extract_features(vgg_params, _to_rgb(style), tuple(style_layers),
                                  forward_seq=forward_seq, compute_dtype=compute_dtype)
    cf = vgg_lib.extract_features(vgg_params, _to_rgb(content), tuple(content_layers),
                                  forward_seq=forward_seq, compute_dtype=compute_dtype)
    n_s = len(style_layers)
    style_loss = jnp.float32(0)
    for w, p, s in zip(style_weights, pf[:n_s], sf):
        style_loss = style_loss + w * mse_loss(gram_matrix(p), gram_matrix(s))
    content_loss = jnp.float32(0)
    for w, p, c in zip(content_weights, pf[n_s:], cf):
        content_loss = content_loss + w * mse_loss(p, c)
    return style_loss, content_loss
