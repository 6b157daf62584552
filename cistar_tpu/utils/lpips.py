"""Perceptual distance (LPIPS-style) for output-fidelity verification.

The north star requires outputs within 1e-2 LPIPS of the PyTorch reference
(BASELINE.md). True LPIPS needs the released linear-head weights (not
fetchable in this zero-egress environment), so this implements the standard
LPIPS computation — unit-normalized VGG feature differences, spatially
averaged, summed over layers — with uniform head weights, plus hooks to load
converted head weights when provided. With the same VGG backbone on both
sides this is a faithful relative metric for A/B comparisons.

Calibration (``tools/lpips_calibrate.py`` → ``benchmarks/lpips_calibration.json``)
ties the uniform-head units to the 1e-2 north-star budget: the computation is
cross-checked against a line-for-line torch implementation, and a synthetic
distortion battery records the local slope of the metric against pixel-level
L1 so pixel-parity results bound the perceptual distance.

If the released LPIPS linear heads are ever mounted, ``load_lpips_heads``
reads the official ``lpips`` package checkpoint format and
``lpips_distance(..., head_weights=...)`` computes true LPIPS (the official
ScalingLayer is numerically identical to our ImageNet prep — see _MEAN note).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cistar_tpu.models import vgg as vgg_lib

_LPIPS_KEYS = ("relu1_2", "relu2_2", "relu3_3", "relu4_3", "relu5_3")
# ImageNet normalization (RGB). NOTE: this on [0,1] inputs is numerically
# identical to the official lpips package's ScalingLayer on [-1,1] inputs —
# its constants (shift=[-.030,-.088,-.188], scale=[.458,.448,.450]) satisfy
# scale/2 == std and (-1-shift)/scale == -mean/std, i.e. the ScalingLayer IS
# ImageNet normalization re-parameterized. So heads loaded via
# :func:`load_lpips_heads` drop straight into this pipeline for true LPIPS.
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _norm_feat(f: jnp.ndarray) -> jnp.ndarray:
    f = f.astype(jnp.float32)
    return f * jax.lax.rsqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True) + 1e-10)


def load_lpips_heads(path: str,
                     keys: Sequence[str] = _LPIPS_KEYS) -> Dict[str, jnp.ndarray]:
    """Read the official ``lpips`` package linear-head checkpoint.

    The released VGG heads (``lpips/weights/v0.1/vgg.pth``) are a state dict
    with keys ``lin{i}.model.1.weight`` of shape (1, C_i, 1, 1) — one
    non-negative weight per channel per layer. Returns ``{relu_key: (C,)}``
    suitable for :func:`lpips_distance`'s ``head_weights``.
    """
    import torch

    try:
        # weights_only: never execute pickle code from an externally
        # obtained heads file (torch >= 1.13; default only from 2.6)
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # ancient torch without the kwarg
        sd = torch.load(path, map_location="cpu")
    heads: Dict[str, jnp.ndarray] = {}
    for i, k in enumerate(keys):
        for cand in (f"lin{i}.model.1.weight", f"lin{i}.1.weight",
                     f"lins.{i}.model.1.weight"):
            if cand in sd:
                heads[k] = jnp.asarray(
                    np.asarray(sd[cand], np.float32).reshape(-1))
                break
        else:
            raise KeyError(f"no linear-head weight for layer {i} ({k}) in "
                           f"{path}; keys: {sorted(sd)[:6]}…")
    return heads


def lpips_distance(
    a: jnp.ndarray,
    b: jnp.ndarray,
    vgg16_params=None,
    head_weights: Optional[Dict[str, jnp.ndarray]] = None,
    keys: Sequence[str] = _LPIPS_KEYS,
) -> jnp.ndarray:
    """Perceptual distance between two NHWC images in [0, 1]. Returns (N,)."""
    if not vgg16_params:
        import warnings

        warnings.warn(
            "lpips_distance: no VGG16 weights supplied — falling back to the "
            "seeded random backbone; distances are relative A/B indicators "
            "only, not comparable to published LPIPS values",
            RuntimeWarning, stacklevel=2)
        params = vgg_lib.init_vgg_params(vgg_lib.VGG16_CONVS, seed=7)
    else:
        params = vgg16_params

    def prep(x):
        x = x.astype(jnp.float32)
        if x.shape[-1] == 1:
            x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
        return (x - _MEAN) / _STD

    fa = vgg_lib.extract_features(params, prep(a), keys,
                                  forward_seq=vgg_lib.VGG16_FORWARD_SEQ)
    fb = vgg_lib.extract_features(params, prep(b), keys,
                                  forward_seq=vgg_lib.VGG16_FORWARD_SEQ)
    total = jnp.zeros((a.shape[0],), jnp.float32)
    for k, xa, xb in zip(keys, fa, fb):
        d = jnp.square(_norm_feat(xa) - _norm_feat(xb))  # (N,H,W,C)
        if head_weights is not None and k in head_weights:
            d = d * head_weights[k].astype(jnp.float32)
            total = total + jnp.mean(jnp.sum(d, axis=-1), axis=(1, 2))
        else:
            total = total + jnp.mean(d, axis=(1, 2, 3))
    return total
