"""Gram matrix ops (style-transfer statistics) as single MXU contractions.

Reference semantics: ``G = F · Fᵀ / (h·w)`` with F the (c, h·w) flattened
feature map, computed per batch element via ``bmm``
(``IST/model/meta_arch/gram_matrix.py:5-11``; also the ``gram_matrix`` helpers
in ``CycleGAN/models.py:470-505``). In NHWC this is a (HW, C)ᵀ·(HW, C)
contraction — one batched matmul that XLA tiles straight onto the MXU with
fp32 accumulation.
"""

from __future__ import annotations

import jax.numpy as jnp


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """Per-image Gram matrix of an NHWC feature map.

    Args:
      feat: (N, H, W, C) features.
    Returns:
      (N, C, C) Gram matrices, normalized by H*W, in float32.
    """
    n, h, w, c = feat.shape
    f = feat.reshape(n, h * w, c)
    prec = "highest" if f.dtype == jnp.float32 else None
    g = jnp.einsum("npc,npd->ncd", f, f, preferred_element_type=jnp.float32,
                   precision=prec)
    return g / (h * w)


def gram_mse_loss(feat: jnp.ndarray, target_gram: jnp.ndarray) -> jnp.ndarray:
    """MSE between Gram(feat) and a precomputed target Gram.

    Matches ``GramMSELoss`` (``IST/model/meta_arch/gram_mse_loss.py:5-8``):
    ``nn.MSELoss`` is mean over all (N, C, C) elements.
    """
    g = gram_matrix(feat)
    return jnp.mean(jnp.square(g - target_gram.astype(g.dtype)))
