"""VGG extractor parity vs a torch-built VGG-19, Gram ops, and a tiny Gatys run."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from cistar_tpu.core.config import get_ist_cfg_defaults
from cistar_tpu.engines.ist import GatysEngine
from cistar_tpu.models import vgg as vgg_lib
from cistar_tpu.ops.gram import gram_matrix, gram_mse_loss


def _build_torch_vgg19(params):
    """Assemble a torch VGG-19 conv stack from our HWIO params (inverse conversion)."""
    layers = {}
    for name, cin, cout in vgg_lib.VGG19_CONVS:
        conv = nn.Conv2d(cin, cout, 3, padding=1)
        w = np.transpose(np.asarray(params[name]["w"]), (3, 2, 0, 1))  # HWIO->OIHW
        conv.weight.data = torch.from_numpy(w.copy())
        conv.bias.data = torch.from_numpy(np.asarray(params[name]["b"]).copy())
        layers[name] = conv
    return layers


def _torch_forward(layers, x_nchw, out_keys):
    acts = {}
    x = x_nchw
    pool = nn.MaxPool2d(2, 2)
    for name in vgg_lib.VGG19_FORWARD_SEQ:
        if name.startswith("pool"):
            x = pool(x)
            acts[name] = x
        else:
            x = layers[name](x)
            acts[name] = x
            x = torch.relu(x)
            acts["relu" + name[len("conv"):]] = x
    return [acts[k] for k in out_keys]


def test_vgg_features_match_torch(rng):
    params = vgg_lib.init_vgg_params(seed=1)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    keys = ["relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1", "relu4_2"]

    outs = vgg_lib.extract_features(params, jnp.asarray(x), keys)
    tlayers = _build_torch_vgg19(params)
    with torch.no_grad():
        refs = _torch_forward(tlayers, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), keys)
    for out, ref in zip(outs, refs):
        ref_nhwc = np.transpose(ref.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(out), ref_nhwc, rtol=1e-3, atol=1e-3)


def test_gram_matrix_matches_reference_formula(rng):
    feat = rng.randn(2, 4, 5, 3).astype(np.float32)
    g = np.asarray(gram_matrix(jnp.asarray(feat)))
    # reference: F (b, c, hw); G = F F^T / (h*w)  (gram_matrix.py:5-11)
    f = np.transpose(feat, (0, 3, 1, 2)).reshape(2, 3, 20)
    ref = np.einsum("bcp,bdp->bcd", f, f) / 20.0
    np.testing.assert_allclose(g, ref, rtol=1e-5, atol=1e-5)


def test_gram_mse_loss_scalar(rng):
    feat = jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
    tgt = gram_matrix(feat)
    assert float(gram_mse_loss(feat, tgt)) < 1e-10


def test_tiny_gatys_transfer_decreases_loss(rng):
    cfg = get_ist_cfg_defaults()
    cfg.DATA.IMG_SIZE = 32
    params = vgg_lib.init_vgg_params(seed=0)
    engine = GatysEngine(cfg, params, compute_dtype=jnp.float32, history_size=10)
    content = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 255 - 120)
    style = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 255 - 120)
    out, final_loss, losses = engine.optimize(content, style, max_iters=20)
    assert out.shape == content.shape
    assert np.isfinite(float(final_loss))
    assert float(losses[-1]) <= float(losses[0])
