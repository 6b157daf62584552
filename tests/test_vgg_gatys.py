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


def test_gatys_optimization_tracks_torch_reference(rng):
    """Full pipeline parity: same VGG weights, same L-BFGS semantics — our
    jitted optimizer should reach a comparable loss and similar image to a
    torch reimplementation of the reference loop (30 iters @ 48²)."""
    import torch
    import torch.nn as nn

    size, iters = 48, 30
    params = vgg_lib.init_vgg_params(seed=3)
    content = rng.rand(1, size, size, 3).astype(np.float32) * 255 - 120
    style = rng.rand(1, size, size, 3).astype(np.float32) * 255 - 120

    # ---- torch side (reference semantics) --------------------------------
    layers = _build_torch_vgg19(params)

    def t_feats(x, keys):
        return _torch_forward(layers, x, keys)

    style_layers = ["relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1"]
    weights = [1e3 / n ** 2 for n in [64, 128, 256, 512, 512]] + [5e-1]

    def t_gram(f):
        b, c, h, w = f.shape
        F = f.view(b, c, h * w)
        return torch.bmm(F, F.transpose(1, 2)) / (h * w)

    c_t = torch.from_numpy(np.ascontiguousarray(np.transpose(content, (0, 3, 1, 2))))
    s_t = torch.from_numpy(np.ascontiguousarray(np.transpose(style, (0, 3, 1, 2))))
    with torch.no_grad():
        s_targets = [t_gram(f) for f in t_feats(s_t, style_layers)]
        c_targets = t_feats(c_t, ["relu4_2"])
    opt_img = c_t.clone().requires_grad_(True)
    optimizer = torch.optim.LBFGS([opt_img])
    n_evals = [0]
    while n_evals[0] < iters:
        def closure():
            optimizer.zero_grad()
            outs = t_feats(opt_img, style_layers + ["relu4_2"])
            loss = sum(w * torch.nn.functional.mse_loss(t_gram(o), t)
                       for w, o, t in zip(weights[:5], outs[:5], s_targets))
            loss = loss + weights[5] * torch.nn.functional.mse_loss(
                outs[5], c_targets[0])
            loss.backward()
            n_evals[0] += 1
            return loss
        optimizer.step(closure)
    with torch.no_grad():
        outs = t_feats(opt_img, style_layers + ["relu4_2"])
        torch_final = float(sum(
            w * torch.nn.functional.mse_loss(t_gram(o), t)
            for w, o, t in zip(weights[:5], outs[:5], s_targets))
            + weights[5] * torch.nn.functional.mse_loss(outs[5], c_targets[0]))

    # ---- our side ---------------------------------------------------------
    from cistar_tpu.core.config import get_ist_cfg_defaults
    from cistar_tpu.engines.ist import GatysEngine

    cfg = get_ist_cfg_defaults()
    cfg.DATA.IMG_SIZE = size
    eng = GatysEngine(cfg, params, compute_dtype=jnp.float32, history_size=100)
    out, our_final, _ = eng.optimize(jnp.asarray(content), jnp.asarray(style),
                                     max_iters=iters)
    our_final = float(our_final)
    assert np.isfinite(our_final)
    # identical semantics should land within 25% of the torch loss
    assert our_final <= torch_final * 1.25 + 1e-6, (our_final, torch_final)
    # and the images should be close (normalized RMSE on the 0..255 scale)
    t_img = np.transpose(opt_img.detach().numpy(), (0, 2, 3, 1))
    rmse = float(np.sqrt(np.mean((np.asarray(out) - t_img) ** 2)))
    assert rmse < 25.0, rmse


def test_batched_gatys_matches_sequential(rng):
    """optimize_batch == per-frame optimize (exact per-frame L-BFGS state)."""
    cfg = get_ist_cfg_defaults()
    cfg.DATA.IMG_SIZE = 24
    params = vgg_lib.init_vgg_params(seed=0)
    eng = GatysEngine(cfg, params, compute_dtype=jnp.float32, history_size=5)
    contents = jnp.asarray(rng.rand(3, 1, 24, 24, 3).astype(np.float32) * 255 - 120)
    styles = jnp.asarray(rng.rand(3, 1, 24, 24, 3).astype(np.float32) * 255 - 120)
    # exact at 1 iteration (same math, different fp32 summation order only
    # compounds after repeated steps of the chaotic iteration)
    outs_b1, _, _ = eng.optimize_batch(contents, styles, max_iters=1)
    out_s1, _, _ = eng.optimize(contents[0], styles[0], max_iters=1)
    np.testing.assert_allclose(np.asarray(outs_b1[0]), np.asarray(out_s1),
                               rtol=1e-5, atol=1e-4)
    # after 5 iterations: same loss to ~0.1% and pixel agreement to <1/255
    outs_b, losses_b, _ = eng.optimize_batch(contents, styles, max_iters=5)
    for f in range(3):
        out_s, loss_s, _ = eng.optimize(contents[f], styles[f], max_iters=5)
        assert abs(float(losses_b[f]) - float(loss_s)) <= 0.002 * float(loss_s)
        np.testing.assert_allclose(np.asarray(outs_b[f]), np.asarray(out_s),
                                   atol=5.0)  # few px drift (chaotic iteration)


def test_transfer_style_batch_matches_single(rng):
    """The PIL-level batched driver == per-frame transfer_style, including
    the shape-grouping path (one frame with a different size)."""
    from PIL import Image

    cfg = get_ist_cfg_defaults()
    cfg.DATA.IMG_SIZE = 24
    params = vgg_lib.init_vgg_params(seed=0)
    eng = GatysEngine(cfg, params, compute_dtype=jnp.float32, history_size=5)
    frames = [Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8))
              for _ in range(2)]
    # third frame: different aspect ratio -> different preprocessed shape,
    # must route through its own (single-frame) group
    frames.append(Image.fromarray((rng.rand(32, 48, 3) * 255)
                                  .astype(np.uint8)))
    style = Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8))
    outs_b = eng.transfer_style_batch(frames, style, max_iters=2)
    for frame, out_b in zip(frames, outs_b):
        out_s = eng.transfer_style(frame, style, max_iters=2)
        np.testing.assert_allclose(np.asarray(out_b, np.float32),
                                   np.asarray(out_s, np.float32), atol=1.0)
