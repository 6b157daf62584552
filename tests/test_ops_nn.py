"""Parity tests: cistar_tpu.ops.nn vs torch reference ops (CPU).

These pin the torch-compatible geometry/semantics that checkpoint conversion
relies on (SURVEY.md §4 "Unit" plan).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from cistar_tpu.ops import nn as tnn



pytestmark = pytest.mark.fast

def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("stride,padding,dilation", [(1, 1, 1), (2, 1, 1), (1, 2, 2), (2, 4, 4)])
def test_conv2d_matches_torch(rng, stride, padding, dilation):
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    w_oihw = rng.randn(8, 3, 3, 3).astype(np.float32)
    b = rng.randn(8).astype(np.float32)

    ref = F.conv2d(_nchw(x), torch.from_numpy(w_oihw), torch.from_numpy(b),
                   stride=stride, padding=padding, dilation=dilation)
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    out = tnn.conv2d(jnp.asarray(x), jnp.asarray(w_hwio), jnp.asarray(b),
                     stride=stride, padding=padding, dilation=dilation)
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "stride,padding,output_padding,dilation",
    [(2, 1, 1, 1),   # CycleGAN up-blocks (models.py:53)
     (2, 2, 1, 2),   # MultiAtrousTransposeConv rate 2 (models.py:371-380)
     (2, 4, 1, 4),
     (1, 0, 0, 1)],
)
def test_conv_transpose2d_matches_torch(rng, stride, padding, output_padding, dilation):
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    w_torch = rng.randn(4, 6, 3, 3).astype(np.float32)  # (in, out, kh, kw)
    b = rng.randn(6).astype(np.float32)

    ref = F.conv_transpose2d(_nchw(x), torch.from_numpy(w_torch), torch.from_numpy(b),
                             stride=stride, padding=padding,
                             output_padding=output_padding, dilation=dilation)
    w_hwio = np.transpose(w_torch, (2, 3, 0, 1))
    out = tnn.conv_transpose2d(jnp.asarray(x), jnp.asarray(w_hwio), jnp.asarray(b),
                               stride=stride, padding=padding,
                               output_padding=output_padding, dilation=dilation)
    assert out.shape == _to_nhwc(ref).shape
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), rtol=1e-4, atol=1e-4)


def test_instance_norm_matches_torch(rng):
    x = rng.randn(2, 9, 11, 5).astype(np.float32) * 3 + 1
    ref = F.instance_norm(_nchw(x), eps=1e-5)
    out = tnn.instance_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), rtol=1e-4, atol=1e-4)


def test_reflection_pad_matches_torch(rng):
    x = rng.randn(1, 6, 7, 2).astype(np.float32)
    ref = F.pad(_nchw(x), (3, 3, 3, 3), mode="reflect")
    out = tnn.reflection_pad2d(jnp.asarray(x), 3)
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), atol=0)


def test_pools_match_torch(rng):
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    ref_max = F.max_pool2d(_nchw(x), 2, 2)
    ref_avg = F.avg_pool2d(_nchw(x), 3, 2, padding=1)
    np.testing.assert_allclose(np.asarray(tnn.max_pool2d(jnp.asarray(x), 2, 2)),
                               _to_nhwc(ref_max), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tnn.avg_pool2d(jnp.asarray(x), 3, 2, padding=1)),
                               _to_nhwc(ref_avg), rtol=1e-5, atol=1e-5)


def test_leaky_relu_and_tanh(rng):
    x = rng.randn(4, 4).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(tnn.leaky_relu(jnp.asarray(x), 0.2)),
        F.leaky_relu(torch.from_numpy(x), 0.2).numpy(), atol=1e-6)


def test_upsample_bilinear_matches_torch(rng):
    x = rng.randn(1, 5, 5, 3).astype(np.float32)
    # torch nn.Upsample(scale_factor=2, mode='bilinear') default align_corners=False
    ref = F.interpolate(_nchw(x), scale_factor=2, mode="bilinear", align_corners=False)
    out = tnn.upsample_bilinear(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), rtol=1e-4, atol=1e-4)


def test_avgpool_downsample_p2phd(rng):
    # pix2pixHD input pyramid: AvgPool2d(3, stride=2, padding=1,
    # count_include_pad=False) (networks.py:151-152)
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    ref = F.avg_pool2d(_nchw(x), 3, stride=2, padding=1, count_include_pad=False)
    out = tnn.avg_pool2d(jnp.asarray(x), 3, 2, padding=1, count_include_pad=False)
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), rtol=1e-5, atol=1e-5)


def test_global_avg_pool_matches_patchgan_head(rng):
    x = rng.randn(3, 7, 7, 1).astype(np.float32)
    ref = F.avg_pool2d(_nchw(x), (7, 7)).view(3, -1).numpy()
    out = np.asarray(tnn.global_avg_pool(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_conv2d_reflect_thin_matches_general():
    rng = np.random.RandomState(11)
    # head: many -> 1
    x = jnp.asarray(rng.randn(2, 12, 12, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 16, 1).astype(np.float32))
    b = jnp.asarray(rng.randn(1).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(tnn.conv2d_reflect_thin(x, w, b)),
        np.asarray(tnn.conv2d_reflect(x, w, b)), rtol=2e-4, atol=2e-4)
    # stem: 1 -> many
    x1 = jnp.asarray(rng.randn(2, 12, 12, 1).astype(np.float32))
    w1 = jnp.asarray(rng.randn(7, 7, 1, 8).astype(np.float32))
    b1 = jnp.asarray(rng.randn(8).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(tnn.conv2d_reflect_thin(x1, w1, b1)),
        np.asarray(tnn.conv2d_reflect(x1, w1, b1)), rtol=2e-4, atol=2e-4)
    # thick fallback must match exactly
    x2 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w2 = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(tnn.conv2d_reflect_thin(x2, w2, None)),
        np.asarray(tnn.conv2d_reflect(x2, w2, None)), rtol=1e-6)


@pytest.mark.fast
def test_upconv2x_bilinear_matches_composition():
    """upconv2x_bilinear (4-phase composed conv + depth-to-space + exact
    border strips) ≡ conv2d(upsample_bilinear(x), w, padding=1) in fp32."""
    rng = np.random.RandomState(3)
    for (h, w_, cin, cout) in ((16, 16, 8, 4), (12, 20, 3, 5), (8, 8, 2, 2)):
        x = jnp.asarray(rng.randn(2, h, w_, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        ref = tnn.conv2d(tnn.upsample_bilinear(x, 2), w, b, padding=1)
        got = tnn.upconv2x_bilinear(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
