"""LPIPS tooling: official-head loading, official input scaling, seeded
torch weight generation round trip, and jax↔torch implementation parity
(the calibration harness's core claim, at toy size).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cistar_tpu.models.vgg import (VGG16_CONVS,
                                   torchvision_vgg_features_to_params)
from cistar_tpu.utils.lpips import _LPIPS_KEYS, load_lpips_heads, lpips_distance

pytestmark = pytest.mark.fast


def test_load_lpips_heads_official_format(tmp_path):
    # channel widths at relu1_2..relu5_3 of VGG-16
    widths = [64, 128, 256, 512, 512]
    sd = {f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1)
          for i, c in enumerate(widths)}
    path = tmp_path / "vgg.pth"
    torch.save(sd, path)
    heads = load_lpips_heads(str(path))
    assert set(heads) == set(_LPIPS_KEYS)
    for k, c in zip(_LPIPS_KEYS, widths):
        assert heads[k].shape == (c,)


def test_load_lpips_heads_missing_layer_raises(tmp_path):
    path = tmp_path / "bad.pth"
    torch.save({"lin0.model.1.weight": torch.rand(1, 64, 1, 1)}, path)
    with pytest.raises(KeyError):
        load_lpips_heads(str(path))


def test_head_weights_change_value():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32))
    base = lpips_distance(a, b)
    heads = {k: jnp.full((c,), 2.0) for k, c in
             zip(_LPIPS_KEYS, [64, 128, 256, 512, 512])}
    weighted = lpips_distance(a, b, head_weights=heads)
    assert float(base[0]) > 0
    assert not np.isclose(float(weighted[0]), float(base[0]))


def test_official_scaling_layer_is_imagenet_norm():
    """The lpips package's ScalingLayer on [-1,1] inputs is numerically the
    ImageNet normalization this repo applies to [0,1] inputs — the identity
    that lets released LPIPS heads drop into our pipeline unchanged."""
    shift = np.array([-0.030, -0.088, -0.188])
    scale = np.array([0.458, 0.448, 0.450])
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    x = np.random.RandomState(0).rand(5, 3)
    official = ((x * 2 - 1) - shift) / scale
    imagenet = (x - mean) / std
    np.testing.assert_allclose(official, imagenet, atol=5e-3)
    np.testing.assert_allclose(scale / 2, std, atol=5e-4)


def test_make_vgg_weights_roundtrip_and_torch_parity():
    from tools.lpips_calibrate import (_build_conv_idx, synthetic_frames,
                                       torch_lpips_mirror)
    from tools.make_vgg_weights import make_state_dict

    _build_conv_idx()
    sd = make_state_dict("vgg16-features", seed=7)
    params = torchvision_vgg_features_to_params(
        {k: v.numpy() for k, v in sd.items()}, VGG16_CONVS)
    assert set(params) == {name for name, _, _ in VGG16_CONVS}

    base = synthetic_frames(32)
    rng = np.random.RandomState(1)
    noisy = np.clip(base + rng.normal(0, 0.05, base.shape),
                    0, 1).astype(np.float32)
    ours = np.asarray(lpips_distance(jnp.asarray(base), jnp.asarray(noisy),
                                     vgg16_params=params))
    theirs = torch_lpips_mirror(sd, base, noisy, _LPIPS_KEYS)
    assert np.max(np.abs(ours - theirs)) < 1e-4, (ours, theirs)


def test_make_vgg_weights_bethgelab_format():
    from cistar_tpu.models.vgg import VGG19_CONVS, torch_vgg_conv_to_params
    from tools.make_vgg_weights import make_state_dict

    sd = make_state_dict("vgg19-conv", seed=7)
    assert "conv1_1.weight" in sd and sd["conv1_1.weight"].shape == (64, 3, 3, 3)
    params = torch_vgg_conv_to_params({k: v.numpy() for k, v in sd.items()})
    assert params["conv5_4"]["w"].shape == (3, 3, 512, 512)
    assert len(params) == len(VGG19_CONVS)
