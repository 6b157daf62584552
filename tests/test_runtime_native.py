"""Native C++ loader and AOT runtime coverage."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = (rng.rand(48, 48) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i}.png")
    return str(d)


def test_native_loader_matches_pil(png_dir):
    try:
        from cistar_tpu.data.native_loader import NativePngLoader
    except Exception as e:  # toolchain unavailable
        pytest.skip(f"native loader unavailable: {e}")
    from cistar_tpu.data import transforms as T

    paths = sorted(glob.glob(os.path.join(png_dir, "*.png")))
    ldr = NativePngLoader(paths, size=48, channels=1)
    batch = ldr.get_batch([0, 1, 2])
    assert batch.shape == (3, 48, 48, 1)
    ref = T.normalize(T.pil_to_array(T.load_image(paths[0], "L")))
    np.testing.assert_allclose(batch[0], ref, atol=1e-5)


def test_native_loader_resize_close_to_pil(png_dir):
    try:
        from cistar_tpu.data.native_loader import NativePngLoader
    except Exception as e:
        pytest.skip(f"native loader unavailable: {e}")
    from cistar_tpu.data import transforms as T

    import torch

    paths = sorted(glob.glob(os.path.join(png_dir, "*.png")))
    ldr = NativePngLoader(paths, size=24, channels=1)
    batch = ldr.get_batch([0])
    # reference: half-pixel point-sampled bilinear == torch interpolate with
    # antialias=False (PIL and jax.image antialias on downscale — different
    # convention, not the C++ sampler's target)
    full = T.normalize(T.pil_to_array(T.load_image(paths[0], "L")))
    t = torch.from_numpy(full[None].transpose(0, 3, 1, 2))
    ref = torch.nn.functional.interpolate(
        t, size=(24, 24), mode="bilinear", align_corners=False,
        antialias=False).numpy()[0].transpose(1, 2, 0)
    np.testing.assert_allclose(batch[0], ref, atol=2e-5)


def test_aot_roundtrip_and_profile(tmp_path):
    from cistar_tpu.runtime.aot import (
        cost_analysis,
        load_compiled,
        profile_fn,
        save_compiled,
    )

    def f(x):
        return jnp.tanh(x @ x.T) * 2

    x = jnp.ones((8, 8))
    path = str(tmp_path / "f.jaxexe")
    save_compiled(f, (x,), path)
    g = load_compiled(path)
    np.testing.assert_allclose(np.asarray(g(x)), np.asarray(f(x)), rtol=1e-6)
    stats = profile_fn(g, x, iters=10)
    assert stats["mean_ms"] > 0
    costs = cost_analysis(f, x)
    assert costs.get("flops", 0) > 0
