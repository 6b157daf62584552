"""CycleGAN models, replay pool, and jitted train step (tiny resolutions)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cistar_tpu.engines.cyclegan import CycleGAN, CycleGANState, lambda_lr_factor
from cistar_tpu.models.cyclegan import (
    MultiscaleBilinearGenerator,
    MultiscaleDenseDecoderGenerator,
    MultiscaleGenerator,
    PatchDiscriminator,
    ResnetGenerator,
    UnetGenerator,
    build_generator,
)
from cistar_tpu.utils.image_pool import init_pool, push_and_pop


GEN_CLASSES = [ResnetGenerator, UnetGenerator, MultiscaleGenerator,
               MultiscaleDenseDecoderGenerator, MultiscaleBilinearGenerator]


@pytest.mark.parametrize("cls", GEN_CLASSES)
def test_generator_shapes_and_range(cls, rng):
    model = cls(output_nc=1, n_residual_blocks=2, in_features=8)
    x = jnp.asarray(rng.randn(2, 32, 32, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape == (2, 32, 32, 1)
    assert float(jnp.max(jnp.abs(y))) <= 1.0 + 1e-6  # tanh output


def test_generator_dispatch_matches_reference_prefixes():
    assert isinstance(build_generator("p2p_whatever"), ResnetGenerator)
    assert isinstance(build_generator("bilinear_content"), MultiscaleBilinearGenerator)
    assert isinstance(build_generator("atrous_x", dense_decoder=True),
                      MultiscaleDenseDecoderGenerator)
    assert isinstance(build_generator("atrous_x", dense_decoder=False),
                      MultiscaleGenerator)
    assert isinstance(build_generator("unet_content"), UnetGenerator)


def test_discriminator_output(rng):
    d = PatchDiscriminator()
    x = jnp.asarray(rng.randn(3, 64, 64, 1).astype(np.float32))
    params = d.init(jax.random.PRNGKey(0), x)["params"]
    y = d.apply({"params": params}, x)
    assert y.shape == (3,)


def test_replay_pool_fills_then_swaps(rng):
    pool = init_pool(4, (2, 2, 1))
    key = jax.random.PRNGKey(0)
    # first 4 images pass through and fill
    batch1 = jnp.asarray(rng.randn(4, 2, 2, 1).astype(np.float32))
    pool, out1 = push_and_pop(pool, batch1, key)
    assert int(pool.size) == 4
    np.testing.assert_allclose(np.asarray(out1), np.asarray(batch1))
    # subsequent pushes: size stays, outputs are either the new image or a stored one
    batch2 = jnp.asarray(100 + rng.randn(4, 2, 2, 1).astype(np.float32))
    pool2, out2 = push_and_pop(pool, batch2, jax.random.PRNGKey(1))
    assert int(pool2.size) == 4
    stored = np.asarray(pool.images)
    for i, img in enumerate(np.asarray(out2)):
        is_new = np.allclose(img, np.asarray(batch2)[i])
        is_old = any(np.allclose(img, s) for s in stored)
        assert is_new or is_old


def test_lambda_lr_factor_closed_form():
    # n_epochs=10, start=0, decay=9 (reference defaults, CycleGAN/train.py:26-31):
    # factor stays 1.0 until decay_epoch, hits 0 exactly at n_epochs.
    vals = [float(lambda_lr_factor(jnp.asarray(e), 10, 0, 9)) for e in range(11)]
    assert vals[:10] == pytest.approx([1.0] * 10)
    assert vals[10] == pytest.approx(0.0)
    # longer decay ramp: n=200, decay=100 -> factor 0.5 at epoch 150
    assert float(lambda_lr_factor(jnp.asarray(150), 200, 0, 100)) == pytest.approx(0.5)


@pytest.fixture(scope="module")
def tiny_engine():
    # 32² is the smallest size the 4-stage PatchGAN accepts without a
    # zero-sized output map.
    return CycleGAN(gen_type="p2p", in_features=4, n_residual_blocks=1,
                    image_size=32, batch_size=2, pool_size=4,
                    compute_dtype=jnp.float32, min_points=10.0)


@pytest.mark.fast
def test_train_step_runs_and_updates(tiny_engine, rng):
    eng = tiny_engine
    state = eng.init_state(jax.random.PRNGKey(0), image_size=32)
    # dense "radar" frame so count_points >= min_points
    real_a = jnp.asarray(np.sign(rng.randn(2, 32, 32, 1)).astype(np.float32))
    real_b = jnp.asarray(np.sign(rng.randn(2, 32, 32, 1)).astype(np.float32))
    g0 = jax.tree.leaves(state.g_a2b)[0].copy()
    state2, metrics = eng.train_step(state, real_a, real_b)
    assert all(np.isfinite(float(v)) for v in jax.tree.leaves(metrics))
    assert float(metrics["skipped"]) == 0.0
    g1 = jax.tree.leaves(state2.g_a2b)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))  # G updated


def test_train_step_skips_sparse_frames(tiny_engine, rng):
    eng = tiny_engine
    state = eng.init_state(jax.random.PRNGKey(1), image_size=32)
    # all -1 inputs -> 0 points -> skip
    real_a = -jnp.ones((2, 32, 32, 1), jnp.float32)
    real_b = jnp.asarray(np.sign(rng.randn(2, 32, 32, 1)).astype(np.float32))
    g0 = np.asarray(jax.tree.leaves(state.g_a2b)[0]).copy()
    pool_size0 = int(state.pool_a.size)
    state2, metrics = eng.train_step(state, real_a, real_b)
    assert float(metrics["skipped"]) == 1.0
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(state2.g_a2b)[0]), g0)
    assert int(state2.pool_a.size) == pool_size0  # pool untouched


def test_infer_step_shapes(tiny_engine, rng):
    eng = tiny_engine
    state = eng.init_state(jax.random.PRNGKey(2), image_size=32)
    a = jnp.asarray(rng.randn(2, 32, 32, 1).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 32, 32, 1).astype(np.float32))
    fake_b, fake_a, rec_b = eng.infer_step(state, a, b)
    assert fake_b.shape == a.shape and fake_a.shape == b.shape
    assert rec_b.shape == b.shape


@pytest.mark.fast
def test_family_int8_applies_match_linen_in_fp32(rng):
    """The bilinear/multiscale fast_infer forwards reproduce the linen
    models EXACTLY when the trunk runs emulated int8 off / the bf16 layers
    run fp32 — i.e. every non-quantized stage (encoder branches, decoder,
    skips) has the right geometry. (The int8 trunk itself is covered by the
    quantization-tolerance goldens; here we isolate the plumbing.)"""
    import warnings

    from cistar_tpu.models import fast_infer as fi
    from cistar_tpu.models.cyclegan import build_generator

    x = jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32) * 2 - 1)
    for gen_type, dense in (("bilinear_content", True),
                            ("atrous_content", True),
                            ("atrous_content", False)):
        m = build_generator(gen_type, 1, 8, 2, dense_decoder=dense)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        ref = m.apply({"params": params}, x)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            if gen_type.startswith("bilinear"):
                q = fi.quantize_bilinear_trunk(params, 2)
                got = fi.bilinear_generator_int8_trunk_apply(params, q, x, 2)
            else:
                q = fi.quantize_multiscale_trunk(params, 2)
                got = fi.multiscale_generator_int8_trunk_apply(
                    params, q, x, 2, dense_decoder=dense)
        # non-trunk stages are bit-comparable; the int8 trunk contributes
        # only quantization noise (post-tanh, well under 0.1)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 0.1, (gen_type, dense, err)
