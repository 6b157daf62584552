"""pix2pixHD models + engine tests (tiny resolutions, CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cistar_tpu.engines.p2phd import Pix2PixHD, get_edges
from cistar_tpu.models.pix2pixhd import (
    AutoEncoder,
    DomainFeatureDiscriminator,
    Encoder,
    FeatureEncoder,
    GlobalGenerator,
    LocalEnhancer,
    MultiscaleDiscriminator,
    MultiscaleGlobalGenerator,
    NLayerDiscriminator,
    TransferGenerator,
    UDADecoder,
    UDAEncoder,
    UNetGeneratorHD,
    WDiscriminator,
    instance_average_pool,
)


def _x(rng, n=1, s=64, c=1):
    return jnp.asarray(rng.randn(n, s, s, c).astype(np.float32))


def test_global_generator_shape(rng):
    m = GlobalGenerator(output_nc=1, ngf=8, n_downsampling=2, n_blocks=2)
    x = _x(rng)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": p}, x)
    assert y.shape == x.shape
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_local_enhancer_shape(rng):
    m = LocalEnhancer(output_nc=1, ngf=4, n_downsample_global=2,
                      n_blocks_global=2, n_local_enhancers=1, n_blocks_local=1)
    x = _x(rng, s=64)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": p}, x)
    assert y.shape == x.shape
    # trunk + enhancer params both exist
    assert "global" in p and "enh1_stem" in p and "head" in p


def test_autoencoder_stages(rng):
    m = AutoEncoder(output_nc=1, ngf=8, n_downsampling=2, n_blocks=1)
    x = _x(rng, s=32)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": p}, x)
    assert y.shape == x.shape
    z = m.apply({"params": p}, x, method=AutoEncoder.encode)
    assert z.shape == (1, 8, 8, 32)  # /4 spatial, ngf*4 channels
    y2 = m.apply({"params": p}, z, method=AutoEncoder.decode)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)


def test_multiscale_global_generator_shares_stem(rng):
    m = MultiscaleGlobalGenerator(output_nc=1, ngf=8, n_blocks=1)
    x = _x(rng, s=64)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": p}, x)
    assert y.shape == x.shape
    assert "feat_stem" in p          # single shared stem for b2/b3
    assert "b2Feat" not in p and "b3Feat" not in p


def test_nlayer_discriminator_features(rng):
    m = NLayerDiscriminator(ndf=8, n_layers=3, get_interm_feat=True)
    x = _x(rng, s=64, c=2)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    feats = m.apply({"params": p}, x)
    assert len(feats) == 5  # n_layers + 2
    assert feats[-1].shape[-1] == 1


def test_multiscale_discriminator_structure(rng):
    m = MultiscaleDiscriminator(ndf=8, n_layers=2, num_D=2, get_interm_feat=True)
    x = _x(rng, s=64, c=2)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    outs = m.apply({"params": p}, x)
    assert len(outs) == 2
    assert len(outs[0]) == 4  # n_layers + 2 features per scale
    # second scale sees a downsampled input -> smaller maps
    assert outs[1][0].shape[1] < outs[0][0].shape[1]


def test_unet_msrb_generator(rng):
    m = UNetGeneratorHD(output_nc=1, n_residual_blocks=2, in_features=8)
    x = _x(rng, s=64)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": p}, x)
    assert y.shape == x.shape


def test_feature_encoder_and_transfer_generator(rng):
    fe = FeatureEncoder(ngf=8, n_downsampling=4, n_scale=3)
    x = _x(rng, s=64)
    p = fe.init(jax.random.PRNGKey(0), x)["params"]
    z = fe.apply({"params": p}, x)
    assert z.shape == (1, 4, 4, 8 * 16)  # /16 spatial, ngf*2^4 channels
    tg = TransferGenerator(output_nc=1, n_blocks=1, ngf=8, n_upsampling=4)
    pt = tg.init(jax.random.PRNGKey(1), z)["params"]
    y = tg.apply({"params": pt}, z)
    assert y.shape == x.shape


def test_wdiscriminator_scalar_and_map(rng):
    x = _x(rng, s=64)
    m = WDiscriminator(ngf=8, n_layer=3, flatten=True)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": p}, x)
    assert out.shape == ()
    m2 = WDiscriminator(ngf=8, n_layer=3, flatten=False)
    p2 = m2.init(jax.random.PRNGKey(0), x)["params"]
    out2 = m2.apply({"params": p2}, x)
    assert out2.shape[-1] == 1 and out2.ndim == 4


def test_uda_modules_roundtrip(rng):
    x = _x(rng, s=32)
    enc = UDAEncoder(size=32, down_conv=2, ngf=8, n_resblocks=1)
    ve = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(ve, x)
    assert z.shape == (1, 8, 8, 32)
    dec = UDADecoder(output_nc=1, size=32, f_size=8, down_conv=2, n_resblocks=1)
    vd = dec.init(jax.random.PRNGKey(1), z)
    y = dec.apply(vd, z)
    assert y.shape == x.shape
    df = DomainFeatureDiscriminator()
    vf = df.init(jax.random.PRNGKey(2), z)
    dom = df.apply(vf, z)
    assert dom.shape == (1, 8, 8, 1)
    assert float(jnp.min(dom)) >= 0.0 and float(jnp.max(dom)) <= 1.0
    # eval mode consumes running averages from the batch_stats collection
    z_eval = enc.apply(ve, x, train=False)
    assert z_eval.shape == z.shape


def test_get_edges():
    inst = jnp.asarray(np.array([[[0, 0, 1], [0, 0, 1], [2, 2, 1]]],
                                np.int32))[..., None]
    e = get_edges(inst)
    # boundary columns between ids 0|1 and rows between 0|2 are marked
    assert float(e[0, 0, 1, 0]) == 1.0 and float(e[0, 0, 2, 0]) == 1.0
    assert float(e[0, 1, 0, 0]) == 1.0 and float(e[0, 2, 0, 0]) == 1.0
    assert float(e[0, 0, 0, 0]) == 0.0


def test_instance_average_pool(rng):
    feats = jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
    inst = jnp.asarray(np.array([[[0, 0, 1, 1]] * 2 + [[2, 2, 2, 2]] * 2],
                                np.int32))
    pooled = instance_average_pool(feats, inst, max_instances=8)
    f = np.asarray(feats)[0]
    p = np.asarray(pooled)[0]
    region0 = f[:2, :2].reshape(-1, 2).mean(0)
    np.testing.assert_allclose(p[0, 0], region0, rtol=1e-5)
    np.testing.assert_allclose(p[1, 1], region0, rtol=1e-5)
    region2 = f[2:, :].reshape(-1, 2).mean(0)
    np.testing.assert_allclose(p[3, 3], region2, rtol=1e-5)


def test_encoder_with_instances(rng):
    m = Encoder(output_nc=3, ngf=4, n_downsampling=2)
    x = _x(rng, s=32)
    inst = jnp.zeros((1, 32, 32), jnp.int32)
    p = m.init(jax.random.PRNGKey(0), x, inst)["params"]
    y = m.apply({"params": p}, x, inst)
    assert y.shape == (1, 32, 32, 3)
    # single instance -> every pixel equals the global mean
    arr = np.asarray(y)[0]
    np.testing.assert_allclose(arr.std(axis=(0, 1)), 0.0, atol=1e-4)


@pytest.fixture(scope="module")
def p2p_engine():
    return Pix2PixHD(net_g="global", ngf=8, ndf=8, n_downsample_global=2,
                     n_blocks_global=1, num_d=2, image_size=64,
                     compute_dtype=jnp.float32, niter=2, niter_decay=2)


@pytest.mark.fast
def test_p2phd_train_step(p2p_engine, rng):
    eng = p2p_engine
    state = eng.init_state(jax.random.PRNGKey(0), image_size=64)
    label = _x(rng, s=64)
    image = _x(rng, s=64)
    g0 = np.asarray(jax.tree.leaves(state.g)[0]).copy()
    state2, metrics, fake = eng.train_step(state, label, None, image)
    assert fake.shape == image.shape
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert vals["G_GAN_Feat"] > 0  # feature matching active
    assert not np.allclose(np.asarray(jax.tree.leaves(state2.g)[0]), g0)


def test_p2phd_lr_schedule(p2p_engine):
    eng = p2p_engine
    # niter=2, niter_decay=2: epochs 0,1 at lr; epoch 2 at lr/2; epoch 3 at 0
    assert float(eng.lr_at(jnp.asarray(0))) == pytest.approx(eng.lr)
    assert float(eng.lr_at(jnp.asarray(1))) == pytest.approx(eng.lr)
    assert float(eng.lr_at(jnp.asarray(2))) == pytest.approx(eng.lr / 2)
    assert float(eng.lr_at(jnp.asarray(3))) == pytest.approx(0.0)


def test_p2phd_semantic_mode_onehot(rng):
    eng = Pix2PixHD(net_g="global", ngf=8, n_downsample_global=2,
                    n_blocks_global=1, label_nc=4, r2l=False,
                    no_instance=False, image_size=32, compute_dtype=jnp.float32)
    label = jnp.asarray(rng.randint(0, 4, (1, 32, 32, 1)).astype(np.float32))
    inst = jnp.asarray(rng.randint(0, 3, (1, 32, 32, 1)).astype(np.int32))
    enc = eng.encode_input(label, inst)
    assert enc.shape == (1, 32, 32, 5)  # 4 one-hot + 1 edge channel
    np.testing.assert_allclose(np.asarray(enc[..., :4].sum(-1)), 1.0)


def test_p2phd_netE_joint_training(rng):
    """use_features: netE encodes the real image (instance-pooled), its
    features condition G, and E trains jointly with G in the same step
    (ref pix2pixHD_model.py:110-117,166-171)."""
    eng = Pix2PixHD(net_g="global", ngf=8, ndf=8, n_downsample_global=2,
                    n_blocks_global=1, n_layers_d=2, num_d=2,
                    label_nc=4, r2l=False, no_instance=False,
                    instance_feat=True, feat_num=3, nef=4, n_downsample_e=2,
                    niter=2, niter_decay=2, image_size=32,
                    compute_dtype=jnp.float32)
    assert eng.gen_features and eng.E is not None
    assert eng.g_input_nc() == 4 + 1 + 3  # one-hot + edges + feat channels
    state = eng.init_state(jax.random.PRNGKey(0), image_size=32)
    assert state.e is not None and state.opt_e is not None

    label = jnp.asarray(rng.randint(0, 4, size=(2, 32, 32, 1)).astype(np.float32))
    inst = jnp.asarray(rng.randint(0, 3, size=(2, 32, 32, 1)).astype(np.float32))
    image = _x(rng, n=2, s=32)
    e0 = jax.tree.map(lambda a: np.asarray(a).copy(), state.e)
    state2, metrics, fake = eng.train_step(state, label, inst, image)
    assert fake.shape == image.shape
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    # E grads nonzero: at least one E leaf moved
    moved = [not np.allclose(np.asarray(a), b) for a, b in
             zip(jax.tree.leaves(state2.e), jax.tree.leaves(e0))]
    assert any(moved), "netE did not train"

    # use_encoded_image inference path consumes the jointly-trained netE
    out = eng.infer_encoded(state2.g, state2.e, label, inst, image)
    assert out.shape == image.shape and np.isfinite(np.asarray(out)).all()


def test_engine_multiscale_batchnorm_generator():
    """netG='multiscale' (define_G's BatchNorm-default quirk) must run
    through the jitted engine: batch_stats thread through train (EMA
    updates) and eval (running averages). Regression: ScopeCollectionNotFound
    on the first step before round 2's g_stats threading."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.engines.p2phd import Pix2PixHD

    eng = Pix2PixHD(net_g="multiscale", input_nc=1, output_nc=1, label_nc=0,
                    ngf=4, n_blocks_global=1, num_d=1, norm="instance",
                    no_instance=True, r2l=True, image_size=32)
    st = eng.init_state(jax.random.PRNGKey(0), image_size=32)
    assert st.g_stats is not None, "multiscale G must carry batch_stats"
    stats_before = jax.tree.leaves(st.g_stats)[0].copy()

    rng = np.random.RandomState(0)
    lab = jnp.asarray(rng.rand(2, 32, 32, 1).astype(np.float32) * 2 - 1)
    img = jnp.asarray(rng.rand(2, 32, 32, 1).astype(np.float32) * 2 - 1)
    st, metrics, fake = eng.train_step(st, lab, None, img)
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
    assert fake.shape == img.shape
    # EMA running stats must move
    assert float(jnp.max(jnp.abs(jax.tree.leaves(st.g_stats)[0]
                                 - stats_before))) > 0

    out = eng.infer_step(st.g, lab, g_stats=st.g_stats)
    assert out.shape == img.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # eval must be batch-composition independent (running averages)
    one = eng.infer_step(st.g, lab[:1], g_stats=st.g_stats)
    np.testing.assert_allclose(np.asarray(one[0]), np.asarray(out[0]),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.fast
def test_init_spatial_size_invariance():
    """Param init at a capped spatial size is bit-identical to full-size init
    (all models are fully convolutional) — the contract core/initutil.py's
    fast-init path relies on."""
    import jax

    from cistar_tpu.models.pix2pixhd import (MultiscaleDiscriminator,
                                             UNetGeneratorHD, define_g)

    for model, nc in ((define_g("global", 1, ngf=8, n_downsample_global=2,
                                n_blocks_global=1), 1),
                      (UNetGeneratorHD(1, 1, 8), 1),
                      (MultiscaleDiscriminator(ndf=8, num_D=2), 2)):
        small = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 32, 32, nc)))["params"]
        big = model.init(jax.random.PRNGKey(3),
                         jnp.zeros((1, 128, 128, nc)))["params"]
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), small, big)
