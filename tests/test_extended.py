"""Extended trainers: transfer pair, R2L feature alignment, UDA R2LAE, critic."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cistar_tpu.engines.extended import (
    R2LAE,
    R2LImageCritic,
    R2LTransfer,
    TransferPairG,
    make_transfer_p2p,
)


def _img(rng, n=1, s=32):
    return jnp.asarray(rng.randn(n, s, s, 1).astype(np.float32))


def test_transfer_pair_generator(rng):
    m = TransferPairG(output_nc=1, ngf=4, n_downsampling=4, n_scale=3, n_blocks=1)
    x = _img(rng, s=64)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": p}, x)
    assert y.shape == x.shape
    assert "E" in p and "G" in p


def test_transfer_p2p_train_step(rng):
    eng = make_transfer_p2p(output_nc=1, ngf=4, n_downsampling=4, n_scale=3,
                            n_blocks=1, input_nc=1, ndf=8, num_d=2,
                            image_size=64, compute_dtype=jnp.float32)
    state = eng.init_state(jax.random.PRNGKey(0), image_size=64)
    label, image = _img(rng, s=64), _img(rng, s=64)
    state2, metrics, fake = eng.train_step(state, label, None, image)
    assert fake.shape == image.shape
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_r2l_transfer_step(rng):
    # 64² images -> 4² feature maps; shallow 2-layer critic fits that size
    eng = R2LTransfer(ngf=4, n_downsampling=4, n_scale=3, n_blocks=1,
                      ndf=8, num_d=2, df_layers=2, image_size=64,
                      compute_dtype=jnp.float32)
    frozen = eng.init_frozen(jax.random.PRNGKey(0), size=64)
    state = eng.init_state(jax.random.PRNGKey(1), size=64)
    radar, lidar = _img(rng, s=64), _img(rng, s=64)
    e0 = np.asarray(jax.tree.leaves(state.lidar_e)[0]).copy()
    state2, metrics, (radar_trans, lidar_trans) = eng.train_step(
        state, frozen, radar, lidar)
    assert radar_trans.shape == radar.shape
    assert all(np.isfinite(float(v)) for v in metrics.values())
    # lidar encoder trains; frozen nets untouched by construction
    assert not np.allclose(np.asarray(jax.tree.leaves(state2.lidar_e)[0]), e0)


def test_r2lae_step(rng):
    eng = R2LAE(size=32, n_downsample=2, ngf=4, ndf=8, num_d=2,
                compute_dtype=jnp.float32)
    state = eng.init_state(jax.random.PRNGKey(0), size=32)
    radar, lidar = _img(rng, s=32), _img(rng, s=32)
    e0 = np.asarray(jax.tree.leaves(state.e)[0]).copy()
    state2, metrics, fakes = eng.train_step(state, radar, lidar)
    assert fakes["lidar_gen"].shape == lidar.shape
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert not np.allclose(np.asarray(jax.tree.leaves(state2.e)[0]), e0)
    out = eng.infer(state2, radar, lidar)
    assert out["radar_gen"].shape == radar.shape


def test_r2lae_wgan_critic_variant(rng):
    # wgan critic is 5 conv layers deep -> needs >=32² feature maps
    eng = R2LAE(size=64, n_downsample=1, ngf=4, ndf=8, num_d=2, wgan=True,
                compute_dtype=jnp.float32)
    state = eng.init_state(jax.random.PRNGKey(0), size=64)
    state2, metrics, _ = eng.train_step(state, _img(rng, s=64), _img(rng, s=64))
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_r2l_image_critic(rng):
    eng = R2LImageCritic(ngf=4, n_layer=3)
    state = eng.init_state(jax.random.PRNGKey(0), size=32)
    lidar = _img(rng, n=2, s=32)
    radar = jnp.asarray(rng.randn(2, 32, 32, 1).astype(np.float32) + 2.0)
    state2, metrics = eng.train_step(state, lidar, radar)
    assert set(metrics) == {"w_distance", "lidar_F", "radar_F", "gp"}
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_r2lae_eval_batch_independent(rng):
    """BN running averages at eval: a sample's output must not depend on
    which other samples share its batch (round-1 used per-batch stats)."""
    eng = R2LAE(size=32, n_downsample=2, ngf=4, ndf=8, num_d=2,
                compute_dtype=jnp.float32)
    state = eng.init_state(jax.random.PRNGKey(0), size=32)
    state, _, _ = eng.train_step(state, _img(rng, s=32), _img(rng, s=32))
    r1, l1 = _img(rng, s=32), _img(rng, s=32)
    r2, l2 = _img(rng, s=32), _img(rng, s=32)
    solo = eng.infer(state, r1, l1)
    pair = eng.infer(state, jnp.concatenate([r1, r2]),
                     jnp.concatenate([l1, l2]))
    np.testing.assert_allclose(np.asarray(pair["radar_gen"][:1]),
                               np.asarray(solo["radar_gen"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pair["lidar_gen"][:1]),
                               np.asarray(solo["lidar_gen"]),
                               rtol=1e-5, atol=1e-5)


def test_r2lae_running_stats_update(rng):
    """train_step must advance the BN EMA statistics."""
    eng = R2LAE(size=32, n_downsample=2, ngf=4, ndf=8, num_d=2,
                compute_dtype=jnp.float32)
    state = eng.init_state(jax.random.PRNGKey(0), size=32)
    m0 = np.asarray(jax.tree.leaves(state.stats["e"])[0]).copy()
    state2, _, _ = eng.train_step(state, _img(rng, s=32), _img(rng, s=32))
    m1 = np.asarray(jax.tree.leaves(state2.stats["e"])[0])
    assert not np.allclose(m0, m1)


def test_loader_propagates_worker_exceptions():
    """A failing __getitem__ must raise in the consumer, not silently end
    the epoch early (ref behavior gap: custom_dataset_data_loader.py:25-38)."""
    from cistar_tpu.data.datasets import Loader

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i >= 4:
                raise RuntimeError("decode failed")
            return {"x": np.zeros((2, 2), np.float32)}

    loader = Loader(Bad(), batch_size=2)
    with pytest.raises(RuntimeError, match="decode failed"):
        for _ in loader:
            pass


@pytest.mark.fast
def test_r2ltransfer_init_at_shipped_config():
    """init_state must work for the TRUE 512² config (df_layers=5): the
    capped fast-init path feeds 4² features to a 5-layer critic unless the
    critic is initialized at its own spatially-sufficient size (bug found
    by the round-4 driven quality run)."""
    import jax

    from cistar_tpu.engines.extended import R2LTransfer

    eng = R2LTransfer(ngf=8, n_downsampling=4, n_scale=3, n_blocks=1,
                      df_layers=5, image_size=512)
    state = eng.init_state(jax.random.PRNGKey(0), size=512)
    assert state.net_df is not None
