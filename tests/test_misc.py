"""LPIPS metric, config system, aligned dataset, UI editing ops, checkpoints."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cistar_tpu.core.config import ConfigNode, get_ist_cfg_defaults, parse_opt_txt
from cistar_tpu.utils.lpips import lpips_distance



pytestmark = pytest.mark.fast

def test_lpips_zero_for_identical(rng):
    a = jnp.asarray(rng.rand(2, 32, 32, 1).astype(np.float32))
    d = lpips_distance(a, a)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_lpips_monotonic_in_noise(rng):
    a = jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32))
    d_small = float(lpips_distance(a, a + 0.01)[0])
    d_large = float(lpips_distance(a, a + 0.2)[0])
    assert 0 < d_small < d_large


def test_config_clone_freeze_merge():
    cfg = get_ist_cfg_defaults()
    c2 = cfg.clone()
    c2.LOSS.MAX_ITER = 10
    assert cfg.LOSS.MAX_ITER == 300
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.LOSS.MAX_ITER = 5
    c3 = cfg.clone().defrost()
    c3.merge_from_list(["LOSS.MAX_ITER", "42", "DATA.IMG_SIZE", "128"])
    assert c3.LOSS.MAX_ITER == 42 and c3.DATA.IMG_SIZE == 128


def test_parse_legacy_opt_txt():
    """The four shipped opt.txt snapshots must remain parseable (SURVEY §5)."""
    path = "/root/reference/p2pHD/checkpoints/r2l_MSRB_7/opt.txt"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    opt = parse_opt_txt(path)
    assert opt["netG"] == "UNet"
    assert opt["n_blocks_global"] == 3
    assert opt["r2l"] is True
    assert opt["lr"] == 0.0001
    assert opt["num_D"] == 2
    assert opt["no_vgg_loss"] is True
    assert opt["gpu_ids"] == [0]


def test_aligned_dataset_shared_params(tmp_path, rng):
    from PIL import Image

    from cistar_tpu.data.aligned import AlignedDataset

    # build train_A / train_B dirs
    for d in ("train_A", "train_B"):
        os.makedirs(tmp_path / d)
        for i in range(3):
            arr = (rng.rand(40, 40) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / d / f"{i}.png")

    class Opt:
        dataroot = str(tmp_path)
        phase = "train"
        label_nc = 0
        no_instance = True
        load_features = False
        isTrain = True
        use_encoded_image = False
        resize_or_crop = "resize_and_crop"
        loadSize = 32
        fineSize = 16
        batchSize = 1
        no_flip = False
        n_downsample_global = 2

    ds = AlignedDataset(Opt())
    item = ds[0]
    assert item["label"].shape == (16, 16, 3)
    assert item["image"].shape == (16, 16, 3)
    assert item["label"].min() >= -1.0 and item["label"].max() <= 1.0


def test_ui_edit_ops():
    from cistar_tpu.engines.ui import add_strokes, change_label, set_object_style

    label = np.zeros((8, 8), np.int32)
    inst = np.zeros((8, 8), np.int32)
    inst[2:5, 2:5] = 7
    label[2:5, 2:5] = 3
    l2, i2 = change_label(label, inst, (3, 3), new_label=5)
    assert l2[3, 3] == 5 and i2[3, 3] == 5 and l2[0, 0] == 0

    l3, i3 = add_strokes(label, inst, [0], [0], brush=3, paint_label=9)
    assert l3[0, 0] == 9 and l3[1, 1] == 9

    feat = np.zeros((8, 8, 3), np.float32)
    centers = np.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32)
    f2 = set_object_style(feat, inst, 7, centers, 1)
    np.testing.assert_allclose(f2[3, 3], [4.0, 5.0, 6.0])
    np.testing.assert_allclose(f2[0, 0], 0.0)


def test_checkpoint_roundtrip(tmp_path):
    from cistar_tpu.core.checkpoint import load_pytree, load_pytree_like, save_pytree

    tree = {"a": {"w": np.ones((2, 3), np.float32), "b": np.zeros(3)},
            "c": np.arange(4, dtype=np.int32)}
    path = str(tmp_path / "t.npz")
    save_pytree(path, tree)
    back = load_pytree(path)
    np.testing.assert_allclose(back["a"]["w"], tree["a"]["w"])
    np.testing.assert_allclose(back["c"], tree["c"])
    like = {"a": {"w": jnp.zeros((2, 3)), "b": jnp.ones(3)},
            "c": jnp.zeros(4, jnp.int32)}
    cast = load_pytree_like(path, like)
    assert cast["a"]["w"].dtype == jnp.zeros(1).dtype


def test_ist_single_target_variants(rng):
    from cistar_tpu.engines.ist import GatysEngine
    from cistar_tpu.models import vgg as vgg_lib

    cfg = get_ist_cfg_defaults()
    cfg.DATA.IMG_SIZE = 32
    eng = GatysEngine(cfg, vgg_lib.init_vgg_params(seed=0),
                      compute_dtype=jnp.float32, history_size=5)
    content = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 255 - 120)
    style = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 255 - 120)
    x, loss = eng.optimize_single_target(content, style, content_only=True)
    assert x.shape == content.shape and np.isfinite(float(loss))
    x2, loss2 = eng.optimize_single_target(content, style, style_only=True,
                                           opt="Adam")
    assert x2.shape == content.shape

    sal = eng.saliency(content, ("relu1_1",), (1.0,))
    assert sal.shape == content.shape


def test_fast_infer_matches_linen(rng):
    """Fused-path forwards consume the linen param trees and match outputs
    (CPU falls back to the XLA composition — validates the API contract)."""
    from cistar_tpu.models.cyclegan import ResnetGenerator
    from cistar_tpu.models.fast_infer import resnet_generator_fast_apply
    from cistar_tpu.models.pix2pixhd import GlobalGenerator
    from cistar_tpu.models.fast_infer import global_generator_fast_apply

    m = ResnetGenerator(output_nc=1, n_residual_blocks=2, in_features=8)
    x = jnp.asarray(rng.randn(1, 32, 32, 1).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    ref = m.apply({"params": p}, x)
    out = resnet_generator_fast_apply(p, x, n_residual_blocks=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)

    g = GlobalGenerator(output_nc=1, ngf=8, n_downsampling=2, n_blocks=2)
    pg = g.init(jax.random.PRNGKey(1), x)["params"]
    ref2 = g.apply({"params": pg}, x)
    out2 = global_generator_fast_apply(pg, x, n_downsampling=2, n_blocks=2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=1e-4,
                               atol=1e-4)


def test_ui_style_switch_changes_output(rng):
    """set_object_style must change the synthesized pixels in the object's
    region (the round-1 EditSession ignored its feature map; VERDICT #7)."""
    import jax

    from cistar_tpu.engines.p2phd import Pix2PixHD
    from cistar_tpu.engines.ui import EditSession

    eng = Pix2PixHD(net_g="global", ngf=8, ndf=8, n_downsample_global=2,
                    n_blocks_global=1, label_nc=4, r2l=False,
                    no_instance=False, instance_feat=True, feat_num=3, nef=4,
                    n_downsample_e=2, image_size=32,
                    compute_dtype=jnp.float32)
    state = eng.init_state(jax.random.PRNGKey(0), image_size=32)

    label = rng.randint(0, 4, size=(32, 32)).astype(np.float32)
    inst = np.zeros((32, 32), np.int32)
    inst[8:24, 8:24] = 7
    feat = np.zeros((32, 32, 3), np.float32)
    sess = EditSession(eng, state.g, label, inst, feat=feat)
    before = sess.current.copy()

    centers = np.asarray([[0.0, 0.0, 0.0], [3.0, -2.0, 1.0]], np.float32)
    after = sess.set_style(7, centers, 1)
    region = np.abs(after[8:24, 8:24] - before[8:24, 8:24])
    assert float(region.max()) > 1e-4, "style switch did not affect output"


def test_label_viz_colormaps():
    from cistar_tpu.utils.label_viz import colorize, labelcolormap, tensor2label

    # procedural map — values from the reference algorithm (util/util.py:52-76)
    cm = labelcolormap(10)
    assert cm.tolist()[:4] == [[0, 0, 0], [128, 0, 0], [0, 128, 0],
                               [128, 128, 0]]
    # cityscapes table spot checks (road=7, car=26)
    cs = labelcolormap(35)
    assert cs[7].tolist() == [128, 64, 128]
    assert cs[26].tolist() == [0, 0, 142]

    lab = np.zeros((4, 4), np.int32)
    lab[0, 0] = 7
    img = colorize(lab, 35)
    assert img.shape == (4, 4, 3) and img[0, 0].tolist() == [128, 64, 128]

    onehot = np.zeros((4, 4, 35), np.float32)
    onehot[..., 7] = 1.0
    assert tensor2label(onehot, 35)[0, 0].tolist() == [128, 64, 128]
    # r2l mode (n_label=0): grayscale passthrough
    g = tensor2label(np.full((4, 4, 1), 0.5, np.float32), 0)
    assert g.dtype == np.uint8 and g[0, 0] == 127


def test_enable_compilation_cache(tmp_path, monkeypatch):
    import jax

    from cistar_tpu.core.cache import enable_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        p = enable_compilation_cache(str(tmp_path / "xla"))
        assert p == str(tmp_path / "xla")
        assert jax.config.jax_compilation_cache_dir == p
        monkeypatch.setenv("CISTAR_NO_COMPILE_CACHE", "1")
        assert enable_compilation_cache(str(tmp_path / "other")) is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_r2l_dataset_cache_parity_and_budget(tmp_path):
    from PIL import Image

    from cistar_tpu.data.datasets import Radar2LidarDataset

    rng = np.random.RandomState(0)
    for sub in ("radar", "lidar"):
        os.makedirs(tmp_path / sub)
        for i in range(4):
            Image.fromarray(rng.randint(0, 255, (32, 32), np.uint8)).save(
                tmp_path / sub / f"{i:03d}.png")
    a = Radar2LidarDataset(str(tmp_path), size=32, mode="train")
    b = Radar2LidarDataset(str(tmp_path), size=32, mode="train", cache=False)
    for i in range(len(a)):
        ia, ib = a[i], b[i]
        assert np.array_equal(ia["label"], ib["label"])
        assert np.array_equal(ia["image"], ib["image"])
    assert a._cache and a._cache_bytes > 0
    # a tiny budget disables insertion but never changes results
    c = Radar2LidarDataset(str(tmp_path), size=32, mode="train")
    c._cache_budget = 1
    d = Radar2LidarDataset(str(tmp_path), size=32, mode="train", cache=False)
    for i in range(len(c)):
        assert np.array_equal(c[i]["label"], d[i]["label"])
    assert not c._cache


def test_metrics_csv_header_union_on_key_change(tmp_path):
    from cistar_tpu.utils.metrics import MetricsLogger

    m = MetricsLogger(str(tmp_path), n_epochs=3, batches_per_epoch=1,
                      log_every=1000)
    m.log({"loss_a": 1.0}, n_images=1)
    m.end_epoch()
    m.log({"loss_a": 2.0, "loss_b": 3.0}, n_images=1)  # new key appears
    m.end_epoch()
    lines = (tmp_path / "loss_log.csv").read_text().splitlines()
    assert lines[0] == "epoch,loss_a,loss_b"
    assert lines[1].startswith("0,1.000000,")   # padded old row
    assert lines[2] == "1,2.000000,3.000000"


def test_exec_cache_compile_round_trip(tmp_path, capsys):
    """Disk-backed executable cache (VERDICT r3 #5): first call compiles and
    serializes, second call loads the executable without compiling, results
    identical; arg-shape changes miss the cache."""
    import jax
    import jax.numpy as jnp

    from cistar_tpu.core.cache import exec_cache_compile

    @jax.jit
    def f(x, y):
        return jnp.tanh(x @ y) * 2.0

    x = jnp.ones((64, 64), jnp.float32) * 0.1
    d = str(tmp_path / "exe")
    c1 = exec_cache_compile(f, (x, x), key="t", cache_dir=d)
    out1 = c1(x, x)
    assert "saved compiled step" in capsys.readouterr().out
    c2 = exec_cache_compile(f, (x, x), key="t", cache_dir=d)
    assert "loaded pre-compiled step" in capsys.readouterr().out
    np.testing.assert_array_equal(np.asarray(c2(x, x)), np.asarray(out1))
    # different shape -> different entry (no false hit)
    y = jnp.ones((32, 32), jnp.float32)
    exec_cache_compile(f, (y, y), key="t", cache_dir=d)
    assert "saved compiled step" in capsys.readouterr().out
