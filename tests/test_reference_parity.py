"""End-to-end parity vs the ACTUAL reference code (not torch twins).

Each case runs the reference's own PyTorch modules/pipelines in a CPU
subprocess (``tools/ref_golden_*.py``) with seeded random init — no
pretrained weights exist in the zero-egress container — records weights and
outputs, converts the weights with the framework's checkpoint converters,
and asserts the TPU framework reproduces the reference outputs.

Covered flows:
  * CycleGAN ``test.py:136-155`` (fake_B / fake_A / recover_B incl. the
    Normalize(0.5,0.5) recover renorm) for p2p / atrous-dense / unet gens.
  * pix2pixHD generators (global / UNet-MSRB / local), multiscale D.
  * pix2pixHD ``InferenceModel.inference`` driven by the shipped
    ``checkpoints/r2l_MSRB_7/opt.txt`` (slow; model-level encode path).

The north-star fidelity budget is 1e-2 (LPIPS); fp32 conversion parity here
is orders of magnitude tighter (maxabs asserted ≤5e-3, typically ≤1e-3).
Full-size recorded runs live in docs/PARITY.md.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")


def _nhwc(a):
    return np.asarray(a).transpose(0, 2, 3, 1)


def _golden(tmpdir, script, name, *args):
    """Run a golden-generation subprocess once per session; load its npz."""
    sys.path.insert(0, TOOLS)
    import refbridge

    out = os.path.join(str(tmpdir), name + ".npz")
    if not os.path.exists(out):
        cmd = [sys.executable, os.path.join(TOOLS, script),
               "--out", out, *args]
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           timeout=1200)
        assert r.returncode == 0, r.stdout + r.stderr
    return refbridge.load_golden(out)


@pytest.fixture(scope="session")
def gdir(tmp_path_factory):
    return tmp_path_factory.mktemp("golden")


# --------------------------------------------------------------------------- #
# CycleGAN — the full test-CLI flow (CycleGAN/test.py:136-155)
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("gen_type", ["p2p", "atrous_dense", "unet"])
def test_cyclegan_testflow_parity(gdir, gen_type):
    from cistar_tpu.core.convert_models import convert_cyclegan_generator
    from cistar_tpu.models import cyclegan as mz

    sds, io = _golden(gdir, "ref_golden_cyclegan.py",
                      f"cyclegan_{gen_type}", "--size", "96",
                      "--gen_type", gen_type)
    conv_name = {"p2p": "p2p", "atrous_dense": "atrous",
                 "unet": "unet"}[gen_type]
    pa = convert_cyclegan_generator(sds["G_A2B"], conv_name,
                                    n_residual_blocks=6)
    pb = convert_cyclegan_generator(sds["G_B2A"], conv_name,
                                    n_residual_blocks=6)
    model = mz.build_generator(conv_name if conv_name != "atrous"
                               else "atrous", output_nc=1, in_features=16,
                               n_residual_blocks=6, dense_decoder=True)

    def apply(p, x_nchw):
        x = jnp.asarray(np.asarray(x_nchw).transpose(0, 2, 3, 1))
        return np.asarray(model.apply({"params": p}, x)).transpose(0, 3, 1, 2)

    fake_B = apply(pa, io["real_A"])
    fake_A = apply(pb, io["real_B"])
    recover_B = apply(pa, (fake_A - 0.5) / 0.5)
    for name, ours in [("fake_B", fake_B), ("fake_A", fake_A),
                       ("recover_B", recover_B)]:
        err = float(np.max(np.abs(ours - io[name])))
        assert err < 5e-3, (gen_type, name, err)


# --------------------------------------------------------------------------- #
# IST — the full Gatys pipeline incl. the torch L-BFGS optimization loop
# --------------------------------------------------------------------------- #
def test_ist_gatys_pipeline_parity(gdir):
    """Reference ImageTransform + VGG-19 + 40-iter L-BFGS vs our jitted
    engine, shared seeded-Kaiming VGG weights. The optimization trajectories
    drift (chaotic objective), so parity is judged perceptually: the
    north-star budget is 1e-2; measured ~1e-3 at this config (the recorded
    full-size numbers live in docs/PARITY.md)."""
    from PIL import Image

    from cistar_tpu.core.config import get_ist_cfg_defaults
    from cistar_tpu.engines.ist import GatysEngine
    from cistar_tpu.models.vgg import torch_vgg_conv_to_params
    from cistar_tpu.utils.lpips import lpips_distance

    sds, io = _golden(gdir, "ref_golden_ist.py", "ist_96",
                      "--size", "96", "--iters", "40")
    cfg = get_ist_cfg_defaults()
    cfg.DATA.IMG_SIZE = 96
    cfg.LOSS.MAX_ITER = 40
    eng = GatysEngine(cfg, torch_vgg_conv_to_params(sds["vgg"]),
                      compute_dtype=jnp.float32)
    out = eng.transfer_style(Image.fromarray(io["content_rgb"]),
                             Image.fromarray(io["style_rgb"]), max_iters=40)
    ours = np.asarray(out).astype(np.float32) / 255.0
    ref = io["out_rgb"].astype(np.float32) / 255.0
    d = float(np.mean(np.asarray(
        lpips_distance(jnp.asarray(ours)[None], jnp.asarray(ref)[None]))))
    assert d < 1e-2, f"perceptual distance {d} exceeds the north-star budget"


# --------------------------------------------------------------------------- #
# pix2pixHD generators / discriminator
# --------------------------------------------------------------------------- #
def test_p2phd_global_parity(gdir):
    from cistar_tpu.core.convert_models import convert_global_generator
    from cistar_tpu.models.pix2pixhd import GlobalGenerator

    sds, io = _golden(gdir, "ref_golden_p2phd.py", "p2phd_global",
                      "--family", "global", "--size", "64", "--ngf", "16")
    params = convert_global_generator(sds["net"], n_downsampling=3, n_blocks=9)
    model = GlobalGenerator(output_nc=1, ngf=16, n_downsampling=3, n_blocks=9)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(_nhwc(io["x"])))
    assert float(np.max(np.abs(np.asarray(out) - _nhwc(io["y"])))) < 5e-3


def test_p2phd_unet_msrb_parity(gdir):
    """The shipped r2l_MSRB_7 generator family (opt.txt:51)."""
    from cistar_tpu.core.convert_models import convert_unet_generator_hd
    from cistar_tpu.models.pix2pixhd import UNetGeneratorHD

    sds, io = _golden(gdir, "ref_golden_p2phd.py", "p2phd_unet",
                      "--family", "unet", "--size", "64", "--ngf", "16")
    params = convert_unet_generator_hd(sds["net"], n_residual_blocks=3)
    model = UNetGeneratorHD(output_nc=1, n_residual_blocks=3, in_features=16)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(_nhwc(io["x"])))
    assert float(np.max(np.abs(np.asarray(out) - _nhwc(io["y"])))) < 5e-3


def test_p2phd_local_enhancer_parity(gdir):
    from cistar_tpu.core.convert_models import convert_local_enhancer
    from cistar_tpu.models.pix2pixhd import LocalEnhancer

    sds, io = _golden(gdir, "ref_golden_p2phd.py", "p2phd_local",
                      "--family", "local", "--size", "64", "--ngf", "8")
    params = convert_local_enhancer(sds["net"], n_downsample_global=3,
                                    n_blocks_global=9, n_local_enhancers=1,
                                    n_blocks_local=3)
    model = LocalEnhancer(output_nc=1, ngf=8, n_downsample_global=3,
                          n_blocks_global=9, n_local_enhancers=1,
                          n_blocks_local=3)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(_nhwc(io["x"])))
    assert float(np.max(np.abs(np.asarray(out) - _nhwc(io["y"])))) < 5e-3


def test_p2phd_multiscale_d_parity(gdir):
    from cistar_tpu.core.convert_models import convert_multiscale_discriminator
    from cistar_tpu.models.pix2pixhd import MultiscaleDiscriminator

    sds, io = _golden(gdir, "ref_golden_p2phd.py", "p2phd_msd",
                      "--family", "msd", "--size", "64", "--ngf", "16")
    params = convert_multiscale_discriminator(sds["net"], num_d=2, n_layers=3)
    model = MultiscaleDiscriminator(ndf=16, n_layers=3, num_D=2,
                                    get_interm_feat=True)
    outs = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(_nhwc(io["x"])))
    for i, scale in enumerate(outs):
        for j, feat in enumerate(scale):
            ref = _nhwc(io[f"y_{i}_{j}"])
            assert float(np.max(np.abs(np.asarray(feat) - ref))) < 5e-3, (i, j)


def test_p2phd_multiscale_global_parity(gdir):
    """The shipped r2l experiment's generator (checkpoints/r2l/opt.txt:51)."""
    from cistar_tpu.core.convert_models import convert_multiscale_global_generator
    from cistar_tpu.models.pix2pixhd import MultiscaleGlobalGenerator

    sds, io = _golden(gdir, "ref_golden_p2phd.py", "p2phd_multiscale",
                      "--family", "multiscale", "--size", "64", "--ngf", "8")
    params, stats = convert_multiscale_global_generator(sds["net"], n_blocks=9)
    # define_G quirk: this family always runs on the BatchNorm default
    model = MultiscaleGlobalGenerator(output_nc=1, ngf=8, n_blocks=9,
                                      norm="batch")
    variables = {"params": jax.tree.map(jnp.asarray, params),
                 "batch_stats": jax.tree.map(jnp.asarray, stats)}
    # the golden forward ran in eval() mode → running averages
    out = model.apply(variables, jnp.asarray(_nhwc(io["x"])), train=False)
    assert float(np.max(np.abs(np.asarray(out) - _nhwc(io["y"])))) < 5e-3

    # ENGINE-level parity: the jitted infer path must thread batch_stats
    # identically (round-2 fix — this previously crashed with
    # ScopeCollectionNotFound before any comparison could run)
    from cistar_tpu.engines.p2phd import Pix2PixHD

    eng = Pix2PixHD(net_g="multiscale", input_nc=1, output_nc=1, label_nc=0,
                    ngf=8, n_blocks_global=9, norm="instance",
                    no_instance=True, r2l=True, image_size=64,
                    compute_dtype=jnp.float32)
    eng_out = eng.infer_step(variables["params"],
                             jnp.asarray(_nhwc(io["x"])),
                             g_stats=variables["batch_stats"])
    assert float(np.max(np.abs(np.asarray(eng_out) - _nhwc(io["y"])))) < 5e-3


def test_p2phd_autoencoder_parity(gdir):
    from cistar_tpu.core.convert_models import convert_autoencoder
    from cistar_tpu.models.pix2pixhd import AutoEncoder

    sds, io = _golden(gdir, "ref_golden_p2phd.py", "p2phd_autoencoder",
                      "--family", "autoencoder", "--size", "64", "--ngf", "16")
    params = convert_autoencoder(sds["net"], n_downsampling=2, n_blocks=3)
    model = AutoEncoder(output_nc=1, ngf=16, n_downsampling=2, n_blocks=3)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(_nhwc(io["x"])))
    assert float(np.max(np.abs(np.asarray(out) - _nhwc(io["y"])))) < 5e-3


def test_p2phd_encoder_parity(gdir):
    """netE incl. the instance-wise average pooling (networks.py:412-422)."""
    from cistar_tpu.core.convert_models import convert_p2phd_encoder
    from cistar_tpu.models.pix2pixhd import Encoder

    sds, io = _golden(gdir, "ref_golden_p2phd.py", "p2phd_encoder",
                      "--family", "encoder", "--size", "64")
    params = convert_p2phd_encoder(sds["net"], n_downsampling=4)
    model = Encoder(output_nc=3, ngf=16, n_downsampling=4)
    inst = jnp.asarray(_nhwc(io["inst"]))
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(_nhwc(io["x"])), inst)
    assert float(np.max(np.abs(np.asarray(out) - _nhwc(io["y"])))) < 5e-3


def test_p2phd_wdiscriminator_parity(gdir):
    from cistar_tpu.core.convert_models import convert_wdiscriminator
    from cistar_tpu.models.pix2pixhd import WDiscriminator

    sds, io = _golden(gdir, "ref_golden_p2phd.py", "p2phd_wd",
                      "--family", "wd", "--size", "64")
    params = convert_wdiscriminator(sds["net"], n_layer=5)
    model = WDiscriminator(ngf=16, n_layer=5, activate=False, flatten=True)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(_nhwc(io["x"])))
    assert abs(float(out) - float(io["y"][0])) < 5e-3


def test_p2phd_uda_parity(gdir):
    """UDA encoder/decoders/domain classifier (R2LAE wiring), both BN modes:
    eval (running stats) and train (batch stats)."""
    from cistar_tpu.core.convert_models import (
        convert_domain_feature_discriminator, convert_uda_decoder,
        convert_uda_encoder)
    from cistar_tpu.models.pix2pixhd import (DomainFeatureDiscriminator,
                                             UDADecoder, UDAEncoder)

    sds, io = _golden(gdir, "ref_golden_p2phd.py", "p2phd_uda",
                      "--family", "uda", "--size", "64")
    pe, se = convert_uda_encoder(sds["enc"], down_conv=4, n_resblocks=2)
    pr, sr = convert_uda_decoder(sds["dec_r"], down_conv=4, n_resblocks=2)
    pd, sd_ = convert_domain_feature_discriminator(sds["dom"])
    enc = UDAEncoder(size=64, down_conv=4, ngf=16, n_resblocks=2, max_ch=256)
    dec = UDADecoder(output_nc=1, size=64, f_size=4, down_conv=4, n_resblocks=2)
    dom = DomainFeatureDiscriminator()

    to_j = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    x = jnp.asarray(_nhwc(io["x"]))

    # eval mode: running averages (fresh at init in the golden)
    feat = enc.apply({"params": to_j(pe), "batch_stats": to_j(se)}, x,
                     train=False)
    assert float(np.max(np.abs(np.asarray(feat) - _nhwc(io["feat"])))) < 5e-3
    rec = dec.apply({"params": to_j(pr), "batch_stats": to_j(sr)}, feat,
                    train=False)
    assert float(np.max(np.abs(np.asarray(rec) - _nhwc(io["rec_radar"])))) < 5e-3
    dm = dom.apply({"params": to_j(pd), "batch_stats": to_j(sd_)}, feat,
                   train=False)
    assert float(np.max(np.abs(np.asarray(dm) - _nhwc(io["dom"])))) < 5e-3

    # train mode: batch statistics
    feat_t = enc.apply({"params": to_j(pe), "batch_stats": to_j(se)}, x,
                       train=True)
    assert float(np.max(np.abs(np.asarray(feat_t)
                               - _nhwc(io["feat_train"])))) < 5e-3
    rec_t = dec.apply({"params": to_j(pr), "batch_stats": to_j(sr)}, feat_t,
                      train=True)
    assert float(np.max(np.abs(np.asarray(rec_t)
                               - _nhwc(io["rec_radar_train"])))) < 5e-3


def test_p2phd_transfer_pair_parity(gdir):
    """FeatureEncoder (bespoke numbered save format) + TransferGenerator —
    the R2LTransfer frozen-net stack loads these converted checkpoints."""
    from cistar_tpu.core.convert_models import (convert_feature_encoder,
                                                convert_transfer_generator)
    from cistar_tpu.models.pix2pixhd import FeatureEncoder, TransferGenerator

    sds, io = _golden(gdir, "ref_golden_p2phd.py", "p2phd_transfer",
                      "--family", "transfer", "--size", "64")
    numbered = {}
    for k, v in sds["fe"].items():
        idx, key = k.split("|", 1)
        numbered.setdefault(idx, {})[key] = v
    pe = convert_feature_encoder(numbered, n_downsampling=4, n_scale=3)
    pg = convert_transfer_generator(sds["tg"], n_blocks=3, n_upsampling=4)
    fe = FeatureEncoder(ngf=16, n_downsampling=4, n_scale=3)
    tg = TransferGenerator(output_nc=1, n_blocks=3, ngf=16, n_upsampling=4)
    feat = fe.apply({"params": jax.tree.map(jnp.asarray, pe)},
                    jnp.asarray(_nhwc(io["x"])))
    assert float(np.max(np.abs(np.asarray(feat) - _nhwc(io["feat"])))) < 5e-3
    out = tg.apply({"params": jax.tree.map(jnp.asarray, pg)}, feat)
    assert float(np.max(np.abs(np.asarray(out) - _nhwc(io["y"])))) < 5e-3


@pytest.mark.slow
def test_p2phd_inference_r2l_opt_txt_parity(gdir):
    """Model-level: InferenceModel driven by the shipped opt.txt (ngf=64)."""
    from cistar_tpu.core.convert_models import convert_unet_generator_hd
    from cistar_tpu.models.pix2pixhd import UNetGeneratorHD

    sds, io = _golden(gdir, "ref_golden_p2phd.py", "p2phd_infer_r2l",
                      "--family", "inference_r2l", "--size", "64")
    params = convert_unet_generator_hd(sds["G"], n_residual_blocks=3)
    model = UNetGeneratorHD(output_nc=1, n_residual_blocks=3, in_features=64)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(_nhwc(io["x"])))
    assert float(np.max(np.abs(np.asarray(out) - _nhwc(io["y"])))) < 5e-3
