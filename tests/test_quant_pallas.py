"""Int8 MXU megakernel (ops/quant_pallas.py): kernel ≡ emulation, fidelity.

The Pallas kernels are validated in interpreter mode on CPU against the pure
XLA emulation (same int8 math), and the emulated chain is checked against the
fp32 res-block reference within a quantization-noise tolerance. On-chip
speed/fidelity numbers are recorded in STATUS.md (TRT-int8-role path,
ref ``p2pHD/run_engine.py:160-165``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cistar_tpu.ops import nn as tnn
from cistar_tpu.ops.quant_pallas import (
    _resblock_int8_bf16io_emulate,
    _resblock_int8_emulate,
    _run_resblock_int8,
    _run_resblock_int8_bf16io,
    quantize_act,
    quantize_resblock,
    quantize_resnet_trunk,
    resblock_chain_int8,
    resblock_chain_int8_bf16io,
)

N, H, W, C = 2, 16, 16, 128


def _mkblk(seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return {
        "conv1": {"w": 0.05 * jax.random.normal(k1, (3, 3, C, C)),
                  "b": jnp.zeros(C)},
        "conv2": {"w": 0.05 * jax.random.normal(k2, (3, 3, C, C)),
                  "b": jnp.zeros(C)},
    }


def _ref_block(x, blk):
    r = tnn.conv2d_reflect(x, blk["conv1"]["w"], blk["conv1"]["b"])
    r = tnn.relu(tnn.instance_norm(r))
    r = tnn.conv2d_reflect(r, blk["conv2"]["w"], blk["conv2"]["b"])
    return x + tnn.instance_norm(r)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    blks = [_mkblk(i) for i in range(2)]
    qblks = [quantize_resblock(b) for b in blks]
    return x, blks, qblks


def test_int8_kernel_matches_emulation(data):
    x, _, qblks = data
    hq, hs = quantize_act(x)
    kq, ks = _run_resblock_int8(hq, hs, qblks[0], interpret=True)
    eq, es = _resblock_int8_emulate(hq, hs, qblks[0])
    assert bool(jnp.all(kq == eq))
    np.testing.assert_allclose(np.asarray(ks), np.asarray(es), rtol=1e-6)


def test_int8_bf16io_kernel_matches_emulation(data):
    x, _, qblks = data
    ky = _run_resblock_int8_bf16io(x, qblks[0], interpret=True)
    ey = _resblock_int8_bf16io_emulate(x, qblks[0])
    np.testing.assert_allclose(np.asarray(ky), np.asarray(ey),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("chain,kw", [
    (resblock_chain_int8, {}),
    (resblock_chain_int8_bf16io, {}),
])
def test_int8_chain_close_to_fp32(data, chain, kw):
    x, blks, qblks = data
    y_ref = x
    for b in blks:
        y_ref = _ref_block(y_ref, b)
    y_q = chain(x, qblks, force_emulate=True, **kw)
    err = float(jnp.mean(jnp.abs(y_q - y_ref)))
    sig = float(jnp.std(y_ref))
    assert err / sig < 0.05, (err, sig)


def test_bf16_carrier_beats_int8_carrier(data):
    """The full-precision skip path must not accumulate quantization error."""
    x, blks, qblks = data
    y_ref = x
    for b in blks:
        y_ref = _ref_block(y_ref, b)
    e_int8 = float(jnp.mean(jnp.abs(
        resblock_chain_int8(x, qblks, force_emulate=True) - y_ref)))
    e_bf16 = float(jnp.mean(jnp.abs(
        resblock_chain_int8_bf16io(x, qblks, force_emulate=True) - y_ref)))
    assert e_bf16 <= e_int8 * 1.2, (e_bf16, e_int8)


def test_quantize_resnet_trunk_shapes():
    from cistar_tpu.models.cyclegan import ResnetGenerator

    model = ResnetGenerator(output_nc=1, n_residual_blocks=2, in_features=8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 1)))["params"]
    q = quantize_resnet_trunk(params, 2)
    assert len(q) == 2
    assert q[0]["w1q"].shape == (9, 64, 64) and q[0]["w1q"].dtype == jnp.int8
    assert q[0]["sb"].shape == (4, 64)


def test_int8_trunk_apply_runs():
    from cistar_tpu.models.cyclegan import ResnetGenerator
    from cistar_tpu.models.fast_infer import resnet_generator_int8_trunk_apply

    model = ResnetGenerator(output_nc=1, n_residual_blocks=2, in_features=8)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 1)
                    .astype(np.float32) * 2 - 1)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    q = quantize_resnet_trunk(params, 2)
    y_ref = model.apply({"params": params}, x)
    y_q = resnet_generator_int8_trunk_apply(params, q, x, 2)
    assert y_q.shape == y_ref.shape
    assert float(jnp.max(jnp.abs(y_q - y_ref))) < 0.3


# --------------------------------------------------------------------------- #
# Cout-tiled variant (GlobalGenerator-sized trunks)
# --------------------------------------------------------------------------- #
def test_int8_tiled_kernel_matches_emulation(data):
    from cistar_tpu.ops.quant_pallas import (_resblock_int8_tiled_emulate,
                                             _run_resblock_int8_tiled)

    x, _, qblks = data
    ky = _run_resblock_int8_tiled(x, qblks[0], ct=64, interpret=True)
    ey = _resblock_int8_tiled_emulate(x, qblks[0], ct=64)
    np.testing.assert_allclose(np.asarray(ky), np.asarray(ey),
                               rtol=2e-5, atol=2e-5)


def test_int8_tiled_chain_close_to_fp32(data):
    from cistar_tpu.ops.quant_pallas import resblock_chain_int8_tiled

    x, blks, qblks = data
    y_ref = x
    for b in blks:
        y_ref = _ref_block(y_ref, b)
    y_q = resblock_chain_int8_tiled(x, qblks, cout_tile=64,
                                    force_emulate=True)
    err = float(jnp.mean(jnp.abs(y_q - y_ref)))
    sig = float(jnp.std(y_ref))
    assert err / sig < 0.05, (err, sig)


def test_int8_tiled_matches_whole_image_scales_modulo_tiling(data):
    """Single tile (ct == C) must reduce to the bf16io whole-image math."""
    from cistar_tpu.ops.quant_pallas import resblock_chain_int8_tiled

    x, _, qblks = data
    y_tiled = resblock_chain_int8_tiled(x, qblks[:1], cout_tile=C,
                                        force_emulate=True)
    y_whole = _resblock_int8_bf16io_emulate(x, qblks[0])
    # same per-tensor r scale when there is one tile; only the outer x
    # quantization differs (tiled quantizes the carrier, bf16io is identical
    # there too) — expect near-equality
    np.testing.assert_allclose(np.asarray(y_tiled), np.asarray(y_whole),
                               rtol=5e-3, atol=5e-3)


def test_global_generator_int8_trunk_apply():
    from cistar_tpu.models.fast_infer import global_generator_int8_trunk_apply
    from cistar_tpu.models.pix2pixhd import GlobalGenerator
    from cistar_tpu.ops.quant_pallas import quantize_global_trunk

    model = GlobalGenerator(output_nc=1, ngf=8, n_downsampling=2, n_blocks=2)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 1)
                    .astype(np.float32) * 2 - 1)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    q = quantize_global_trunk(params, 2)
    assert q[0]["w1q"].shape == (9, 32, 32)
    y_ref = model.apply({"params": params}, x)
    y_q = global_generator_int8_trunk_apply(params, q, x, n_downsampling=2,
                                            n_blocks=2, cout_tile=16)
    assert y_q.shape == y_ref.shape
    assert float(jnp.max(jnp.abs(y_q - y_ref))) < 0.3


# --------------------------------------------------------------------------- #
# MSRB int8 (the UNet-MSRB trunk)
# --------------------------------------------------------------------------- #
def _mk_msrb(seed, n=32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    mk = lambda k, kh, cin: {"w": 0.05 * jax.random.normal(k, (kh, kh, cin, n)),
                             "b": 0.01 * jnp.ones(n)}
    return {"b00_conv": mk(ks[0], 3, n), "b01_conv": mk(ks[1], 5, n),
            "b10_conv": mk(ks[2], 3, 2 * n), "b11_conv": mk(ks[3], 5, 2 * n),
            "out_conv": mk(ks[4], 1, 2 * n)}


def _ref_msrb(x, blk):
    b00 = tnn.relu(tnn.conv2d(x, blk["b00_conv"]["w"], blk["b00_conv"]["b"],
                              padding=1))
    b01 = tnn.relu(tnn.conv2d(x, blk["b01_conv"]["w"], blk["b01_conv"]["b"],
                              padding=2))
    cat1 = jnp.concatenate([b00, b01], axis=-1)
    b10 = tnn.relu(tnn.conv2d(cat1, blk["b10_conv"]["w"],
                              blk["b10_conv"]["b"], padding=1))
    b11 = tnn.relu(tnn.conv2d(cat1, blk["b11_conv"]["w"],
                              blk["b11_conv"]["b"], padding=2))
    cat2 = jnp.concatenate([b10, b11], axis=-1)
    return tnn.conv2d(cat2, blk["out_conv"]["w"], blk["out_conv"]["b"])


def test_msrb_stage_kernel_matches_emulation():
    from cistar_tpu.ops.quant_pallas import (_msrb_stage_emulate,
                                             _run_msrb_stage, quantize_act,
                                             quantize_msrb)

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 12, 12, 32).astype(np.float32))
    q = quantize_msrb(_mk_msrb(7))
    xq, xs = quantize_act(x)
    k = _run_msrb_stage(xq, xs, q["w3a"], q["w5a"], q["sb1"], 16, True, None,
                        interpret=True)
    e = _msrb_stage_emulate(xq, xs, q["w3a"], q["w5a"], q["sb1"], 16, True,
                            None)
    for a, b in zip(k, e):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-5, atol=2e-5)


def test_msrb_block_int8_close_to_fp32():
    from cistar_tpu.ops.quant_pallas import msrb_block_int8, quantize_msrb

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 12, 12, 32).astype(np.float32))
    blk = _mk_msrb(8)
    y_ref = _ref_msrb(x, blk)
    y_q = msrb_block_int8(x, quantize_msrb(blk), cout_tile=16,
                          force_emulate=True)
    err = float(jnp.mean(jnp.abs(y_q - y_ref)))
    sig = float(jnp.std(y_ref))
    assert err / sig < 0.05, (err, sig)


def test_unet_msrb_int8_apply():
    from cistar_tpu.models.fast_infer import (quantize_unet_msrb,
                                              unet_msrb_int8_apply)
    from cistar_tpu.models.pix2pixhd import UNetGeneratorHD

    m = UNetGeneratorHD(output_nc=1, n_residual_blocks=2, in_features=8)
    x = jnp.asarray(np.random.RandomState(5).rand(1, 32, 32, 1)
                    .astype(np.float32) * 2 - 1)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    q = quantize_unet_msrb(p, 2)
    y_ref = m.apply({"params": p}, x)
    y_q = unet_msrb_int8_apply(p, q, x, n_blocks=2, cout_tile=16)
    assert y_q.shape == y_ref.shape
    assert float(jnp.max(jnp.abs(y_q - y_ref))) < 0.3


def test_local_enhancer_int8_apply():
    from cistar_tpu.models.fast_infer import (local_enhancer_int8_apply,
                                              quantize_local_enhancer)
    from cistar_tpu.models.pix2pixhd import LocalEnhancer

    m = LocalEnhancer(output_nc=1, ngf=4, n_downsample_global=2,
                      n_blocks_global=2, n_local_enhancers=1,
                      n_blocks_local=1)
    x = jnp.asarray(np.random.RandomState(6).rand(1, 64, 64, 1)
                    .astype(np.float32) * 2 - 1)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    q = quantize_local_enhancer(p, 2)
    y_ref = m.apply({"params": p}, x)
    y_q = local_enhancer_int8_apply(p, q, x, n_downsample_global=2,
                                    n_blocks_global=2, n_blocks_local=1,
                                    cout_tile=8)
    assert y_q.shape == y_ref.shape
    assert float(jnp.max(jnp.abs(y_q - y_ref))) < 0.3


def test_pick_cout_tile_raises_over_budget():
    from cistar_tpu.ops.quant_pallas import pick_cout_tile

    with pytest.raises(ValueError, match="cout tile"):
        pick_cout_tile(64 * 64, 1024)  # 1024-sq global trunk: no tile fits


def test_tiled_chain_emulation_ignores_vmem_budget(monkeypatch):
    """Off-TPU the auto cout-tile pick must not consult the VMEM budget —
    shapes that exceed the kernel budget still run emulated."""
    from cistar_tpu.ops import quant_pallas as qp

    def boom(*a, **k):
        raise AssertionError("pick_cout_tile consulted on emulation path")

    monkeypatch.setattr(qp, "pick_cout_tile", boom)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(1, 8, 8, 8).astype(np.float32))
    blk = {"conv1": {"w": jnp.asarray(rng.randn(3, 3, 8, 8), jnp.float32)},
           "conv2": {"w": jnp.asarray(rng.randn(3, 3, 8, 8), jnp.float32)}}
    q = [qp.quantize_resblock(blk)]
    out = qp.resblock_chain_int8_tiled(x, q)  # C=8: falls back to ct=C
    assert out.shape == x.shape


def test_atrous_int8_kernel_matches_emulation():
    """Whole-image atrous res-block kernel (interpret mode) ≡ XLA emulation,
    and the emulation tracks the fp32 block within quantization noise."""
    from cistar_tpu.ops.blocks import ResidualBlockAtrous
    from cistar_tpu.ops.quant_pallas import (_atrous_resblock_int8_emulate,
                                             _run_atrous_resblock_int8,
                                             quantize_atrous_resblock)

    c, h, w = 32, 24, 24  # > 2*max_rate so every dilated tap is in range
    mod = ResidualBlockAtrous(c)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32) * 0.5)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    q = quantize_atrous_resblock(params)

    y_kernel = _run_atrous_resblock_int8(x, q, (2, 4, 6, 8), interpret=True)
    y_emul = _atrous_resblock_int8_emulate(x, q, (2, 4, 6, 8))
    np.testing.assert_allclose(np.asarray(y_kernel), np.asarray(y_emul),
                               rtol=1e-4, atol=1e-4)

    y_ref = mod.apply({"params": params}, x)
    err = float(jnp.max(jnp.abs(y_emul - y_ref)))
    assert err < 0.25, err


def test_bn_folded_resblock_matches_batchnorm_reference():
    """bn=True chains (folded BatchNorm affine) ≡ the BatchNorm ResnetBlock
    in eval mode — kernel (interpret), emulation, and fp32 reference."""
    from cistar_tpu.models.pix2pixhd import ResnetBlock
    from cistar_tpu.ops.quant_pallas import (_resblock_int8_bf16io_emulate,
                                             _run_resblock_int8_bf16io,
                                             quantize_resblock_bn)

    c = 128
    mod = ResnetBlock(c, norm="batch")
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 16, 16, c).astype(np.float32) * 0.5)
    v = mod.init(jax.random.PRNGKey(1), x, train=False)
    params = dict(v["params"])
    stats = jax.tree.map(
        lambda s: jnp.asarray(np.abs(rng.rand(*s.shape)) + 0.5, jnp.float32),
        dict(v["batch_stats"]))
    q = quantize_resblock_bn(params, stats)

    y_ref = mod.apply({"params": params, "batch_stats": stats}, x,
                      train=False)
    y_emul = _resblock_int8_bf16io_emulate(x, q, bn=True)
    y_kern = _run_resblock_int8_bf16io(x, q, interpret=True, bn=True)
    np.testing.assert_allclose(np.asarray(y_kern), np.asarray(y_emul),
                               rtol=1e-4, atol=1e-4)
    err = float(jnp.max(jnp.abs(y_emul - y_ref)))
    assert err < 0.25, err


def test_conv7_cout1_kernel_matches_reflect_conv():
    """Whole-row-tile 7x7 cout=1 head kernel (interpret) == the reflect conv
    composition, including fused tanh and non-multiple row tiling."""
    from cistar_tpu.ops.pallas_kernels import conv2d_reflect_cout1

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, 48, 48, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 16, 1).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(1).astype(np.float32))
    y = conv2d_reflect_cout1(x, w, b, act="tanh", interpret=True)
    ref = jnp.tanh(tnn.conv2d_reflect(x, w, b))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv7_cout1_masked_and_loop_variants_match_reflect_conv():
    """The masked two-stage tap-reduction head kernels (unrolled-tiles and
    fori_loop variants) == the reflect conv composition (interpret), across
    edge-tile row configs, odd widths, and the no-bias/no-act path."""
    from cistar_tpu.ops.pallas_kernels import (conv2d_reflect_cout1_loop,
                                               conv2d_reflect_cout1_masked)

    rng = np.random.RandomState(11)
    for (h, wd, cin, rows) in [(48, 48, 16, 16), (32, 40, 8, 8),
                               (64, 64, 32, 32)]:
        x = jnp.asarray(rng.randn(2, h, wd, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(7, 7, cin, 1).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.randn(1).astype(np.float32))
        ref = jnp.tanh(tnn.conv2d_reflect(x, w, b))
        for fn in (conv2d_reflect_cout1_masked, conv2d_reflect_cout1_loop):
            y = fn(x, w, b, act="tanh", rows=rows, interpret=True)
            np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)
    # no bias / identity act
    x = jnp.asarray(rng.randn(1, 16, 24, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 4, 1).astype(np.float32) * 0.05)
    ref = tnn.conv2d_reflect(x, w, None)
    for fn in (conv2d_reflect_cout1_masked, conv2d_reflect_cout1_loop):
        y = fn(x, w, None, act="none", rows=16, interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.fast
def test_multi_atrous_stage_kernel_matches_emulation_and_fp32():
    """Fused encoder-stage kernel (round 5): interpret-mode kernel ≡ XLA
    emulation, and the emulation tracks the fp32 ``MultiAtrousConv``
    stride-2 stage within quantization noise. Also pins the structural
    fact the kernel exploits: even rates + stride 2 read only the
    even-coordinate pixels, so halved rates on the subsampled image are
    EXACT in fp32."""
    from cistar_tpu.ops import nn as tnn
    from cistar_tpu.ops.blocks import MultiAtrousConv
    from cistar_tpu.ops.quant_pallas import (
        _multi_atrous_stage_int8_emulate, _run_multi_atrous_stage_int8,
        multi_atrous_stage_int8, quantize_multi_atrous_stage)

    cin, cout, h, w = 16, 32, 48, 48
    mod = MultiAtrousConv(cout, stride=2)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32) * 0.5)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]

    # 1) fp32 subsample equivalence: conv(stride=2, rate=r, pad=r) ==
    #    conv(stride=1, rate=r/2, pad=r/2) on x[::2, ::2] — per branch
    xs = x[:, ::2, ::2, :]
    for i, r in enumerate((2, 4, 6, 8)):
        wb = params[f"b{i}_conv"]["w"]
        full = tnn.conv2d(x, wb, None, stride=2, padding=r, dilation=r)
        sub = tnn.conv2d(xs, wb, None, stride=1, padding=r // 2,
                         dilation=r // 2)
        np.testing.assert_allclose(np.asarray(full), np.asarray(sub),
                                   rtol=1e-5, atol=1e-5)

    # 2) interpret-mode kernel ≡ emulation
    q = quantize_multi_atrous_stage(params)
    y_kernel = _run_multi_atrous_stage_int8(xs, q, (1, 2, 3, 4),
                                            interpret=True)
    y_emul = _multi_atrous_stage_int8_emulate(xs, q, (1, 2, 3, 4))
    np.testing.assert_allclose(np.asarray(y_kernel), np.asarray(y_emul),
                               rtol=1e-4, atol=1e-4)

    # 3) public wrapper (emulation path off-TPU) tracks the fp32 stage
    y_pub = multi_atrous_stage_int8(x, q)
    y_ref = mod.apply({"params": params}, x)
    assert y_pub.shape == y_ref.shape == (2, h // 2, w // 2, cout)
    err = float(jnp.max(jnp.abs(y_pub - y_ref)))
    assert err < 0.35, err  # post-IN+ReLU sum of 4 branches, int8 noise

    # 4) odd rates / stride 1 must refuse rather than mis-handle
    with pytest.raises(NotImplementedError):
        multi_atrous_stage_int8(x, q, rates=(1, 2, 3, 4))
    with pytest.raises(NotImplementedError):
        multi_atrous_stage_int8(x, q, stride=1)
