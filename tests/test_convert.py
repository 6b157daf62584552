"""Checkpoint-conversion parity: torch models → converted params → identical
outputs (the pixel-equivalence requirement for existing checkpoints).

The torch modules here are fresh test-harness implementations following the
reference architectures (not imports of reference code); their state_dict key
layouts match what the reference training scripts save.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from cistar_tpu.core import convert_models as cm
from cistar_tpu.models.cyclegan import PatchDiscriminator, ResnetGenerator, UnetGenerator
from cistar_tpu.models.pix2pixhd import (
    GlobalGenerator,
    LocalEnhancer,
    MultiscaleDiscriminator,
    UNetGeneratorHD,
)


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _res_block_t(nf):
    return nn.Sequential(
        nn.ReflectionPad2d(1), nn.Conv2d(nf, nf, 3), nn.InstanceNorm2d(nf),
        nn.ReLU(True), nn.ReflectionPad2d(1), nn.Conv2d(nf, nf, 3),
        nn.InstanceNorm2d(nf))


class _TResBlock(nn.Module):
    def __init__(self, nf):
        super().__init__()
        self.conv_block = _res_block_t(nf)

    def forward(self, x):
        return x + self.conv_block(x)


class _TCycleResnetG(nn.Module):
    """torch twin of CycleGAN ``Generator`` (same Sequential layout)."""

    def __init__(self, input_nc=1, output_nc=1, n_res=2, nf=8):
        super().__init__()
        f = nf
        layers = [nn.ReflectionPad2d(3), nn.Conv2d(input_nc, f, 7),
                  nn.InstanceNorm2d(f), nn.ReLU(True)]
        for _ in range(3):
            layers += [nn.Conv2d(f, f * 2, 3, stride=2, padding=1),
                       nn.InstanceNorm2d(f * 2), nn.ReLU(True)]
            f *= 2
        for _ in range(n_res):
            layers += [_TResBlock(f)]
        for _ in range(3):
            layers += [nn.ConvTranspose2d(f, f // 2, 3, stride=2, padding=1,
                                          output_padding=1),
                       nn.InstanceNorm2d(f // 2), nn.ReLU(True)]
            f //= 2
        layers += [nn.ReflectionPad2d(3), nn.Conv2d(nf, output_nc, 7), nn.Tanh()]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


def test_cyclegan_resnet_generator_conversion(rng):
    t_model = _TCycleResnetG(n_res=2, nf=8).eval()
    x = rng.randn(1, 32, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(t_model(_nchw(x)))
    params = cm.convert_cyclegan_resnet_generator(_sd(t_model), n_residual_blocks=2)
    model = ResnetGenerator(output_nc=1, n_residual_blocks=2, in_features=8)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


class _TCycleD(nn.Module):
    def __init__(self, input_nc=1):
        super().__init__()
        self.model = nn.Sequential(
            nn.Conv2d(input_nc, 64, 4, stride=2, padding=1), nn.LeakyReLU(0.2, True),
            nn.Conv2d(64, 128, 4, stride=2, padding=1), nn.InstanceNorm2d(128),
            nn.LeakyReLU(0.2, True),
            nn.Conv2d(128, 256, 4, stride=2, padding=1), nn.InstanceNorm2d(256),
            nn.LeakyReLU(0.2, True),
            nn.Conv2d(256, 512, 4, padding=1), nn.InstanceNorm2d(512),
            nn.LeakyReLU(0.2, True),
            nn.Conv2d(512, 1, 4, padding=1))

    def forward(self, x):
        h = self.model(x)
        return torch.nn.functional.avg_pool2d(h, h.size()[2:]).view(h.size()[0], -1)


def test_cyclegan_discriminator_conversion(rng):
    t_model = _TCycleD().eval()
    x = rng.randn(2, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        ref = t_model(_nchw(x)).numpy().reshape(-1)
    params = cm.convert_cyclegan_discriminator(_sd(t_model))
    model = PatchDiscriminator()
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def _t_global_layers(input_nc, output_nc, ngf, n_down, n_blocks, with_head=True):
    layers = [nn.ReflectionPad2d(3), nn.Conv2d(input_nc, ngf, 7),
              nn.InstanceNorm2d(ngf), nn.ReLU(True)]
    for i in range(n_down):
        m = 2 ** i
        layers += [nn.Conv2d(ngf * m, ngf * m * 2, 3, stride=2, padding=1),
                   nn.InstanceNorm2d(ngf * m * 2), nn.ReLU(True)]
    m = 2 ** n_down
    for _ in range(n_blocks):
        layers += [_TResBlock(ngf * m)]
    for i in range(n_down):
        m = 2 ** (n_down - i)
        layers += [nn.ConvTranspose2d(ngf * m, ngf * m // 2, 3, stride=2,
                                      padding=1, output_padding=1),
                   nn.InstanceNorm2d(ngf * m // 2), nn.ReLU(True)]
    if with_head:
        layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, output_nc, 7), nn.Tanh()]
    return layers


class _TGlobalG(nn.Module):
    def __init__(self, input_nc=1, output_nc=1, ngf=8, n_down=2, n_blocks=2):
        super().__init__()
        self.model = nn.Sequential(
            *_t_global_layers(input_nc, output_nc, ngf, n_down, n_blocks))

    def forward(self, x):
        return self.model(x)


def test_p2phd_global_generator_conversion(rng):
    t_model = _TGlobalG().eval()
    x = rng.randn(1, 32, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(t_model(_nchw(x)))
    params = cm.convert_global_generator(_sd(t_model), n_downsampling=2, n_blocks=2)
    model = GlobalGenerator(output_nc=1, ngf=8, n_downsampling=2, n_blocks=2)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


class _TLocalEnhancer(nn.Module):
    """torch twin of ``LocalEnhancer`` (trunk under ``model``, streams under
    ``model1_1``/``model1_2``)."""

    def __init__(self, input_nc=1, output_nc=1, ngf=4, n_down=2, n_blocks=2,
                 n_blocks_local=1):
        super().__init__()
        ngf_global = ngf * 2
        trunk = _t_global_layers(input_nc, output_nc, ngf_global, n_down,
                                 n_blocks, with_head=False)
        self.model = nn.Sequential(*trunk)
        self.model1_1 = nn.Sequential(
            nn.ReflectionPad2d(3), nn.Conv2d(input_nc, ngf, 7),
            nn.InstanceNorm2d(ngf), nn.ReLU(True),
            nn.Conv2d(ngf, ngf * 2, 3, stride=2, padding=1),
            nn.InstanceNorm2d(ngf * 2), nn.ReLU(True))
        ups = []
        for _ in range(n_blocks_local):
            ups += [_TResBlock(ngf * 2)]
        ups += [nn.ConvTranspose2d(ngf * 2, ngf, 3, stride=2, padding=1,
                                   output_padding=1),
                nn.InstanceNorm2d(ngf), nn.ReLU(True),
                nn.ReflectionPad2d(3), nn.Conv2d(ngf, output_nc, 7), nn.Tanh()]
        self.model1_2 = nn.Sequential(*ups)
        self.downsample = nn.AvgPool2d(3, stride=2, padding=[1, 1],
                                       count_include_pad=False)

    def forward(self, x):
        coarse = self.model(self.downsample(x))
        return self.model1_2(self.model1_1(x) + coarse)


def test_p2phd_local_enhancer_conversion(rng):
    t_model = _TLocalEnhancer().eval()
    x = rng.randn(1, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(t_model(_nchw(x)))
    params = cm.convert_local_enhancer(_sd(t_model), n_downsample_global=2,
                                       n_blocks_global=2, n_blocks_local=1)
    model = LocalEnhancer(output_nc=1, ngf=4, n_downsample_global=2,
                          n_blocks_global=2, n_local_enhancers=1, n_blocks_local=1)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


class _TNLayerD(nn.Module):
    def __init__(self, input_nc=2, ndf=8, n_layers=3):
        super().__init__()
        seqs = [[nn.Conv2d(input_nc, ndf, 4, stride=2, padding=2),
                 nn.LeakyReLU(0.2, True)]]
        nf = ndf
        for n in range(1, n_layers):
            nf_prev, nf = nf, min(nf * 2, 512)
            seqs += [[nn.Conv2d(nf_prev, nf, 4, stride=2, padding=2),
                      nn.InstanceNorm2d(nf), nn.LeakyReLU(0.2, True)]]
        nf_prev, nf = nf, min(nf * 2, 512)
        seqs += [[nn.Conv2d(nf_prev, nf, 4, stride=1, padding=2),
                  nn.InstanceNorm2d(nf), nn.LeakyReLU(0.2, True)]]
        seqs += [[nn.Conv2d(nf, 1, 4, stride=1, padding=2)]]
        self.seqs = seqs
        for n, s in enumerate(seqs):
            setattr(self, "model" + str(n), nn.Sequential(*s))

    def forward(self, x):
        res = [x]
        for n in range(len(self.seqs)):
            res.append(getattr(self, "model" + str(n))(res[-1]))
        return res[1:]


class _TMultiscaleD(nn.Module):
    def __init__(self, input_nc=2, ndf=8, n_layers=3, num_D=2):
        super().__init__()
        self.num_D, self.n_layers = num_D, n_layers
        for i in range(num_D):
            d = _TNLayerD(input_nc, ndf, n_layers)
            for j in range(n_layers + 2):
                setattr(self, f"scale{i}_layer{j}", getattr(d, "model" + str(j)))
        self.downsample = nn.AvgPool2d(3, stride=2, padding=[1, 1],
                                       count_include_pad=False)

    def forward(self, x):
        out = []
        inp = x
        for i in range(self.num_D):
            models = [getattr(self, f"scale{self.num_D - 1 - i}_layer{j}")
                      for j in range(self.n_layers + 2)]
            res = [inp]
            for m in models:
                res.append(m(res[-1]))
            out.append(res[1:])
            if i != self.num_D - 1:
                inp = self.downsample(inp)
        return out


def test_p2phd_multiscale_discriminator_conversion(rng):
    t_model = _TMultiscaleD().eval()
    x = rng.randn(1, 64, 64, 2).astype(np.float32)
    with torch.no_grad():
        refs = t_model(_nchw(x))
    params = cm.convert_multiscale_discriminator(_sd(t_model), num_d=2, n_layers=3)
    model = MultiscaleDiscriminator(ndf=8, n_layers=3, num_D=2, get_interm_feat=True)
    outs = model.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x))
    assert len(outs) == len(refs)
    for scale_o, scale_r in zip(outs, refs):
        for o, r in zip(scale_o, scale_r):
            np.testing.assert_allclose(np.asarray(o), _nhwc(r), rtol=2e-3, atol=2e-3)


class _TMSRB(nn.Module):
    def __init__(self, nf):
        super().__init__()
        def node(i, o, k, p):
            return nn.Sequential(nn.Conv2d(i, o, k, stride=1, padding=p), nn.ReLU(True))
        self.b00 = node(nf, nf, 3, 1)
        self.b01 = node(nf, nf, 5, 2)
        self.b10 = node(nf * 2, nf, 3, 1)
        self.b11 = node(nf * 2, nf, 5, 2)
        self.out = nn.Conv2d(nf * 2, nf, 1, 1)

    def forward(self, x):
        c1 = torch.cat((self.b00(x), self.b01(x)), dim=1)
        c2 = torch.cat((self.b10(c1), self.b11(c1)), dim=1)
        return self.out(c2)


class _TUNetHD(nn.Module):
    def __init__(self, input_nc=1, output_nc=1, n_res=2, nf=8):
        super().__init__()
        self.init_block = nn.Sequential(
            nn.ReflectionPad2d(3), nn.Conv2d(input_nc, nf, 7),
            nn.InstanceNorm2d(nf), nn.ReLU(True))
        enc = []
        f = nf
        for _ in range(3):
            enc.append(nn.Sequential(nn.Conv2d(f, f * 2, 7, stride=2, padding=3),
                                     nn.InstanceNorm2d(f * 2), nn.ReLU(True)))
            f *= 2
        self.encoder = nn.ModuleList(enc)
        self.res_block = nn.Sequential(*[_TMSRB(f) for _ in range(n_res)])
        dec = []
        for _ in range(3):
            dec.append(nn.Sequential(
                nn.ConvTranspose2d(f * 2, f // 2, 3, stride=2, padding=1,
                                   output_padding=1),
                nn.InstanceNorm2d(f // 2), nn.ReLU(True)))
            f //= 2
        self.decoder = nn.ModuleList(dec)
        self.output_layer = nn.Sequential(
            nn.ReflectionPad2d(3), nn.Conv2d(f, output_nc, 7), nn.Tanh())

    def forward(self, x):
        h = self.init_block(x)
        skips = []
        for layer in self.encoder:
            h = layer(h)
            skips.append(h)
        h = self.res_block(skips[-1])
        for i, layer in enumerate(self.decoder):
            h = layer(torch.cat((h, skips[2 - i]), dim=1))
        return self.output_layer(h)


def test_p2phd_unet_msrb_conversion(rng):
    t_model = _TUNetHD(n_res=2, nf=8).eval()
    x = rng.randn(1, 32, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(t_model(_nchw(x)))
    params = cm.convert_unet_generator_hd(_sd(t_model), n_residual_blocks=2)
    model = UNetGeneratorHD(output_nc=1, n_residual_blocks=2, in_features=8)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


class _TMultiAtrousConv(nn.Module):
    def __init__(self, ipc, opc, stride=1):
        super().__init__()
        def branch(r):
            return nn.Sequential(nn.Conv2d(ipc, opc, 3, stride, r, r),
                                 nn.InstanceNorm2d(opc), nn.ReLU())
        self.b0, self.b1 = branch(2), branch(4)
        self.b2, self.b3 = branch(6), branch(8)

    def forward(self, x):
        return self.b0(x) + self.b1(x) + self.b2(x) + self.b3(x)


class _TMultiAtrousTransposeConv(nn.Module):
    def __init__(self, ipc, opc, stride=2):
        super().__init__()
        bo = opc // 4
        def branch(r):
            return nn.Sequential(
                nn.ConvTranspose2d(ipc, bo, 3, stride=stride, padding=r,
                                   dilation=r, output_padding=1),
                nn.InstanceNorm2d(bo))
        self.b0, self.b1 = branch(2), branch(4)
        self.b2, self.b3 = branch(6), branch(8)
        self.relu = nn.ReLU()

    def forward(self, x):
        return self.relu(torch.cat(
            (self.b0(x), self.b1(x), self.b2(x), self.b3(x)), dim=1))


class _TSkipDecoderG(nn.Module):
    """torch twin of GeneratorUnet / GeneratorMultiscale(+variants)."""

    def __init__(self, kind, input_nc=1, output_nc=1, n_res=1, nf=8):
        super().__init__()
        self.init_block = nn.Sequential(
            nn.ReflectionPad2d(3), nn.Conv2d(input_nc, nf, 7),
            nn.InstanceNorm2d(nf), nn.ReLU(True))
        f = nf
        enc = []
        for _ in range(3):
            if kind == "unet":
                enc.append(nn.Sequential(nn.Conv2d(f, f * 2, 3, 2, 1),
                                         nn.InstanceNorm2d(f * 2), nn.ReLU(True)))
            else:
                enc.append(_TMultiAtrousConv(f, f * 2, stride=2))
            f *= 2
        self.encoder = nn.ModuleList(enc)
        res = []
        for _ in range(n_res):
            if kind == "bilinear":
                class _TResAtrous(nn.Module):
                    def __init__(s, nf):
                        super().__init__()
                        s.atrous = _TMultiAtrousConv(nf, nf, 1)
                        s.tail = nn.Sequential(nn.ReflectionPad2d(1),
                                               nn.Conv2d(nf, nf, 3),
                                               nn.InstanceNorm2d(nf))
                    def forward(s, x):
                        return x + s.tail(s.atrous(x))
                res.append(_TResAtrous(f))
            else:
                res.append(_TResBlock(f))
        self.res_block = nn.Sequential(*res)
        dec = []
        for _ in range(3):
            if kind == "bilinear":
                dec.append(nn.Sequential(
                    nn.Upsample(scale_factor=2, mode="bilinear"),
                    nn.Conv2d(f * 2, f // 2, 3, padding=1),
                    nn.InstanceNorm2d(f // 2), nn.ReLU(True)))
            elif kind == "atrous":
                dec.append(_TMultiAtrousTransposeConv(f * 2, f // 2, stride=2))
            else:
                dec.append(nn.Sequential(
                    nn.ConvTranspose2d(f * 2, f // 2, 3, 2, 1, output_padding=1),
                    nn.InstanceNorm2d(f // 2), nn.ReLU(True)))
            f //= 2
        self.decoder = nn.ModuleList(dec)
        self.output_layer = nn.Sequential(
            nn.ReflectionPad2d(3), nn.Conv2d(f, output_nc, 7), nn.Tanh())

    def forward(self, x):
        h = self.init_block(x)
        skips = []
        for layer in self.encoder:
            h = layer(h)
            skips.append(h)
        h = self.res_block(skips[-1])
        for i, layer in enumerate(self.decoder):
            h = layer(torch.cat((h, skips[2 - i]), dim=1))
        return self.output_layer(h)


@pytest.mark.parametrize("kind,gen_type", [
    ("unet", "unet_content"),
    ("atrous", "atrous_x"),       # dense_decoder=False -> atrous decoder
    ("bilinear", "bilinear_content"),
])
def test_cyclegan_variant_conversions(rng, kind, gen_type):
    import cistar_tpu.models.cyclegan as cgm

    # bilinear decoder in the reference uses torch Upsample align_corners=False
    t_model = _TSkipDecoderG(kind, n_res=1, nf=8).eval()
    x = rng.randn(1, 32, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(t_model(_nchw(x)))
    dense = kind == "unet"  # atrous kind uses atrous decoder
    params = cm.convert_cyclegan_generator(_sd(t_model), gen_type,
                                           n_residual_blocks=1,
                                           dense_decoder=False)
    from cistar_tpu.models.cyclegan import build_generator
    model = build_generator(gen_type, output_nc=1, in_features=8,
                            n_residual_blocks=1, dense_decoder=False)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-3, atol=3e-3)
