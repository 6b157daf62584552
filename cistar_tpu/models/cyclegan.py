"""CycleGAN model zoo — all five generator variants + the discriminator.

Parity targets (``CycleGAN/models.py``):
  * :class:`ResnetGenerator`            ↔ ``Generator``       (:24-67, "p2p")
  * :class:`UnetGenerator`              ↔ ``GeneratorUnet``   (:100-181, "unet")
  * :class:`MultiscaleGenerator`        ↔ ``GeneratorMultiscale`` (:222-298, "atrous")
  * :class:`MultiscaleDenseDecoderGenerator` ↔ ``GeneratorMultiscaleDenseDecoder``
                                          (:300-325, "atrous" + dense_decoder)
  * :class:`MultiscaleBilinearGenerator`↔ ``GeneratorMultiscaleBilinear``
                                          (:547-624, default "bilinear_content")
  * :class:`PatchDiscriminator`         ↔ ``Discriminator``   (:69-97)

All NHWC; trained configs use ``in_features=16`` (``CycleGAN/train.py:75-89``).
The generator dispatch-by-prefix rule of the reference CLI is reproduced by
:func:`build_generator`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cistar_tpu.ops import nn as tnn
from cistar_tpu.ops.blocks import (
    Conv2d,
    ConvTranspose2d,
    MultiAtrousConv,
    MultiAtrousTransposeConv,
    ReflectConv2d,
    ResidualBlock,
    ResidualBlockAtrous,
)


class ResnetGenerator(nn.Module):
    """c7s1 → 3× stride-2 down → N residual blocks → 3× transpose up → c7s1+Tanh."""

    output_nc: int = 1
    n_residual_blocks: int = 6
    in_features: int = 64

    @nn.compact
    def __call__(self, x):
        f = self.in_features
        h = ReflectConv2d(f, 7, name="init_conv")(x)
        h = tnn.relu(tnn.instance_norm(h))
        feats = f
        for i in range(3):
            feats *= 2
            h = Conv2d(feats, 3, stride=2, padding=1, name=f"down_{i}")(h)
            h = tnn.relu(tnn.instance_norm(h))
        for i in range(self.n_residual_blocks):
            h = ResidualBlock(feats, name=f"res_{i}")(h)
        for i in range(3):
            feats //= 2
            h = ConvTranspose2d(feats, 3, stride=2, padding=1, output_padding=1,
                                name=f"up_{i}")(h)
            h = tnn.relu(tnn.instance_norm(h))
        h = ReflectConv2d(self.output_nc, 7, name="out_conv")(h)
        return tnn.tanh(h)


class _SkipDecoderBase(nn.Module):
    """Shared encoder/res/decoder-with-skip-concat scaffold.

    The U-Net-ish forward pattern shared by GeneratorUnet / Multiscale*
    (``CycleGAN/models.py:163-181``): encoder outputs are concatenated into
    the decoder inputs (2×-width decoder convs).
    """

    output_nc: int = 1
    n_residual_blocks: int = 6
    in_features: int = 64
    down_sample: int = 3

    def encoder_block(self, i, feats):  # pragma: no cover - overridden
        raise NotImplementedError

    def decoder_block(self, i, feats):  # pragma: no cover - overridden
        raise NotImplementedError

    def res_block(self, i, feats):
        return ResidualBlock(feats, name=f"res_{i}")

    @nn.compact
    def __call__(self, x):
        f = self.in_features
        h = ReflectConv2d(f, 7, name="init_conv")(x)
        h = tnn.relu(tnn.instance_norm(h))

        skips = []
        feats = f
        for i in range(self.down_sample):
            feats *= 2
            h = self.encoder_block(i, feats)(h)
            skips.append(h)
        for i in range(self.n_residual_blocks):
            h = self.res_block(i, feats)(h)
        for i in range(self.down_sample):
            feats //= 2
            skip = skips[self.down_sample - 1 - i]
            h = jnp.concatenate([h, skip], axis=-1)
            h = self.decoder_block(i, feats)(h)
        h = ReflectConv2d(self.output_nc, 7, name="out_conv")(h)
        return tnn.tanh(h)


class _DownBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = Conv2d(self.features, 3, stride=2, padding=1, name="conv")(x)
        return tnn.relu(tnn.instance_norm(h))


class _UpBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = ConvTranspose2d(self.features, 3, stride=2, padding=1,
                            output_padding=1, name="convt")(x)
        return tnn.relu(tnn.instance_norm(h))


class _BilinearUpBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = tnn.upsample_bilinear(x, 2)
        h = Conv2d(self.features, 3, padding=1, name="conv")(h)
        return tnn.relu(tnn.instance_norm(h))


class UnetGenerator(_SkipDecoderBase):
    """``GeneratorUnet``: plain strided-conv encoder, transpose-conv decoder."""

    def encoder_block(self, i, feats):
        return _DownBlock(feats, name=f"down_{i}")

    def decoder_block(self, i, feats):
        return _UpBlock(feats, name=f"up_{i}")


class MultiscaleGenerator(_SkipDecoderBase):
    """``GeneratorMultiscale``: atrous-branch encoder + atrous transpose decoder."""

    def encoder_block(self, i, feats):
        return MultiAtrousConv(feats, stride=2, name=f"down_{i}")

    def decoder_block(self, i, feats):
        return MultiAtrousTransposeConv(feats, stride=2, name=f"up_{i}")


class MultiscaleDenseDecoderGenerator(MultiscaleGenerator):
    """``GeneratorMultiscaleDenseDecoder``: atrous encoder, plain ConvT decoder."""

    def decoder_block(self, i, feats):
        return _UpBlock(feats, name=f"up_{i}")


class MultiscaleBilinearGenerator(_SkipDecoderBase):
    """``GeneratorMultiscaleBilinear`` — the CLI default ``bilinear_content``:

    atrous encoder, atrous residual blocks, bilinear-upsample+conv decoder.
    """

    def encoder_block(self, i, feats):
        return MultiAtrousConv(feats, stride=2, name=f"down_{i}")

    def res_block(self, i, feats):
        return ResidualBlockAtrous(feats, name=f"res_{i}")

    def decoder_block(self, i, feats):
        return _BilinearUpBlock(feats, name=f"up_{i}")


class PatchDiscriminator(nn.Module):
    """PatchGAN + global-average-pool head (``CycleGAN/models.py:69-97``).

    4x4 convs: 64(s2) → 128(s2)+IN → 256(s2)+IN → 512(s1)+IN, LeakyReLU(0.2),
    then 1-channel 4x4 conv and a global average pool to one score per image.
    """

    @nn.compact
    def __call__(self, x):
        h = Conv2d(64, 4, stride=2, padding=1, name="conv0")(x)
        h = tnn.leaky_relu(h, 0.2)
        h = Conv2d(128, 4, stride=2, padding=1, name="conv1")(h)
        h = tnn.leaky_relu(tnn.instance_norm(h), 0.2)
        h = Conv2d(256, 4, stride=2, padding=1, name="conv2")(h)
        h = tnn.leaky_relu(tnn.instance_norm(h), 0.2)
        h = Conv2d(512, 4, stride=1, padding=1, name="conv3")(h)
        h = tnn.leaky_relu(tnn.instance_norm(h), 0.2)
        h = Conv2d(1, 4, stride=1, padding=1, name="conv4")(h)
        return tnn.global_avg_pool(h).reshape(x.shape[0])


def build_generator(gen_type: str, output_nc: int = 1, in_features: int = 16,
                    n_residual_blocks: int = 6, dense_decoder: bool = True) -> nn.Module:
    """Reference CLI dispatch (``CycleGAN/train.py:74-89``): prefix match on
    ``gen_type``: p2p* / bilinear* / atrous* (± dense decoder) / unet*."""
    if gen_type.startswith("p2p"):
        return ResnetGenerator(output_nc, n_residual_blocks, in_features)
    if gen_type.startswith("bilinear"):
        return MultiscaleBilinearGenerator(output_nc, n_residual_blocks, in_features)
    if gen_type.startswith("atrous"):
        cls = MultiscaleDenseDecoderGenerator if dense_decoder else MultiscaleGenerator
        return cls(output_nc, n_residual_blocks, in_features)
    if gen_type.startswith("unet"):
        return UnetGenerator(output_nc, n_residual_blocks, in_features)
    raise ValueError(f"unknown gen_type {gen_type!r}")
