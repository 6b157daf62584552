"""Flax linen building blocks wrapping the NHWC torch-parity primitives.

These are the thin, named parameter holders the model zoo composes. Weight
init matches the reference's ``weights_init_normal`` / ``weights_init``
(conv weights ~ N(0, 0.02); ``CycleGAN/utils.py:126-133``,
``p2pHD/models/networks.py:11-17``). Compute dtype follows the input array
(cast at model entry by the caller's dtype policy); parameters stay fp32.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cistar_tpu.ops import nn as tnn

default_kernel_init = nn.initializers.normal(0.02)


class Conv2d(nn.Module):
    """torch ``nn.Conv2d`` analog (NHWC/HWIO)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        cin = x.shape[-1]
        w = self.param("w", self.kernel_init, (k, k, cin // self.groups, self.features))
        b = self.param("b", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return tnn.conv2d(x, w, b, stride=self.stride, padding=self.padding,
                          dilation=self.dilation, groups=self.groups)


class ReflectConv2d(nn.Module):
    """Stride-1 reflect-padded "same" conv via the border-fixup fast path
    (``ops.nn.conv2d_reflect``) — equivalent to ReflectionPad2d(p) + Conv2d(k)
    without materializing the padded activation."""

    features: int
    kernel: int = 3
    use_bias: bool = True
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        cin = x.shape[-1]
        w = self.param("w", self.kernel_init, (k, k, cin, self.features))
        b = self.param("b", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return tnn.conv2d_reflect(x, w, b)


class ConvTranspose2d(nn.Module):
    """torch ``nn.ConvTranspose2d`` analog (weight HWIO, I=in, O=out)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        cin = x.shape[-1]
        w = self.param("w", self.kernel_init, (k, k, cin, self.features))
        b = self.param("b", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return tnn.conv_transpose2d(x, w, b, stride=self.stride, padding=self.padding,
                                    output_padding=self.output_padding,
                                    dilation=self.dilation)


class InstanceNorm(nn.Module):
    """Parameter-free instance norm (torch default affine=False)."""

    eps: float = 1e-5

    def __call__(self, x):
        return tnn.instance_norm(x, eps=self.eps)


class BatchNorm(nn.Module):
    """BatchNorm2d analog: per-batch statistics in training, affine params.

    The UDA modules use BatchNorm (``p2pHD/models/networks.py:783-925``); we
    compute batch statistics on the fly (the reference trains with
    ``track_running_stats`` default True but we follow the functional style:
    train-mode stats; running averages are maintained by the train loop if
    needed).
    """

    use_running_average: bool = False
    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        return nn.BatchNorm(
            use_running_average=nn.merge_param(
                "use_running_average", self.use_running_average, use_running_average),
            momentum=self.momentum, epsilon=self.eps,
            dtype=x.dtype, axis_name=None)(x)


class ConvBlock(nn.Module):
    """conv → (norm) → (act), with optional pre-padding.

    The ubiquitous unit of the reference generators: e.g. ReflectionPad(3) →
    Conv 7x7 → InstanceNorm → ReLU (``CycleGAN/models.py:31-34``).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    pad_mode: Optional[str] = None     # "reflect"/"replicate"/"zero" pre-pad
    pre_pad: int = 0
    norm: Optional[str] = "instance"   # "instance" | "batch" | None
    act: Optional[str] = "relu"        # "relu" | "leaky" | "tanh" | None
    leaky_slope: float = 0.2

    @nn.compact
    def __call__(self, x):
        if self.pre_pad:
            x = tnn.pad2d(x, self.pre_pad, self.pad_mode or "reflect")
        x = Conv2d(self.features, self.kernel, self.stride, self.padding,
                   self.dilation, name="conv")(x)
        if self.norm == "instance":
            x = tnn.instance_norm(x)
        elif self.norm == "batch":
            x = BatchNorm(name="bn")(x)
        if self.act == "relu":
            x = tnn.relu(x)
        elif self.act == "leaky":
            x = tnn.leaky_relu(x, self.leaky_slope)
        elif self.act == "tanh":
            x = tnn.tanh(x)
        return x


class ResidualBlock(nn.Module):
    """CycleGAN residual block (``CycleGAN/models.py:7-22``):

    ReflectionPad(1) → Conv3x3 → IN → ReLU → ReflectionPad(1) → Conv3x3 → IN,
    plus skip.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        h = ReflectConv2d(self.features, 3, name="conv1")(x)
        h = tnn.instance_norm(h)
        h = tnn.relu(h)
        h = ReflectConv2d(self.features, 3, name="conv2")(h)
        h = tnn.instance_norm(h)
        return x + h


class MultiAtrousConv(nn.Module):
    """4 parallel dilated conv branches, summed (``CycleGAN/models.py:329-359``).

    Each branch: Conv3x3(dilation=r, padding=r) → IN → ReLU; branch outputs
    are summed. XLA-native efficiency note: the four branches share the same
    input and output shape, so XLA fuses the IN/ReLU epilogues and the adds;
    the convs stay separate MXU calls (different dilations).
    """

    features: int
    rate_list: Tuple[int, ...] = (2, 4, 6, 8)
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out = None
        for i, r in enumerate(self.rate_list):
            h = Conv2d(self.features, 3, self.stride, padding=r, dilation=r,
                       name=f"b{i}_conv")(x)
            h = tnn.instance_norm(h)
            h = tnn.relu(h)
            out = h if out is None else out + h
        return out


class MultiAtrousTransposeConv(nn.Module):
    """4 dilated transpose-conv branches producing C/4 each, concatenated then
    ReLU'd (``CycleGAN/models.py:361-391``). Branch: ConvT3x3(dilation=r,
    padding=r, output_padding=1) → IN."""

    features: int
    rate_list: Tuple[int, ...] = (2, 4, 6, 8)
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        branch_f = self.features // 4
        outs = []
        for i, r in enumerate(self.rate_list):
            h = ConvTranspose2d(branch_f, 3, self.stride, padding=r,
                                output_padding=1, dilation=r, name=f"b{i}_convt")(x)
            h = tnn.instance_norm(h)
            outs.append(h)
        return tnn.relu(jnp.concatenate(outs, axis=-1))


class ResidualBlockAtrous(nn.Module):
    """MultiAtrousConv + reflect-pad conv residual (``CycleGAN/models.py:533-545``)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = MultiAtrousConv(self.features, name="atrous")(x)
        h = ReflectConv2d(self.features, 3, name="conv")(h)
        h = tnn.instance_norm(h)
        return x + h


class MSRB(nn.Module):
    """Multi-Scale Residual Block (``p2pHD/models/networks.py:1028-1055``).

    Two stages of parallel 3x3 / 5x5 conv+ReLU branches (each producing
    ``features`` channels), concatenated between stages, fused by a 1x1 conv.
    Note: the reference's forward has NO residual add — we match it.
    """

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        n, s = self.features, self.stride
        b00 = tnn.relu(Conv2d(n, 3, s, padding=1, name="b00_conv")(x))
        b01 = tnn.relu(Conv2d(n, 5, s, padding=2, name="b01_conv")(x))
        cat1 = jnp.concatenate([b00, b01], axis=-1)
        b10 = tnn.relu(Conv2d(n, 3, s, padding=1, name="b10_conv")(cat1))
        b11 = tnn.relu(Conv2d(n, 5, s, padding=2, name="b11_conv")(cat1))
        cat2 = jnp.concatenate([b10, b11], axis=-1)
        return Conv2d(n, 1, s, name="out_conv")(cat2)
