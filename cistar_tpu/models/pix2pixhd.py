"""pix2pixHD model zoo (generators, discriminators, encoders) — NHWC linen.

Parity targets (``p2pHD/models/networks.py``):
  * :class:`GlobalGenerator`            ↔ :195-223
  * :class:`LocalEnhancer`              ↔ :141-193 (coarse-to-fine)
  * :class:`AutoEncoder`                ↔ :227-273 (named stages for inversion)
  * :class:`MultiscaleGlobalGenerator`  ↔ :277-340 (3-branch pyramid; quirks
        reproduced: b2Feat/b3Feat wrap the SAME layer objects — shared
        weights — and define_G leaves this family on the BatchNorm default)
  * :class:`ResnetBlock`                ↔ :345-384 (reflect/replicate/zero pad)
  * :class:`Encoder` + instance-wise average pooling ↔ :386-422
  * :class:`MultiscaleDiscriminator`    ↔ :424-463
  * :class:`NLayerDiscriminator`        ↔ :466-515 (kw=4, padw=2, 512 cap)
  * :class:`FeatureEncoder`             ↔ :550-689 (pyramid branches share the
        first-layer weights, concat-fused strided downs)
  * :class:`TransferGenerator`          ↔ :692-713
  * :class:`WDiscriminator`             ↔ :742-779 (k4 s2 p1 critic,
        affine IN, optional flatten-to-scalar-mean)
  * :class:`UDAEncoder`/:class:`UDADecoder`/:class:`DomainFeatureDiscriminator`
                                        ↔ :783-925
  * :func:`define_g` / :func:`define_d` ↔ :28-66 (dispatch)

Norm handling: "instance" is torch's affine=False instance norm (no params);
"batch" has torch BN semantics — affine params initialized N(1, 0.02)/0
(matching ``weights_init``) plus EMA running statistics in the
``batch_stats`` collection for batch-composition-independent eval (the UDA
modules take a ``train`` flag; see :class:`NormLayer`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cistar_tpu.ops import nn as tnn
from cistar_tpu.ops.blocks import MSRB, Conv2d, ConvTranspose2d, ReflectConv2d


class NormLayer(nn.Module):
    """"instance" (param-free) or "batch" (affine, torch BN semantics).

    The batch kind keeps EMA running statistics in the ``batch_stats``
    collection exactly like ``torch.nn.BatchNorm2d`` (momentum 0.1, unbiased
    running variance), so (a) converted torch checkpoints carry their trained
    stats and (b) eval outputs are batch-composition-independent — pass
    ``use_running_average=True`` (the UDA eval path, ref
    ``networks.py:783-925``). Training callers apply with
    ``mutable=["batch_stats"]`` to collect the EMA update.
    """

    kind: str = "instance"
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        if self.kind == "instance":
            return tnn.instance_norm(x)
        if self.kind == "instance_affine":
            c = x.shape[-1]
            gamma = self.param("gamma", nn.initializers.normal(0.02, jnp.float32), (c,))
            beta = self.param("beta", nn.initializers.zeros, (c,))
            # torch weights_init sets BN gamma ~ N(1, 0.02); affine IN in the
            # reference (wDiscriminator) keeps torch's default init (ones).
            return tnn.instance_norm(x, gamma=gamma + 1.0, beta=beta)
        if self.kind == "batch":
            c = x.shape[-1]
            gamma = self.param("gamma", nn.initializers.normal(0.02, jnp.float32), (c,))
            beta = self.param("beta", nn.initializers.zeros, (c,))
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones((c,), jnp.float32))
            xf = x.astype(jnp.float32)
            if use_running_average:
                mean = ra_mean.value.reshape(1, 1, 1, c)
                var = ra_var.value.reshape(1, 1, 1, c)
            else:
                mean = jnp.mean(xf, axis=(0, 1, 2), keepdims=True)
                var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2),
                               keepdims=True)
                if not self.is_initializing() and \
                        self.is_mutable_collection("batch_stats"):
                    n = x.shape[0] * x.shape[1] * x.shape[2]
                    unbiased = var.reshape(c) * (n / max(n - 1, 1))
                    m = self.momentum
                    ra_mean.value = (1 - m) * ra_mean.value + m * mean.reshape(c)
                    ra_var.value = (1 - m) * ra_var.value + m * unbiased
            out = (xf - mean) / jnp.sqrt(var + 1e-5)
            return ((gamma + 1.0) * out + beta).astype(x.dtype)
        if self.kind == "none":
            return x
        raise ValueError(f"unknown norm {self.kind!r}")


def _norm(x, kind: str):
    if kind == "instance":
        return tnn.instance_norm(x)
    if kind == "none":
        return x
    raise ValueError("parameterized norms must go through NormLayer")


class ResnetBlock(nn.Module):
    """pix2pixHD resnet block: [pad, conv3x3, norm, relu, (dropout,) pad,
    conv3x3, norm] + skip."""

    features: int
    padding_type: str = "reflect"
    norm: str = "instance"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, train: bool = True):
        p = 1 if self.padding_type == "zero" else 0
        if self.padding_type == "reflect":
            h = ReflectConv2d(self.features, 3, name="conv1")(x)
        else:
            h = x if p else tnn.pad2d(x, 1, self.padding_type)
            h = Conv2d(self.features, 3, padding=p, name="conv1")(h)
        h = NormLayer(self.norm, name="norm1")(h, use_running_average=not train) \
            if self.norm != "instance" else tnn.instance_norm(h)
        h = tnn.relu(h)
        if self.use_dropout and not deterministic:
            h = tnn.dropout(h, 0.5, self.make_rng("dropout"), deterministic)
        if self.padding_type == "reflect":
            h2 = ReflectConv2d(self.features, 3, name="conv2")(h)
        else:
            h2 = h if p else tnn.pad2d(h, 1, self.padding_type)
            h2 = Conv2d(self.features, 3, padding=p, name="conv2")(h2)
        h2 = NormLayer(self.norm, name="norm2")(h2, use_running_average=not train) \
            if self.norm != "instance" else tnn.instance_norm(h2)
        return x + h2


class _C7S1(nn.Module):
    """ReflectionPad(3) → Conv7x7 → norm → ReLU (the ubiquitous stem)."""

    features: int
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = ReflectConv2d(self.features, 7, name="conv")(x)
        if self.norm != "none":
            h = NormLayer(self.norm, name="norm")(h, use_running_average=not train) \
                if self.norm != "instance" else tnn.instance_norm(h)
        return tnn.relu(h)


class _Down(nn.Module):
    features: int
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = Conv2d(self.features, 3, stride=2, padding=1, name="conv")(x)
        h = NormLayer(self.norm, name="norm")(h, use_running_average=not train) \
            if self.norm != "instance" else tnn.instance_norm(h)
        return tnn.relu(h)


class _Up(nn.Module):
    features: int
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = ConvTranspose2d(self.features, 3, stride=2, padding=1,
                            output_padding=1, name="convt")(x)
        h = NormLayer(self.norm, name="norm")(h, use_running_average=not train) \
            if self.norm != "instance" else tnn.instance_norm(h)
        return tnn.relu(h)


class _OutHead(nn.Module):
    output_nc: int

    @nn.compact
    def __call__(self, x):
        h = ReflectConv2d(self.output_nc, 7, name="conv")(x)
        return tnn.tanh(h)


class GlobalGeneratorTrunk(nn.Module):
    """GlobalGenerator without the final pad/conv/tanh head — the part the
    LocalEnhancer keeps (``networks.py:149-151`` drops the last 3 layers)."""

    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    norm: str = "instance"
    padding_type: str = "reflect"

    @nn.compact
    def __call__(self, x):
        h = _C7S1(self.ngf, self.norm, name="stem")(x)
        for i in range(self.n_downsampling):
            h = _Down(self.ngf * 2 ** (i + 1), self.norm, name=f"down_{i}")(h)
        mult = 2 ** self.n_downsampling
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * mult, self.padding_type, self.norm,
                            name=f"res_{i}")(h)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = _Up(self.ngf * mult // 2, self.norm, name=f"up_{i}")(h)
        return h


class GlobalGenerator(nn.Module):
    """c7s1-ngf → n× down → n_blocks resnet → n× up → c7s1-out + Tanh."""

    output_nc: int = 1
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    norm: str = "instance"
    padding_type: str = "reflect"

    @nn.compact
    def __call__(self, x):
        h = GlobalGeneratorTrunk(self.ngf, self.n_downsampling, self.n_blocks,
                                 self.norm, self.padding_type, name="trunk")(x)
        return _OutHead(self.output_nc, name="head")(h)


class LocalEnhancer(nn.Module):
    """Coarse-to-fine generator (``networks.py:141-193``).

    The trunk (GlobalGenerator minus head, at ngf·2ⁿ features) runs on the
    AvgPool-downsampled input; each enhancer adds a fine-scale stream whose
    downsampled features are summed with the coarser output before local
    residual blocks and upsampling. The last enhancer carries the output head.
    """

    output_nc: int = 1
    ngf: int = 32
    n_downsample_global: int = 3
    n_blocks_global: int = 9
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    norm: str = "instance"
    padding_type: str = "reflect"

    @nn.compact
    def __call__(self, x):
        # input pyramid: [full, /2, /4, ...]
        pyramid = [x]
        for _ in range(self.n_local_enhancers):
            pyramid.append(tnn.avg_pool2d(pyramid[-1], 3, 2, padding=1,
                                          count_include_pad=False))

        ngf_global = self.ngf * (2 ** self.n_local_enhancers)
        h = GlobalGeneratorTrunk(ngf_global, self.n_downsample_global,
                                 self.n_blocks_global, self.norm,
                                 self.padding_type, name="global")(pyramid[-1])

        for n in range(1, self.n_local_enhancers + 1):
            ngf_n = self.ngf * (2 ** (self.n_local_enhancers - n))
            inp = pyramid[self.n_local_enhancers - n]
            d = _C7S1(ngf_n, self.norm, name=f"enh{n}_stem")(inp)
            d = _Down(ngf_n * 2, self.norm, name=f"enh{n}_down")(d)
            h = d + h
            for i in range(self.n_blocks_local):
                h = ResnetBlock(ngf_n * 2, self.padding_type, self.norm,
                                name=f"enh{n}_res_{i}")(h)
            h = _Up(ngf_n, self.norm, name=f"enh{n}_up")(h)
            if n == self.n_local_enhancers:
                h = _OutHead(self.output_nc, name="head")(h)
        return h


class AutoEncoder(nn.Module):
    """GlobalGenerator split into named init/encoder/resblock/decoder/output
    stages (GAN-inversion convenience, ``networks.py:227-273``)."""

    output_nc: int = 1
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    norm: str = "instance"
    padding_type: str = "reflect"

    def setup(self):
        self.init_layer = _C7S1(self.ngf, self.norm, name="init_layer")
        self.encoder_blocks = [
            _Down(self.ngf * 2 ** (i + 1), self.norm, name=f"encoder_{i}")
            for i in range(self.n_downsampling)]
        mult = 2 ** self.n_downsampling
        self.resblocks = [
            ResnetBlock(self.ngf * mult, self.padding_type, self.norm,
                        name=f"resblock_{i}") for i in range(self.n_blocks)]
        self.decoder_blocks = [
            _Up(self.ngf * 2 ** (self.n_downsampling - i) // 2, self.norm,
                name=f"decoder_{i}") for i in range(self.n_downsampling)]
        self.output_layer = _OutHead(self.output_nc, name="output_layer")

    def encode(self, x):
        h = self.init_layer(x)
        for blk in self.encoder_blocks:
            h = blk(h)
        return h

    def decode(self, h):
        for blk in self.resblocks:
            h = blk(h)
        for blk in self.decoder_blocks:
            h = blk(h)
        return self.output_layer(h)

    def __call__(self, x):
        return self.decode(self.encode(x))


class MultiscaleGlobalGenerator(nn.Module):
    """3-branch input pyramid fused by strided convs (``networks.py:277-340``).

    b1: stem + stride-2 conv on the full image; b2/b3: the SAME stem weights
    applied to 1×/2× maxpooled inputs (the reference aliases the module); the
    concatenated features are fused by two strided convs, then the standard
    resnet/upsample tail.
    """

    output_nc: int = 1
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "instance"
    padding_type: str = "reflect"

    @nn.compact
    def __call__(self, x, train: bool = True):
        ngf = self.ngf
        b1 = _C7S1(ngf, self.norm, name="b1_stem")(x, train)
        b1 = _Down(ngf, self.norm, name="b1_down")(b1, train)

        shared_stem = _C7S1(ngf, self.norm, name="feat_stem")  # shared b2/b3
        b2_in = tnn.max_pool2d(x, 3, 2, padding=1)
        b3_in = tnn.max_pool2d(b2_in, 3, 2, padding=1)
        b2 = shared_stem(b2_in, train)
        b3 = shared_stem(b3_in, train)

        b12 = jnp.concatenate([b1, b2], axis=-1)        # 2·ngf at /2
        b12 = _Down(ngf * 4, self.norm, name="connect_b12")(b12, train)
        b123 = jnp.concatenate([b12, b3], axis=-1)      # 5·ngf at /4
        h = _Down(ngf * 8, self.norm, name="connect_b23")(b123, train)

        n_down = 3
        for i in range(self.n_blocks):
            h = ResnetBlock(ngf * 8, self.padding_type, self.norm,
                            name=f"res_{i}")(h, train=train)
        for i in range(n_down):
            mult = 2 ** (n_down - i)
            h = _Up(ngf * mult // 2, self.norm, name=f"up_{i}")(h, train)
        return _OutHead(self.output_nc, name="head")(h)


class Encoder(nn.Module):
    """Instance-feature encoder (``networks.py:386-422``): down/up conv stack
    to ``feat_num`` channels, then instance-wise average pooling."""

    output_nc: int = 3   # feat_num
    ngf: int = 32
    n_downsampling: int = 4
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, inst=None, max_instances: int = 64):
        h = _C7S1(self.ngf, self.norm, name="stem")(x)
        for i in range(self.n_downsampling):
            h = _Down(self.ngf * 2 ** (i + 1), self.norm, name=f"down_{i}")(h)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = _Up(self.ngf * mult // 2, self.norm, name=f"up_{i}")(h)
        out = _OutHead(self.output_nc, name="head")(h)
        if inst is None:
            return out
        return instance_average_pool(out, inst, max_instances)


def instance_average_pool(features: jnp.ndarray, inst: jnp.ndarray,
                          max_instances: int = 64) -> jnp.ndarray:
    """Replace each feature with its mean over same-instance pixels, per image.

    TPU-native re-design of the reference's quadruple Python loop
    (``networks.py:412-422``): instance ids are compacted with a sized
    ``jnp.unique`` and the means computed with one-hot matmuls (MXU-friendly,
    jit-compatible, O(HW·K)).

    Args:
      features: (N, H, W, C) encoder output.
      inst: (N, H, W) or (N, H, W, 1) integer instance ids.
      max_instances: static bound K on distinct ids per image.
    """
    import jax

    if inst.ndim == 4:
        inst = inst[..., 0]
    inst = inst.astype(jnp.int32)

    def per_image(feat, ids):
        h, w, c = feat.shape
        flat_ids = ids.reshape(-1)
        flat = feat.reshape(-1, c).astype(jnp.float32)
        uniq = jnp.unique(flat_ids, size=max_instances, fill_value=jnp.int32(-2))
        onehot = (flat_ids[:, None] == uniq[None, :]).astype(jnp.float32)  # (HW, K)
        sums = onehot.T @ flat                          # (K, C)
        counts = jnp.sum(onehot, axis=0)[:, None]       # (K, 1)
        means = sums / jnp.maximum(counts, 1.0)
        pooled = onehot @ means                          # (HW, C)
        # pixels whose id wasn't captured (over K ids) keep their value
        covered = jnp.sum(onehot, axis=1, keepdims=True) > 0
        return jnp.where(covered, pooled, flat).reshape(h, w, c).astype(feat.dtype)

    return jax.vmap(per_image)(features, inst)


class NLayerDiscriminator(nn.Module):
    """70×70-style PatchGAN (``networks.py:466-515``): kw=4, padw=2, channel
    cap 512; returns per-layer features when ``get_interm_feat``."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    use_sigmoid: bool = False
    get_interm_feat: bool = False

    @nn.compact
    def __call__(self, x):
        feats = []
        h = Conv2d(self.ndf, 4, stride=2, padding=2, name="layer0_conv")(x)
        h = tnn.leaky_relu(h, 0.2)
        feats.append(h)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = Conv2d(nf, 4, stride=2, padding=2, name=f"layer{n}_conv")(h)
            h = tnn.leaky_relu(_norm_any(self, h, f"layer{n}_norm"), 0.2)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = Conv2d(nf, 4, stride=1, padding=2, name=f"layer{self.n_layers}_conv")(h)
        h = tnn.leaky_relu(_norm_any(self, h, f"layer{self.n_layers}_norm"), 0.2)
        feats.append(h)
        h = Conv2d(1, 4, stride=1, padding=2,
                   name=f"layer{self.n_layers + 1}_conv")(h)
        if self.use_sigmoid:
            h = tnn.sigmoid(h)
        feats.append(h)
        return feats if self.get_interm_feat else h


def _norm_any(module: nn.Module, h, name: str):
    if module.norm == "instance":
        return tnn.instance_norm(h)
    return NormLayer(module.norm, name=name)(h)


class MultiscaleDiscriminator(nn.Module):
    """num_D PatchGANs over an AvgPool image pyramid (``networks.py:424-463``).

    Returns a list (finest-last ordering matches the reference: scale index
    num_D-1-i is applied to the i-th downsampled input) of per-scale outputs;
    each entry is itself a list of intermediate features when
    ``get_interm_feat`` else a one-element list.
    """

    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    use_sigmoid: bool = False
    num_D: int = 3
    get_interm_feat: bool = False

    @nn.compact
    def __call__(self, x):
        results = []
        inp = x
        for i in range(self.num_D):
            scale = self.num_D - 1 - i
            d = NLayerDiscriminator(self.ndf, self.n_layers, self.norm,
                                    self.use_sigmoid, self.get_interm_feat,
                                    name=f"scale_{scale}")
            out = d(inp)
            results.append(out if self.get_interm_feat else [out])
            if i != self.num_D - 1:
                inp = tnn.avg_pool2d(inp, 3, 2, padding=1, count_include_pad=False)
        return results


class FeatureEncoder(nn.Module):
    """Pyramid feature encoder (``networks.py:550-689``), multi-scale form.

    n_scale branches apply the SHARED c7s1 stem to progressively maxpooled
    inputs; strided convs fuse branch i's features with the running result
    (concat) and downsample; remaining downs run plain. Output channels:
    ngf·2^n_downsampling at 1/2^n_downsampling resolution.
    """

    ngf: int = 32
    n_downsampling: int = 4
    n_scale: int = 3
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        stem = _C7S1(self.ngf, self.norm, name="stem")  # shared across branches
        branches = []
        inp = x
        for i in range(self.n_scale):
            branches.append(stem(inp))
            if i != self.n_scale - 1:
                inp = tnn.max_pool2d(inp, 3, 2, padding=1)

        result = None
        for i in range(self.n_scale):
            mult = 2 ** i
            if i == 0:
                h = branches[0]
            else:
                h = jnp.concatenate([result, branches[i]], axis=-1)
            result = _Down(self.ngf * mult * 2, self.norm, name=f"down_{i}")(h)
        for i in range(self.n_downsampling - self.n_scale):
            mult = 2 ** (self.n_scale + i)
            result = _Down(self.ngf * mult * 2, self.norm,
                           name=f"down_{self.n_scale + i}")(result)
        return result


class TransferGenerator(nn.Module):
    """Resblocks + upsampling decoder half, pairs with FeatureEncoder
    (``networks.py:692-713``)."""

    output_nc: int = 1
    n_blocks: int = 9
    ngf: int = 32
    n_upsampling: int = 4
    norm: str = "instance"
    padding_type: str = "reflect"

    @nn.compact
    def __call__(self, h):
        mult = 2 ** self.n_upsampling
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * mult, self.padding_type, self.norm,
                            name=f"res_{i}")(h)
        for i in range(self.n_upsampling):
            mult = 2 ** (self.n_upsampling - i)
            h = _Up(self.ngf * mult // 2, self.norm, name=f"up_{i}")(h)
        return _OutHead(self.output_nc, name="head")(h)


class WDiscriminator(nn.Module):
    """Wasserstein critic (``networks.py:742-779``): (k4,s2,p1) conv + affine
    IN + LeakyReLU ×(n_layer-1), then a 1-channel conv; optional global
    flatten-mean to a scalar."""

    ngf: int = 16
    n_layer: int = 5
    activate: bool = False
    flatten: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):  # train: interface parity
        h = x
        nf = self.ngf
        for i in range(self.n_layer - 1):
            feats = self.ngf if i == 0 else min(nf * 2, 512)
            h = Conv2d(feats, 4, stride=2, padding=1, use_bias=False,
                       name=f"conv_{i}")(h)
            h = NormLayer("instance_affine", name=f"norm_{i}")(h)
            h = tnn.leaky_relu(h, 0.2)
            nf = feats
        h = Conv2d(1, 4, stride=2, padding=1, use_bias=False, name="conv_out")(h)
        if self.activate:
            h = tnn.leaky_relu(h, 0.2)
        if self.flatten:
            return jnp.mean(h.astype(jnp.float32))
        return h


class UDAEncoder(nn.Module):
    """UDA shared encoder (``networks.py:783-838``): c7s1 stem (instance
    norm) → down convs with batch norm → resblocks; optional linear head."""

    size: int = 512
    down_conv: int = 3
    ngf: int = 16
    n_resblocks: int = 3
    linear: bool = False
    max_ch: int = 512

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = _C7S1(self.ngf, "instance", name="stem")(x)
        nf = self.ngf
        for i in range(self.down_conv):
            nf = min(nf * 2, self.max_ch)
            h = Conv2d(nf, 3, stride=2, padding=1, name=f"down_{i}_conv")(h)
            h = NormLayer("batch", name=f"down_{i}_bn")(h, use_running_average=not train)
            h = tnn.relu(h)
        for i in range(self.n_resblocks):
            h = ResnetBlock(nf, "reflect", "instance", name=f"res_{i}")(h)
        if self.linear:
            flat = h.reshape(h.shape[0], -1)
            w = self.param("linear_w", nn.initializers.normal(0.02),
                           (flat.shape[-1], self.max_ch))
            b = self.param("linear_b", nn.initializers.zeros, (self.max_ch,))
            return flat @ w + b
        return h


class UDADecoder(nn.Module):
    """UDA per-domain decoder (``networks.py:843-898``): resblocks (+IN+ReLU)
    → k4s2p1 transpose convs halving channels (floor 4) → c7s1 + tanh."""

    output_nc: int = 1
    size: int = 512
    f_size: int = 64
    down_conv: int = 3
    n_resblocks: int = 3

    @nn.compact
    def __call__(self, h, train: bool = True):
        nc = h.shape[-1]
        for i in range(self.n_resblocks):
            h = ResnetBlock(nc, "reflect", "instance", name=f"res_{i}")(h)
            h = tnn.instance_norm(h)
            h = tnn.relu(h)
        for i in range(self.down_conv):
            nc = max(nc // 2, 4)
            h = ConvTranspose2d(nc, 4, stride=2, padding=1, name=f"up_{i}_convt")(h)
            h = NormLayer("batch", name=f"up_{i}_bn")(h, use_running_average=not train)
            h = tnn.relu(h)
        return _OutHead(self.output_nc, name="head")(h)


class DomainFeatureDiscriminator(nn.Module):
    """Feature-space domain classifier (``networks.py:905-925``): 4 conv+BN+
    LeakyReLU stages with halving channels (floor ``min_nf``), then 1-channel
    conv + BN + sigmoid."""

    min_nf: int = 8

    @nn.compact
    def __call__(self, x, train: bool = True):
        nf_in = x.shape[-1]
        nf = max(nf_in // 2, self.min_nf)
        h = x
        for i in range(4):
            h = Conv2d(nf, 3, stride=1, padding=1, name=f"conv_{i}")(h)
            h = NormLayer("batch", name=f"bn_{i}")(h, use_running_average=not train)
            h = tnn.leaky_relu(h, 0.2)
            nf = max(nf // 2, self.min_nf)
        h = Conv2d(1, 3, stride=1, padding=1, name="conv_out")(h)
        h = NormLayer("batch", name="bn_out")(h, use_running_average=not train)
        return tnn.sigmoid(h)


# --------------------------------------------------------------------------- #
# factories (dispatch parity with define_G / define_D, networks.py:28-66)
# --------------------------------------------------------------------------- #
def define_g(net_g: str, output_nc: int, ngf: int, n_downsample_global: int = 3,
             n_blocks_global: int = 9, n_local_enhancers: int = 1,
             n_blocks_local: int = 3, norm: str = "instance") -> nn.Module:
    if net_g == "global":
        return GlobalGenerator(output_nc, ngf, n_downsample_global,
                               n_blocks_global, norm)
    if net_g == "local":
        return LocalEnhancer(output_nc, ngf, n_downsample_global, n_blocks_global,
                             n_local_enhancers, n_blocks_local, norm)
    if net_g == "encoder":
        return Encoder(output_nc, ngf, n_downsample_global, norm)
    if net_g == "multiscale":
        # reference quirk: define_G never passes norm_layer to this family,
        # so it runs with the BatchNorm DEFAULT regardless of opt.norm
        # (networks.py:40 vs :278) — reproduced here
        return MultiscaleGlobalGenerator(output_nc, ngf, n_blocks_global,
                                         "batch")
    if net_g == "autoencoder":
        return AutoEncoder(output_nc, ngf, n_downsample_global, n_blocks_global, norm)
    if net_g == "UNet":
        return UNetGeneratorHD(output_nc, n_blocks_global, ngf)
    raise ValueError(f"generator {net_g!r} not implemented")


def define_d(ndf: int, n_layers_d: int, norm: str = "instance",
             use_sigmoid: bool = False, num_d: int = 2,
             get_interm_feat: bool = True) -> nn.Module:
    return MultiscaleDiscriminator(ndf, n_layers_d, norm, use_sigmoid,
                                   num_d, get_interm_feat)


class UNetGeneratorHD(nn.Module):
    """p2pHD ``UNetGenerator`` (``networks.py:947-1026``): the trained
    ``r2l_MSRB*`` config. U-Net with 7x7/stride-2 down blocks, MSRB residual
    stages, transpose-conv up blocks with skip concat."""

    output_nc: int = 1
    n_residual_blocks: int = 3
    in_features: int = 64

    @nn.compact
    def __call__(self, x):
        f = self.in_features
        h = _C7S1(f, "instance", name="init_block")(x)
        skips = []
        feats = f
        for i in range(3):
            feats *= 2
            h = Conv2d(feats, 7, stride=2, padding=3, name=f"down_{i}_conv")(h)
            h = tnn.relu(tnn.instance_norm(h))
            skips.append(h)
        for i in range(self.n_residual_blocks):
            h = MSRB(feats, name=f"msrb_{i}")(h)
        for i in range(3):
            feats //= 2
            skip = skips[2 - i]
            h = jnp.concatenate([h, skip], axis=-1)
            h = ConvTranspose2d(feats, 3, stride=2, padding=1, output_padding=1,
                                name=f"up_{i}_convt")(h)
            h = tnn.relu(tnn.instance_norm(h))
        return _OutHead(self.output_nc, name="output_layer")(h)
