"""Model-specific PyTorch → cistar_tpu checkpoint converters.

Maps the reference's saved ``state_dict`` layouts onto our named linen param
trees (NHWC/HWIO), so trained reference checkpoints run on TPU unchanged:

  * CycleGAN generators/discriminator: Sequential/ModuleList-numbered keys
    (``CycleGAN/models.py``; saved by ``CycleGAN/train.py:281-290``).
  * pix2pixHD GlobalGenerator / LocalEnhancer / UNetGenerator /
    MultiscaleDiscriminator (``p2pHD/models/networks.py``; saved via
    ``base_model.py:42-47``).
  * the bethgelab/torchvision VGGs (see ``models.vgg``).

Mechanics: each converter declares, per torch module prefix, the ordered list
of (our_param_path, kind) the prefix's conv weights map to; weights are
transposed by kind (conv OIHW→HWIO, conv-transpose (I,O,kh,kw)→HWIO, linear
(out,in)→(in,out)). Within a prefix torch's numeric ordering equals
construction order.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from cistar_tpu.core.torch_import import conv_transpose_w, conv_w, linear_w

Kind = str  # "conv" | "convT" | "linear"
SD = Dict[str, np.ndarray]


def _set(tree: Dict[str, Any], path: str, w: np.ndarray, b: np.ndarray | None,
         kind: Kind) -> None:
    node = tree
    for p in path.split("/"):
        node = node.setdefault(p, {})
    if kind == "conv":
        node["w"] = conv_w(w)
    elif kind == "convT":
        node["w"] = conv_transpose_w(w)
    elif kind == "linear":
        node["w"] = linear_w(w)
    else:
        raise ValueError(kind)
    if b is not None:
        node["b"] = np.asarray(b)


def _collect(sd: SD, prefix: str) -> List[Tuple[Tuple, str]]:
    """All weight keys under ``prefix``, sorted by numeric path components."""
    out = []
    plen = len(prefix) + 1 if prefix else 0
    for key in sd:
        if prefix and not key.startswith(prefix + "."):
            continue
        if not key.endswith(".weight"):
            continue
        rest = key[plen:-len(".weight")]
        sort_key = tuple(int(p) if p.isdigit() else p for p in rest.split("."))
        out.append((sort_key, key[: -len(".weight")]))
    return sorted(out)


def _convert_by_map(sd: SD, prefix_map: Sequence[Tuple[str, Sequence[Tuple[str, Kind]]]]
                    ) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for prefix, targets in prefix_map:
        entries = _collect(sd, prefix)
        # Instance norms are affine=False (no weights); only convs appear.
        if len(entries) != len(targets):
            raise ValueError(
                f"prefix {prefix!r}: found {len(entries)} conv weights "
                f"({[e[1] for e in entries]}), expected {len(targets)} "
                f"({[t[0] for t in targets]})")
        for (_, base), (path, kind) in zip(entries, targets):
            w = sd[base + ".weight"]
            b = sd.get(base + ".bias")
            _set(params, path, w, b, kind)
    return params


# --------------------------------------------------------------------------- #
# CycleGAN
# --------------------------------------------------------------------------- #
def convert_cyclegan_resnet_generator(sd: SD, n_residual_blocks: int = 6
                                      ) -> Dict[str, Any]:
    """torch ``Generator`` (one flat Sequential ``model``)."""
    targets: List[Tuple[str, Kind]] = [("init_conv", "conv")]
    targets += [(f"down_{i}", "conv") for i in range(3)]
    for i in range(n_residual_blocks):
        targets += [(f"res_{i}/conv1", "conv"), (f"res_{i}/conv2", "conv")]
    targets += [(f"up_{i}", "convT") for i in range(3)]
    targets += [("out_conv", "conv")]
    return _convert_by_map(sd, [("model", targets)])


def _skip_decoder_maps(enc_kind: str, dec_kind: str, res_kind: str,
                       n_res: int, n_down: int = 3):
    """Prefix maps shared by GeneratorUnet / Multiscale variants."""
    maps: List[Tuple[str, Sequence[Tuple[str, Kind]]]] = [
        ("init_block", [("init_conv", "conv")]),
    ]
    for i in range(n_down):
        if enc_kind == "plain":
            maps.append((f"encoder.{i}", [(f"down_{i}/conv", "conv")]))
        else:  # atrous: 4 branches, each conv
            maps.append((f"encoder.{i}",
                         [(f"down_{i}/b{j}_conv", "conv") for j in range(4)]))
    for i in range(n_res):
        if res_kind == "plain":
            maps.append((f"res_block.{i}",
                         [(f"res_{i}/conv1", "conv"), (f"res_{i}/conv2", "conv")]))
        else:  # atrous residual: MultiAtrousConv(4 convs) + plain conv
            maps.append((f"res_block.{i}",
                         [(f"res_{i}/atrous/b{j}_conv", "conv") for j in range(4)]
                         + [(f"res_{i}/conv", "conv")]))
    for i in range(n_down):
        if dec_kind == "plain":
            maps.append((f"decoder.{i}", [(f"up_{i}/convt", "convT")]))
        elif dec_kind == "atrous":
            maps.append((f"decoder.{i}",
                         [(f"up_{i}/b{j}_convt", "convT") for j in range(4)]))
        else:  # bilinear: upsample + conv
            maps.append((f"decoder.{i}", [(f"up_{i}/conv", "conv")]))
    maps.append(("output_layer", [("out_conv", "conv")]))
    return maps


def convert_cyclegan_generator(sd: SD, gen_type: str, n_residual_blocks: int = 6,
                               dense_decoder: bool = True) -> Dict[str, Any]:
    """Dispatch by the reference CLI's ``gen_type`` prefixes."""
    if gen_type.startswith("p2p"):
        return convert_cyclegan_resnet_generator(sd, n_residual_blocks)
    if gen_type.startswith("unet"):
        maps = _skip_decoder_maps("plain", "plain", "plain", n_residual_blocks)
    elif gen_type.startswith("bilinear"):
        maps = _skip_decoder_maps("atrous", "bilinear", "atrous", n_residual_blocks)
    elif gen_type.startswith("atrous"):
        dec = "plain" if dense_decoder else "atrous"
        maps = _skip_decoder_maps("atrous", dec, "plain", n_residual_blocks)
    else:
        raise ValueError(gen_type)
    return _convert_by_map(sd, maps)


def convert_cyclegan_discriminator(sd: SD) -> Dict[str, Any]:
    targets = [(f"conv{i}", "conv") for i in range(5)]
    return _convert_by_map(sd, [("model", targets)])


# --------------------------------------------------------------------------- #
# pix2pixHD
# --------------------------------------------------------------------------- #
def _global_trunk_targets(prefix: str, n_down: int, n_blocks: int
                          ) -> List[Tuple[str, Kind]]:
    t: List[Tuple[str, Kind]] = [(f"{prefix}/stem/conv", "conv")]
    t += [(f"{prefix}/down_{i}/conv", "conv") for i in range(n_down)]
    for i in range(n_blocks):
        t += [(f"{prefix}/res_{i}/conv1", "conv"), (f"{prefix}/res_{i}/conv2", "conv")]
    t += [(f"{prefix}/up_{i}/convt", "convT") for i in range(n_down)]
    return t


def convert_global_generator(sd: SD, n_downsampling: int = 3, n_blocks: int = 9
                             ) -> Dict[str, Any]:
    """``GlobalGenerator`` — flat Sequential ``model`` incl. the output head."""
    targets = _global_trunk_targets("trunk", n_downsampling, n_blocks)
    targets += [("head/conv", "conv")]
    return _convert_by_map(sd, [("model", targets)])


def convert_local_enhancer(sd: SD, n_downsample_global: int = 3,
                           n_blocks_global: int = 9, n_local_enhancers: int = 1,
                           n_blocks_local: int = 3) -> Dict[str, Any]:
    """``LocalEnhancer``: trunk under ``model`` (head stripped), enhancer
    streams under ``model{n}_1`` / ``model{n}_2``."""
    maps = [("model", _global_trunk_targets("global", n_downsample_global,
                                            n_blocks_global))]
    for n in range(1, n_local_enhancers + 1):
        maps.append((f"model{n}_1",
                     [(f"enh{n}_stem/conv", "conv"), (f"enh{n}_down/conv", "conv")]))
        up_targets: List[Tuple[str, Kind]] = []
        for i in range(n_blocks_local):
            up_targets += [(f"enh{n}_res_{i}/conv1", "conv"),
                           (f"enh{n}_res_{i}/conv2", "conv")]
        up_targets += [(f"enh{n}_up/convt", "convT")]
        if n == n_local_enhancers:
            up_targets += [("head/conv", "conv")]
        maps.append((f"model{n}_2", up_targets))
    return _convert_by_map(sd, maps)


def convert_unet_generator_hd(sd: SD, n_residual_blocks: int = 3) -> Dict[str, Any]:
    """p2pHD ``UNetGenerator`` (the trained r2l_MSRB config)."""
    maps: List[Tuple[str, Sequence[Tuple[str, Kind]]]] = [
        ("init_block", [("init_block/conv", "conv")]),
    ]
    for i in range(3):
        maps.append((f"encoder.{i}", [(f"down_{i}_conv", "conv")]))
    for i in range(n_residual_blocks):
        maps.append((f"res_block.{i}",
                     [(f"msrb_{i}/b00_conv", "conv"), (f"msrb_{i}/b01_conv", "conv"),
                      (f"msrb_{i}/b10_conv", "conv"), (f"msrb_{i}/b11_conv", "conv"),
                      (f"msrb_{i}/out_conv", "conv")]))
    for i in range(3):
        maps.append((f"decoder.{i}", [(f"up_{i}_convt", "convT")]))
    maps.append(("output_layer", [("output_layer/conv", "conv")]))
    return _convert_by_map(sd, maps)


def convert_multiscale_discriminator(sd: SD, num_d: int = 2, n_layers: int = 3,
                                     get_interm_feat: bool = True) -> Dict[str, Any]:
    """``MultiscaleDiscriminator``: per-scale PatchGANs saved as
    ``scale{i}_layer{j}.*`` (interm-feat mode) or ``layer{i}.*``."""
    params: Dict[str, Any] = {}
    for i in range(num_d):
        targets = [(f"scale_{i}/layer{j}_conv", "conv") for j in range(n_layers + 2)]
        if get_interm_feat:
            maps = [(f"scale{i}_layer{j}", [targets[j]]) for j in range(n_layers + 2)]
        else:
            maps = [(f"layer{i}", targets)]
        params.update(_convert_by_map(sd, maps))  # each scale has a unique key
    return params


def convert_p2phd_generator(sd: SD, net_g: str, **kw) -> Dict[str, Any]:
    if net_g == "global":
        return convert_global_generator(sd, kw.get("n_downsample_global", 3),
                                        kw.get("n_blocks_global", 9))
    if net_g == "local":
        return convert_local_enhancer(sd, kw.get("n_downsample_global", 3),
                                      kw.get("n_blocks_global", 9),
                                      kw.get("n_local_enhancers", 1),
                                      kw.get("n_blocks_local", 3))
    if net_g == "UNet":
        return convert_unet_generator_hd(sd, kw.get("n_blocks_global", 3))
    raise NotImplementedError(f"converter for netG={net_g!r}")


def convert_feature_encoder(numbered_sd: Dict[str, Dict[str, np.ndarray]],
                            n_downsampling: int = 4, n_scale: int = 3
                            ) -> Dict[str, Any]:
    """``FeatureEncoder``'s bespoke save format (``networks.py:616-631``): a
    dict ``{str(i): sub_state_dict}`` — branches first (each Sequential wraps
    the SHARED first_layer, so every branch sub-dict holds identical stem
    weights), then the down_conv stages. We take the stem from branch 0 and
    map each down_conv to ``down_{i}``."""
    params: Dict[str, Any] = {}
    branch0 = numbered_sd["0"]
    entries = _collect(branch0, "")
    if len(entries) != 1:
        raise ValueError(f"branch 0 should hold exactly the stem conv, got "
                         f"{[e[1] for e in entries]}")
    base = entries[0][1]
    _set(params, "stem/conv", branch0[base + ".weight"],
         branch0.get(base + ".bias"), "conv")
    for i in range(n_downsampling):
        sub = numbered_sd[str(n_scale + i)]
        entries = _collect(sub, "")
        if len(entries) != 1:
            raise ValueError(f"down_conv {i}: expected 1 conv, got {len(entries)}")
        base = entries[0][1]
        _set(params, f"down_{i}/conv", sub[base + ".weight"],
             sub.get(base + ".bias"), "conv")
    return params
