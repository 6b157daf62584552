"""VGG feature extractors (pure-functional, NHWC).

Three roles in the reference, all served by this module:

  * The Gatys IST backbone: a hand-built VGG-19 conv stack walking a forward
    sequence and returning named ReLU/pool activations
    (``IST/model/meta_arch/vgg.py:5-58``). Weights come from the bethgelab
    ``vgg_conv.pth`` (Caffe-trained, BGR input, pixel range 0..255).
  * ``VGGLoss``'s torchvision vgg19 5-slice features
    (``p2pHD/models/networks.py:518-548``): slices end at relu1_1, relu2_1,
    relu3_1, relu4_1, relu5_1 of the torchvision layout.
  * CycleGAN's ``Vgg16`` relu4_3 slice content loss (``CycleGAN/models.py:184-217``).

Design: a VGG here is just ``(params, topology)``; ``extract_features`` is a
pure function suitable for jit/grad — there is no module state. Params are a
flat dict ``{layer_name: {"w": HWIO, "b": (C,)}}`` so importing torch
checkpoints is a key-preserving transpose.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from cistar_tpu.ops import nn as tnn

Params = Dict[str, Dict[str, jnp.ndarray]]

# VGG-19 conv topology: (name, in_channels, out_channels); 3x3 convs, pad 1.
VGG19_CONVS: List[Tuple[str, int, int]] = [
    ("conv1_1", 3, 64), ("conv1_2", 64, 64),
    ("conv2_1", 64, 128), ("conv2_2", 128, 128),
    ("conv3_1", 128, 256), ("conv3_2", 256, 256),
    ("conv3_3", 256, 256), ("conv3_4", 256, 256),
    ("conv4_1", 256, 512), ("conv4_2", 512, 512),
    ("conv4_3", 512, 512), ("conv4_4", 512, 512),
    ("conv5_1", 512, 512), ("conv5_2", 512, 512),
    ("conv5_3", 512, 512), ("conv5_4", 512, 512),
]

VGG19_FORWARD_SEQ: List[str] = [
    "conv1_1", "conv1_2", "pool_1",
    "conv2_1", "conv2_2", "pool_2",
    "conv3_1", "conv3_2", "conv3_3", "conv3_4", "pool_3",
    "conv4_1", "conv4_2", "conv4_3", "conv4_4", "pool_4",
    "conv5_1", "conv5_2", "conv5_3", "conv5_4", "pool_5",
]

# VGG-16 conv topology (for CycleGAN content loss / perceptual losses).
VGG16_CONVS: List[Tuple[str, int, int]] = [
    ("conv1_1", 3, 64), ("conv1_2", 64, 64),
    ("conv2_1", 64, 128), ("conv2_2", 128, 128),
    ("conv3_1", 128, 256), ("conv3_2", 256, 256), ("conv3_3", 256, 256),
    ("conv4_1", 256, 512), ("conv4_2", 512, 512), ("conv4_3", 512, 512),
    ("conv5_1", 512, 512), ("conv5_2", 512, 512), ("conv5_3", 512, 512),
]

VGG16_FORWARD_SEQ: List[str] = [
    "conv1_1", "conv1_2", "pool_1",
    "conv2_1", "conv2_2", "pool_2",
    "conv3_1", "conv3_2", "conv3_3", "pool_3",
    "conv4_1", "conv4_2", "conv4_3", "pool_4",
    "conv5_1", "conv5_2", "conv5_3", "pool_5",
]


def extract_features(
    params: Params,
    x: jnp.ndarray,
    out_keys: Sequence[str],
    forward_seq: Sequence[str] = VGG19_FORWARD_SEQ,
    compute_dtype=None,
    frozen: bool = False,
) -> List[jnp.ndarray]:
    """Run the VGG conv stack, returning the requested named activations.

    Matches ``VGG.forward`` (``IST/model/meta_arch/vgg.py:28-58``): walk the
    forward sequence, ReLU after every conv, record ``convX_Y``/``reluX_Y``/
    ``pool_N`` activations, stop as soon as every requested key is produced
    (the early stop is a TPU addition — it prunes dead layers at trace time).

    ``frozen=True`` routes convs through :func:`cistar_tpu.ops.nn.conv2d_frozen`
    (custom VJP; image gradient as a plain forward conv) — use whenever the
    extractor is differentiated through but not trained, which is every
    reference use of VGG (Gatys, VGGLoss, contentLoss).
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    wanted = set(out_keys)
    acts: Dict[str, jnp.ndarray] = {}
    produced = 0
    for name in forward_seq:
        if name.startswith("pool"):
            x = tnn.max_pool2d(x, 2, 2)
            acts[name] = x
        else:
            p = params[name]
            if frozen:
                x = tnn.conv2d_frozen(x, p["w"], p["b"], padding=1)
            else:
                x = tnn.conv2d(x, p["w"], p["b"], stride=1, padding=1)
            acts[name] = x
            x = tnn.relu(x)
            acts["relu" + name[len("conv"):]] = x
        produced += int(name in wanted) + int(
            not name.startswith("pool") and ("relu" + name[len("conv"):]) in wanted
        )
        if produced >= len(wanted) and wanted.issubset(acts):
            break
    return [acts[k] for k in out_keys]


def init_vgg_params(
    convs: Sequence[Tuple[str, int, int]] = VGG19_CONVS,
    seed: int = 0,
    dtype=jnp.float32,
) -> Params:
    """Random (He) init — used only by tests; real weights come from conversion."""
    rng = np.random.RandomState(seed)
    params: Params = {}
    for name, cin, cout in convs:
        std = float(np.sqrt(2.0 / (cin * 9)))
        params[name] = {
            "w": jnp.asarray(rng.normal(0, std, (3, 3, cin, cout)), dtype),
            "b": jnp.zeros((cout,), dtype),
        }
    return params


def torch_vgg_conv_to_params(state_dict: Dict[str, np.ndarray]) -> Params:
    """Convert the bethgelab ``vgg_conv.pth`` state dict to our layout.

    The reference loads it into a module whose children are named
    ``conv1_1 … conv5_4`` (``IST/main.py:30-32``), so keys look like
    ``conv1_1.weight`` (OIHW) / ``conv1_1.bias``. We transpose OIHW → HWIO.
    """
    params: Params = {}
    for key, val in state_dict.items():
        if not key.endswith(".weight") and not key.endswith(".bias"):
            continue
        layer, kind = key.rsplit(".", 1)
        arr = np.asarray(val)
        entry = params.setdefault(layer, {})
        if kind == "weight":
            entry["w"] = jnp.asarray(arr.transpose(2, 3, 1, 0))  # OIHW -> HWIO
        else:
            entry["b"] = jnp.asarray(arr)
    return params


def torchvision_vgg_features_to_params(
    state_dict: Dict[str, np.ndarray], convs: Sequence[Tuple[str, int, int]]
) -> Params:
    """Convert a torchvision ``vgg*.features`` state dict (numeric keys).

    torchvision modules are a flat Sequential (``features.0.weight`` …); conv
    indices are recovered by walking the conv/pool topology in order.
    """
    conv_indices = []
    idx = 0
    seq = VGG19_FORWARD_SEQ if len(convs) == 16 else VGG16_FORWARD_SEQ
    for name in seq:
        if name.startswith("pool"):
            idx += 1  # MaxPool2d
        else:
            conv_indices.append((idx, name))
            idx += 2  # Conv2d + ReLU
    params: Params = {}
    for i, name in conv_indices:
        for prefix in (f"features.{i}", str(i)):
            wkey, bkey = f"{prefix}.weight", f"{prefix}.bias"
            if wkey in state_dict:
                params[name] = {
                    "w": jnp.asarray(np.asarray(state_dict[wkey]).transpose(2, 3, 1, 0)),
                    "b": jnp.asarray(np.asarray(state_dict[bkey])),
                }
                break
    return params


# Slice endpoints for p2pHD's VGGLoss (torchvision vgg19 feature slices
# [0:2), [2:7), [7:12), [12:21), [21:30) — i.e. relu1_1, relu2_1, relu3_1,
# relu4_1, relu5_1; ``p2pHD/models/networks.py:518-539``).
VGG19_LOSS_KEYS = ["relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1"]
VGG19_LOSS_WEIGHTS = [1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0]

# CycleGAN Vgg16 slice [:23] ends at relu4_3 (``CycleGAN/models.py:190``).
VGG16_CONTENT_KEY = "relu4_3"
