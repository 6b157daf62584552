"""Generate seeded torch VGG state dicts in the reference's on-disk formats.

The container has no network egress, so the real pretrained files
(``vgg_conv.pth`` from bethgelab for IST, torchvision ``vgg16``/``vgg19``
features for the perceptual losses) cannot be downloaded. This tool writes
*seeded random* state dicts in exactly those formats so the entire
load→convert→compute path (``apps/convert_checkpoint.py``,
``models/vgg.py:torch_vgg_conv_to_params`` /
``torchvision_vgg_features_to_params``) can be exercised end-to-end
in-container; drop in the real files later and nothing else changes.

Formats
  vgg19-conv      bethgelab layout: ``conv1_1.weight`` (OIHW) / ``.bias``
                  (what ``IST/main.py:30-32`` loads)
  vgg16-features  torchvision layout: ``features.0.weight`` … (what
                  ``CycleGAN/models.py:186`` / ``p2pHD/networks.py:520`` slice)
  vgg19-features  torchvision vgg19 layout (p2pHD VGGLoss backbone)

Usage:
  python tools/make_vgg_weights.py --family vgg19-conv --out /tmp/vgg_conv.pth
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _he(rng, shape):
    import numpy as np

    fan_in = shape[1] * shape[2] * shape[3]
    return rng.normal(0, float((2.0 / fan_in) ** 0.5), shape).astype("float32")


def make_state_dict(family: str, seed: int = 7):
    import numpy as np
    import torch

    from cistar_tpu.models.vgg import (VGG16_CONVS, VGG16_FORWARD_SEQ,
                                       VGG19_CONVS, VGG19_FORWARD_SEQ)

    rng = np.random.RandomState(seed)
    sd = {}
    if family == "vgg19-conv":
        for name, cin, cout in VGG19_CONVS:
            sd[f"{name}.weight"] = torch.from_numpy(_he(rng, (cout, cin, 3, 3)))
            sd[f"{name}.bias"] = torch.zeros(cout)
        return sd
    convs = VGG19_CONVS if family == "vgg19-features" else VGG16_CONVS
    seq = VGG19_FORWARD_SEQ if family == "vgg19-features" else VGG16_FORWARD_SEQ
    idx, it = 0, iter(convs)
    for name in seq:
        if name.startswith("pool"):
            idx += 1
        else:
            _, cin, cout = next(it)
            sd[f"features.{idx}.weight"] = torch.from_numpy(
                _he(rng, (cout, cin, 3, 3)))
            sd[f"features.{idx}.bias"] = torch.zeros(cout)
            idx += 2
    return sd


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--family", required=True,
                   choices=["vgg19-conv", "vgg16-features", "vgg19-features"])
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args(argv)

    import torch

    sd = make_state_dict(args.family, args.seed)
    torch.save(sd, args.out)
    n = sum(int(v.numel()) for v in sd.values())
    print(f"wrote {args.out}: {len(sd)} tensors, {n / 1e6:.1f}M params "
          f"({args.family}, seed {args.seed})")


if __name__ == "__main__":
    main()
