"""Golden outputs from the ACTUAL reference IST (Gatys) code (CPU subprocess).

Runs the reference pipeline end-to-end — ``ImageTransform`` preprocessing
(``IST/data/image_transform.py:5-31``), the hand-built VGG-19
(``model/meta_arch/vgg.py``), and the full ``optimize_new`` → ``optimize``
torch-L-BFGS loop (``model/engine/utils.py:17-45``) — with a SEEDED
Kaiming-initialized VGG (no pretrained ``vgg_conv.pth`` exists in the
zero-egress container; plain normal init would explode through 16
unnormalized conv layers). Records the shared VGG state dict, the
transformed inputs, the optimized image, and the post-processed RGB output.

Run:  python tools/ref_golden_ist.py --out /tmp/g.npz [--size 256] [--iters 300]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import refbridge  # noqa: E402

refbridge.install_torchvision_stub()
refbridge.install_yacs_stub()
sys.path.insert(0, refbridge.REF + "/IST")

import numpy as np  # noqa: E402
import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

refbridge.patch_cuda_to_cpu()

from config import get_cfg_defaults  # noqa: E402
from data.image_transform import ImageTransform  # noqa: E402
from model.engine.utils import optimize_new, transform_image  # noqa: E402
from model.meta_arch import GramMSELoss, StyleTransfer  # noqa: E402
from model.meta_arch.vgg import VGG  # noqa: E402


def seeded_vgg(cfg, seed=0):
    torch.manual_seed(seed)
    vgg = VGG(cfg)
    for name in sorted(vgg.layers):
        m = vgg.layers[name]
        if isinstance(m, nn.Conv2d):
            nn.init.kaiming_normal_(m.weight, nonlinearity="relu")
            nn.init.zeros_(m.bias)
    for p in vgg.parameters():
        p.requires_grad = False
    return vgg


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=300)
    args = p.parse_args(argv)

    cfg = get_cfg_defaults()
    cfg.MODEL.DEVICE = "cpu"
    cfg.DATA.IMG_SIZE = args.size
    cfg.LOSS.MAX_ITER = args.iters

    vgg = seeded_vgg(cfg)
    # bundle wiring = IST/main.py:23-43 (get_model)
    loss_layers = cfg.LOSS.STYLE_LAYERS + cfg.LOSS.CONTENT_LAYERS
    loss_functions = [GramMSELoss()] * len(cfg.LOSS.STYLE_LAYERS) + \
        [nn.MSELoss()] * len(cfg.LOSS.CONTENT_LAYERS)
    loss_weights = cfg.LOSS.STYLE_WEIGHTS + cfg.LOSS.CONTENT_WEIGHTS
    model = StyleTransfer(vgg, loss_layers, loss_functions, loss_weights)

    # do_transfer_style flow (engine/transfer_style.py:11-44)
    tr = ImageTransform(cfg.DATA.IMG_SIZE, cfg.DATA.IMAGENET_MEAN)
    content_pil = refbridge.synthetic_radar(args.size).convert("RGB")
    style_pil = refbridge.synthetic_lidar(args.size).convert("RGB")
    device = torch.device("cpu")
    content = transform_image(tr, content_pil, device)
    style = transform_image(tr, style_pil, device)
    optimized = torch.autograd.Variable(content.data.clone(),
                                        requires_grad=True)
    optimized = optimize_new(model, content, style, optimized, cfg,
                             cfg.LOSS.MAX_ITER)
    out_pil = tr.post_preparation(optimized.data[0].cpu().squeeze())

    refbridge.save_golden(
        args.out,
        state_dicts={"vgg": vgg.state_dict()},
        arrays={"content": content.detach(), "style": style.detach(),
                "optimized": optimized.detach(),
                "out_rgb": np.asarray(out_pil),
                "content_rgb": np.asarray(content_pil),
                "style_rgb": np.asarray(style_pil)},
    )
    print(f"golden written: {args.out} "
          f"(optimized std {float(optimized.std()):.3f})")


if __name__ == "__main__":
    main()
