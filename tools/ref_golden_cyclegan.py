"""Golden outputs from the ACTUAL reference CycleGAN code (CPU subprocess).

Reproduces the ``CycleGAN/test.py:136-155`` flow — ``fake_B = G_A2B(A)``,
``fake_A = G_B2A(B)``, ``recover_B = G_A2B(Normalize(0.5,0.5)(fake_A))`` —
with seeded randomly-initialized generators (no pretrained weights exist in
the container) on the reference's own dataset transform
(Grayscale → ToTensor → Normalize(0.5,0.5), ``CycleGAN/test.py:115-121``).

Run:  python tools/ref_golden_cyclegan.py --out /tmp/golden_cyclegan.npz \
          [--size 256] [--gen_type p2p|atrous_dense|unet]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import refbridge  # noqa: E402

refbridge.install_torchvision_stub()
sys.path.insert(0, refbridge.REF + "/CycleGAN")

import numpy as np  # noqa: E402
import torch  # noqa: E402

refbridge.patch_cuda_to_cpu()

import models as ref_models  # noqa: E402  (CycleGAN/models.py)
from torchvision import transforms  # noqa: E402  (the stub)


def build_pair(gen_type: str):
    # dispatch mirrors CycleGAN/test.py:79-93 (in_features=16 throughout)
    if gen_type == "p2p":
        mk = lambda: ref_models.Generator(1, 1, in_features=16)  # noqa: E731
    elif gen_type == "atrous_dense":
        mk = lambda: ref_models.GeneratorMultiscaleDenseDecoder(  # noqa: E731
            1, 1, in_features=16)
    elif gen_type == "unet":
        mk = lambda: ref_models.GeneratorUnet(1, 1, in_features=16)  # noqa: E731
    else:
        raise ValueError(gen_type)
    torch.manual_seed(0)
    netG_A2B = mk()
    torch.manual_seed(1)
    netG_B2A = mk()
    return netG_A2B, netG_B2A


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--gen_type", default="p2p",
                   choices=["p2p", "atrous_dense", "unet"])
    args = p.parse_args(argv)

    netG_A2B, netG_B2A = build_pair(args.gen_type)
    netG_A2B.eval()
    netG_B2A.eval()

    prep = transforms.Compose([transforms.Grayscale(), transforms.ToTensor(),
                               transforms.Normalize(0.5, 0.5)])
    real_A = prep(refbridge.synthetic_radar(args.size)).unsqueeze(0)
    real_B = prep(refbridge.synthetic_lidar(args.size)).unsqueeze(0)

    with torch.no_grad():
        fake_B = netG_A2B(real_A)
        fake_A = netG_B2A(real_B)
        fake_norm = transforms.Compose([transforms.Normalize(0.5, 0.5)])
        recover_B = netG_A2B(fake_norm(fake_A))

    refbridge.save_golden(
        args.out,
        state_dicts={"G_A2B": netG_A2B.state_dict(),
                     "G_B2A": netG_B2A.state_dict()},
        arrays={"real_A": real_A, "real_B": real_B, "fake_B": fake_B,
                "fake_A": fake_A, "recover_B": recover_B,
                "gen_type": np.array(args.gen_type)},
    )
    print(f"golden written: {args.out} "
          f"(fake_B mean {float(fake_B.mean()):+.4f}, "
          f"std {float(fake_B.std()):.4f})")


if __name__ == "__main__":
    main()
