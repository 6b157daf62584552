"""Convert reference PyTorch checkpoints to cistar_tpu ``.npz`` params.

Covers the reference's saved formats (SURVEY.md §5 checkpoint/resume):
CycleGAN ``{epoch}_netG_A2B.pth`` etc., pix2pixHD ``{epoch}_net_G.pth`` /
``net_D.pth``, and the bethgelab ``vgg_conv.pth`` / torchvision VGG features.

Usage:
  python -m cistar_tpu.apps.convert_checkpoint --family cyclegan-g \
      --gen_type p2p --in_pth netG_A2B.pth --out netG_A2B.npz
  python -m cistar_tpu.apps.convert_checkpoint --family p2phd-g --netG UNet \
      --n_blocks_global 3 --in_pth latest_net_G.pth --out latest_net_G.npz
  python -m cistar_tpu.apps.convert_checkpoint --family vgg19-conv \
      --in_pth vgg_conv.pth --out vgg_conv.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--family", required=True,
                   choices=["cyclegan-g", "cyclegan-d", "p2phd-g", "p2phd-d",
                            "p2phd-wd", "uda-encoder", "uda-decoder",
                            "uda-domain-d",
                            "vgg19-conv", "vgg19-features", "vgg16-features"])
    p.add_argument("--in_pth", required=True)
    p.add_argument("--out", required=True)
    # cyclegan args
    p.add_argument("--gen_type", default="p2p")
    p.add_argument("--n_residual_blocks", type=int, default=6)
    p.add_argument("--dense_decoder", type=lambda s: s != "False", default=True)
    # p2phd args
    p.add_argument("--netG", default="global")
    p.add_argument("--n_downsample_global", type=int, default=3)
    p.add_argument("--n_blocks_global", type=int, default=9)
    p.add_argument("--n_local_enhancers", type=int, default=1)
    p.add_argument("--n_blocks_local", type=int, default=3)
    p.add_argument("--num_D", type=int, default=2)
    p.add_argument("--n_layers_D", type=int, default=3)
    p.add_argument("--getIntermFeat", type=lambda s: s != "False", default=True)
    args = p.parse_args(argv)

    from cistar_tpu.core import convert_models as cm
    from cistar_tpu.core.checkpoint import save_pytree
    from cistar_tpu.core.torch_import import load_state_dict
    from cistar_tpu.models import vgg as vgg_lib

    sd = load_state_dict(args.in_pth)

    if args.family == "cyclegan-g":
        params = cm.convert_cyclegan_generator(
            sd, args.gen_type, args.n_residual_blocks, args.dense_decoder)
    elif args.family == "cyclegan-d":
        params = cm.convert_cyclegan_discriminator(sd)
    elif args.family == "p2phd-g":
        params = cm.convert_p2phd_generator(
            sd, args.netG, n_downsample_global=args.n_downsample_global,
            n_blocks_global=args.n_blocks_global,
            n_local_enhancers=args.n_local_enhancers,
            n_blocks_local=args.n_blocks_local)
        if isinstance(params, tuple):  # BN families → (params, batch_stats)
            params = {"params": params[0], "batch_stats": params[1]}
    elif args.family == "p2phd-wd":
        params = cm.convert_wdiscriminator(sd, args.n_layers_D + 2)
    elif args.family == "uda-encoder":
        p, s = cm.convert_uda_encoder(sd, args.n_downsample_global,
                                      args.n_blocks_global)
        params = {"params": p, "batch_stats": s}
    elif args.family == "uda-decoder":
        p, s = cm.convert_uda_decoder(sd, args.n_downsample_global,
                                      args.n_blocks_global)
        params = {"params": p, "batch_stats": s}
    elif args.family == "uda-domain-d":
        p, s = cm.convert_domain_feature_discriminator(sd)
        params = {"params": p, "batch_stats": s}
    elif args.family == "p2phd-d":
        params = cm.convert_multiscale_discriminator(
            sd, args.num_D, args.n_layers_D, args.getIntermFeat)
    elif args.family == "vgg19-conv":
        params = vgg_lib.torch_vgg_conv_to_params(sd)
    elif args.family == "vgg19-features":
        params = vgg_lib.torchvision_vgg_features_to_params(sd, vgg_lib.VGG19_CONVS)
    elif args.family == "vgg16-features":
        params = vgg_lib.torchvision_vgg_features_to_params(sd, vgg_lib.VGG16_CONVS)

    save_pytree(args.out, params)
    n = sum(np.asarray(x).size for x in _leaves(params))
    print(f"converted {args.in_pth} -> {args.out} ({n:,} parameters)")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
