"""Model/trainer factory — parity with ``p2pHD/models/models.py:3-46``.

``create_model``: dispatch by options — pix2pixHD → R2LTransfer (wgan) /
TransferP2P (transfer) / Pix2PixHD (train) — and ``create_uda_model`` by
``training_module``. The reference's leftover ``ipdb.set_trace()``
(``models.py:24-25``, which drops every training run into a debugger) is a
bug we deliberately do not replicate (SURVEY.md §7 "reference quirks").
DataParallel wrapping is replaced by the SPMD mesh (engines shard the batch).
"""

from __future__ import annotations

import jax.numpy as jnp


def create_model(opt):
    """Build the trainer matching an options namespace (argparse or opt.txt)."""
    from cistar_tpu.engines.extended import R2LTransfer, make_transfer_p2p
    from cistar_tpu.engines.p2phd import Pix2PixHD
    from cistar_tpu.losses.perceptual import make_vgg_loss

    size = opt.r2l_res if getattr(opt, "r2l", False) else opt.fineSize
    cdt = jnp.bfloat16 if (getattr(opt, "fp16", False)
                           or getattr(opt, "data_type", 32) == 16) else jnp.float32

    if opt.model == "pix2pixHD":
        if getattr(opt, "wgan", False):
            return R2LTransfer(
                input_nc=opt.input_nc, output_nc=opt.output_nc, ngf=opt.ngf,
                n_downsampling=opt.n_downsample_global, n_scale=opt.n_scale,
                n_blocks=opt.n_blocks_global, ndf=opt.ndf,
                n_layers_d=opt.n_layers_D, num_d=opt.num_D,
                lambda_feat=opt.lambda_feat, lr=opt.lr,
                beta1=getattr(opt, "beta1", 0.5), image_size=size,
                compute_dtype=cdt)
        if getattr(opt, "transfer", False):
            return make_transfer_p2p(
                output_nc=opt.output_nc, ngf=opt.ngf,
                n_downsampling=opt.n_downsample_global, n_scale=opt.n_scale,
                n_blocks=opt.n_blocks_global, input_nc=opt.input_nc,
                label_nc=opt.label_nc, ndf=opt.ndf,
                n_layers_d=opt.n_layers_D, num_d=opt.num_D,
                no_instance=opt.no_instance, r2l=getattr(opt, "r2l", False),
                use_lsgan=not opt.no_lsgan, lambda_feat=opt.lambda_feat,
                use_ganfeat_loss=not opt.no_ganFeat_loss,
                vgg_criterion=(None if getattr(opt, "no_vgg_loss", True)
                               else make_vgg_loss()),
                lr=opt.lr, beta1=getattr(opt, "beta1", 0.5),
                niter=getattr(opt, "niter", 50),
                niter_decay=getattr(opt, "niter_decay", 50),
                pool_size=getattr(opt, "pool_size", 0),
                image_size=size, compute_dtype=cdt)
        return Pix2PixHD(
            net_g=opt.netG, input_nc=opt.input_nc, output_nc=opt.output_nc,
            label_nc=opt.label_nc, ngf=opt.ngf, ndf=getattr(opt, "ndf", 64),
            n_downsample_global=opt.n_downsample_global,
            n_blocks_global=opt.n_blocks_global,
            n_local_enhancers=opt.n_local_enhancers,
            n_blocks_local=opt.n_blocks_local,
            n_layers_d=getattr(opt, "n_layers_D", 3),
            num_d=getattr(opt, "num_D", 2), norm=opt.norm,
            no_instance=opt.no_instance, r2l=getattr(opt, "r2l", False),
            use_lsgan=not getattr(opt, "no_lsgan", False),
            lambda_feat=getattr(opt, "lambda_feat", 10.0),
            use_ganfeat_loss=not getattr(opt, "no_ganFeat_loss", False),
            vgg_criterion=(None if getattr(opt, "no_vgg_loss", True)
                           else make_vgg_loss()),
            lr=getattr(opt, "lr", 1e-4), beta1=getattr(opt, "beta1", 0.5),
            niter=getattr(opt, "niter", 50),
            niter_decay=getattr(opt, "niter_decay", 50),
            niter_fix_global=getattr(opt, "niter_fix_global", 0),
            pool_size=getattr(opt, "pool_size", 0),
            image_size=size, compute_dtype=cdt)
    raise ValueError(f"unknown model {opt.model!r}")


def create_uda_model(opt):
    """``create_UDA_model`` dispatch by ``training_module``."""
    from cistar_tpu.engines.extended import R2LAE, R2LImageCritic

    size = opt.r2l_res
    cdt = jnp.bfloat16 if getattr(opt, "fp16", False) else jnp.float32
    if opt.training_module == "discriminator":
        return R2LImageCritic(w_lambda=getattr(opt, "w_lambda", 10.0),
                              lr=opt.lr, compute_dtype=cdt)
    # autoencoder / default: the shared-encoder UDA trainer
    return R2LAE(input_nc=opt.input_nc, size=size,
                 n_downsample=opt.n_downsample_global, ngf=opt.ngf,
                 encoder_resblock=getattr(opt, "encoder_resblock", 0),
                 max_ch=getattr(opt, "max_ch", 256),
                 wgan=getattr(opt, "wgan", False), ndf=opt.ndf,
                 n_layers_d=opt.n_layers_D, num_d=opt.num_D, lr=opt.lr,
                 beta1=getattr(opt, "beta1", 0.5), compute_dtype=cdt)
