"""Extended trainers: transfer, WGAN feature-alignment, UDA autoencoder.

Parity targets:
  * :class:`TransferP2P`  ↔ ``Pix2PixHDTransferModel``
    (``p2pHD/models/pix2pixHD_model.py:316-621``): the pix2pixHD objective with
    G = TransferGenerator∘FeatureEncoder.
  * :class:`R2LTransfer`  ↔ ``R2LTransfer`` (:625-893): pretrained radar/lidar
    encoder+generator pairs; trains the feature discriminator ``netDF``
    (LSGAN on feature maps, update gate loss_D > 0.2) and the lidar encoder
    (image GAN via frozen netDL + feature-alignment term); cross-decodes
    radar↔lidar for inspection.
  * :class:`R2LAE`        ↔ ``udaModel.R2LAE`` (:385-617): ONE shared UDA
    encoder, two domain decoders, a domain classifier on features (BCE with
    adversarial-flip), per-domain image discriminators and reconstruction MSE;
    all six parameter groups updated jointly from the summed objective
    (matching the reference's accumulate-then-step-each pattern).
  * :class:`R2LImageCritic` ↔ ``udaModel.R2LImageDiscriminator`` (:309-381):
    a Wasserstein critic measuring the lidar↔radar image distance with
    gradient penalty (Adam β=(0.5, 0.9), weight decay 1e-4).

Each trainer compiles to a single jitted SPMD step.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from cistar_tpu.losses.gan import (
    gan_loss,
    gradient_penalty,
    l1_loss,
    mse_loss,
)
from cistar_tpu.models.pix2pixhd import (
    DomainFeatureDiscriminator,
    FeatureEncoder,
    TransferGenerator,
    UDADecoder,
    UDAEncoder,
    WDiscriminator,
    define_d,
)


class TransferPairG(nn.Module):
    """FeatureEncoder + TransferGenerator as one generator module
    (``fake = netG(netE(input))``, ``pix2pixHD_model.py:487``)."""

    output_nc: int = 1
    ngf: int = 32
    n_downsampling: int = 4
    n_scale: int = 3
    n_blocks: int = 3
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        h = FeatureEncoder(self.ngf, self.n_downsampling, self.n_scale,
                           self.norm, name="E")(x)
        return TransferGenerator(self.output_nc, self.n_blocks, self.ngf,
                                 self.n_downsampling, self.norm, name="G")(h)


def make_transfer_p2p(output_nc=1, ngf=32, n_downsampling=4, n_scale=3,
                      n_blocks=3, **p2p_kwargs):
    """Pix2PixHD engine whose generator is the FeatureEncoder/TransferGenerator
    pair — reuses the full pix2pixHD objective and step."""
    from cistar_tpu.engines.p2phd import Pix2PixHD

    eng = Pix2PixHD(net_g="global", output_nc=output_nc, ngf=ngf, **p2p_kwargs)
    eng.G = TransferPairG(output_nc, ngf, n_downsampling, n_scale, n_blocks)
    eng.net_g = "transfer"
    return eng


# --------------------------------------------------------------------------- #
# R2LTransfer — WGAN/LSGAN feature alignment between pretrained AEs
# --------------------------------------------------------------------------- #
class R2LState(NamedTuple):
    lidar_e: Any           # trainable
    net_df: Any            # trainable
    opt_lidar_e: Any
    opt_df: Any
    rng: jax.Array
    epoch: jnp.ndarray


class R2LTransfer:
    """Feature-space domain alignment (``pix2pixHD_model.py:625-893``).

    Frozen: radarE/radarG/lidarG and the image discriminators netDR/netDL
    (loaded from pretrained transfer checkpoints). Trainable: lidarE (aligned
    toward radar features) and the feature critic netDF.
    """

    def __init__(self, input_nc=1, output_nc=1, ngf=32, n_downsampling=4,
                 n_scale=3, n_blocks=3, ndf=64, n_layers_d=3, num_d=2,
                 lambda_feat=10.0, lr=1e-4, beta1=0.5, df_layers=5,
                 d_loss_floor=0.2, image_size=512, compute_dtype=jnp.bfloat16):
        self.E = FeatureEncoder(ngf, n_downsampling, n_scale)  # shared arch
        self.G = TransferGenerator(output_nc, n_blocks, ngf, n_downsampling)
        self.df_layers = df_layers
        self.DF = WDiscriminator(ngf=16, n_layer=df_layers, activate=True,
                                 flatten=False)
        self.DImg = define_d(ndf, n_layers_d, num_d=num_d, get_interm_feat=True)
        self.n_layers_d, self.num_d = n_layers_d, num_d
        self.lambda_feat = lambda_feat
        self.d_floor = d_loss_floor
        self.image_size = image_size
        self.cdt = compute_dtype
        self.tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr,
                                                       b1=beta1, b2=0.999)
        self.lr = lr

    def frozen_from_checkpoints(self, rng: jax.Array, radar_e=None,
                                radar_g=None, lidar_g=None, net_dr=None,
                                net_dl=None,
                                size: Optional[int] = None) -> Dict[str, Any]:
        """Assemble the frozen-net dict from converted torch checkpoints.

        Pass param trees from ``convert_feature_encoder`` /
        ``convert_transfer_generator`` / ``convert_multiscale_discriminator``
        (the reference loads these pretrained nets in
        ``pix2pixHD_model.py:660-680``); any omitted net keeps its random
        init from :meth:`init_frozen`.
        """
        frozen = self.init_frozen(rng, size)
        for key, tree in (("radar_e", radar_e), ("radar_g", radar_g),
                          ("lidar_g", lidar_g), ("net_dr", net_dr),
                          ("net_dl", net_dl)):
            if tree is not None:
                import jax as _jax
                frozen[key] = _jax.tree.map(jnp.asarray, tree)
        return frozen

    def init_frozen(self, rng: jax.Array, size: Optional[int] = None) -> Dict[str, Any]:
        """Initialize the frozen nets (replace with converted checkpoints)."""
        from cistar_tpu.core.initutil import conv_init, zeros_nhwc

        size = size or self.image_size
        r = jax.random.split(rng, 6)
        x = zeros_nhwc(size, 1)  # capped init size: bit-identical params
        radar_e = conv_init(self.E, r[0], x)["params"]
        feat = jax.jit(lambda p, v: self.E.apply({"params": p}, v))(radar_e, x)
        return {
            "radar_e": radar_e,
            "radar_g": conv_init(self.G, r[1], feat)["params"],
            "lidar_g": conv_init(self.G, r[2], feat)["params"],
            "net_dr": conv_init(self.DImg, r[3],
                                jnp.concatenate([x, x], -1))["params"],
            "net_dl": conv_init(self.DImg, r[4],
                                jnp.concatenate([x, x], -1))["params"],
        }

    def init_state(self, rng: jax.Array, size: Optional[int] = None) -> R2LState:
        from cistar_tpu.core.initutil import conv_init, zeros_nhwc

        size = size or self.image_size
        r = jax.random.split(rng, 3)
        x = zeros_nhwc(size, 1)
        lidar_e = conv_init(self.E, r[0], x)["params"]
        feat = jax.jit(lambda p, v: self.E.apply({"params": p}, v))(lidar_e, x)
        # The capped init input can make the FEATURE map smaller than the
        # critic's 2^df_layers receptive stack (64-capped x → 4² features at
        # n_downsampling=4, while the true 512² config feeds 32²). DF is
        # fully conv, so init it at its own spatially-sufficient size —
        # params are bit-identical regardless (core/initutil).
        fs = max(feat.shape[1], 2 ** self.df_layers)
        feat_ex = jnp.zeros((1, fs, fs, feat.shape[-1]), feat.dtype)
        net_df = conv_init(self.DF, r[1], feat_ex)["params"]
        return R2LState(lidar_e=lidar_e, net_df=net_df,
                        opt_lidar_e=self.tx.init(lidar_e),
                        opt_df=self.tx.init(net_df),
                        rng=r[2], epoch=jnp.zeros((), jnp.int32))

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: R2LState, frozen: Dict[str, Any],
                   radar: jnp.ndarray, lidar: jnp.ndarray):
        cdt = self.cdt

        def e_apply(p, x):
            return self.E.apply({"params": p}, x.astype(cdt)).astype(jnp.float32)

        def g_apply(p, h):
            return self.G.apply({"params": p}, h.astype(cdt)).astype(jnp.float32)

        def df_apply(p, h):
            return self.DF.apply({"params": p}, h.astype(cdt)).astype(jnp.float32)

        def dimg_apply(p, x):
            outs = self.DImg.apply({"params": p}, x.astype(cdt))
            return jax.tree.map(lambda a: a.astype(jnp.float32), outs)

        radar_feat = e_apply(frozen["radar_e"], radar)   # "real" features

        # ---- feature-critic update (LSGAN on feature maps, gate > 0.2) -----
        def df_loss_fn(dfp):
            lidar_feat = jax.lax.stop_gradient(e_apply(state.lidar_e, lidar))
            loss_real = mse_loss(df_apply(dfp, radar_feat),
                                 jnp.ones((1,), jnp.float32))
            loss_fake = mse_loss(df_apply(dfp, lidar_feat),
                                 jnp.zeros((1,), jnp.float32))
            return 0.5 * loss_real + 0.5 * loss_fake

        loss_df, df_grads = jax.value_and_grad(df_loss_fn)(state.net_df)
        do_df = loss_df > self.d_floor
        gate = do_df.astype(jnp.float32)
        opt_df_in = state.opt_df
        df_updates, opt_df_new = self.tx.update(df_grads, opt_df_in, state.net_df)
        net_df = optax.apply_updates(
            state.net_df, jax.tree.map(lambda u: u * gate, df_updates))
        opt_df = jax.tree.map(lambda n, o: jnp.where(do_df, n, o),
                              opt_df_new, opt_df_in)

        # ---- lidar-encoder update ------------------------------------------
        feat_w = 4.0 / (self.n_layers_d + 1)
        d_w = 1.0 / self.num_d

        def e_loss_fn(ep):
            lidar_feat = e_apply(ep, lidar)
            lidar_gen = g_apply(frozen["lidar_g"], lidar_feat)
            pred_fake = dimg_apply(frozen["net_dl"],
                                   jnp.concatenate([lidar, lidar_gen], -1))
            loss_gan = gan_loss(pred_fake, True)
            # feature alignment: critic should call lidar features "real"
            loss_align = mse_loss(df_apply(net_df, lidar_feat),
                                  jnp.ones((1,), jnp.float32))
            pred_real = dimg_apply(frozen["net_dl"],
                                   jnp.concatenate([lidar, lidar], -1))
            # loss_feat is a LOG-ONLY metric: the reference's exercised
            # branch optimizes loss_G_GAN_lidar + loss_G_WGAN only, with the
            # feat-matching variant commented out (pix2pixHD_model.py:806-811)
            loss_feat = jnp.float32(0)
            for i in range(self.num_d):
                for j in range(len(pred_fake[i]) - 1):
                    loss_feat = loss_feat + d_w * feat_w * self.lambda_feat * \
                        l1_loss(pred_fake[i][j],
                                jax.lax.stop_gradient(pred_real[i][j]))
            return loss_gan + loss_align, (loss_gan, loss_feat, loss_align,
                                           lidar_feat)

        (_, (loss_gan, loss_feat, loss_align, lidar_feat)), e_grads = \
            jax.value_and_grad(e_loss_fn, has_aux=True)(state.lidar_e)
        opt_e_in = state.opt_lidar_e
        e_updates, opt_e = self.tx.update(e_grads, opt_e_in, state.lidar_e)
        lidar_e = optax.apply_updates(state.lidar_e, e_updates)

        # cross decodes for inspection (eval mode semantics)
        radar_trans = g_apply(frozen["lidar_g"], radar_feat)
        lidar_trans = g_apply(frozen["radar_g"], jax.lax.stop_gradient(lidar_feat))

        metrics = {"G_GAN": loss_gan, "G_GAN_Feat": loss_feat,
                   "G_Loss": loss_align, "D_Loss": loss_df}
        new_state = R2LState(lidar_e=lidar_e, net_df=net_df,
                             opt_lidar_e=opt_e, opt_df=opt_df,
                             rng=state.rng, epoch=state.epoch)
        return new_state, metrics, (radar_trans, lidar_trans)


# --------------------------------------------------------------------------- #
# R2LAE — UDA shared-encoder autoencoder
# --------------------------------------------------------------------------- #
class R2LAEState(NamedTuple):
    e: Any
    g_radar: Any
    g_lidar: Any
    df: Any
    dr: Any
    dl: Any
    opts: Any          # dict of 6 optimizer states
    stats: Any         # BatchNorm running statistics per BN-bearing net
    rng: jax.Array
    epoch: jnp.ndarray


class R2LAE:
    """UDA trainer (``udaModel.py:385-617``)."""

    def __init__(self, input_nc=1, size=512, n_downsample=3, ngf=16,
                 encoder_resblock=0, max_ch=256, wgan=False,
                 ndf=64, n_layers_d=3, num_d=2, lr=1e-4, beta1=0.5,
                 compute_dtype=jnp.bfloat16):
        self.E = UDAEncoder(size=size, down_conv=n_downsample, ngf=ngf,
                            n_resblocks=encoder_resblock, max_ch=max_ch)
        f_size = size // (2 ** n_downsample)
        self.G_radar = UDADecoder(output_nc=1, size=size, f_size=f_size,
                                  down_conv=n_downsample,
                                  n_resblocks=encoder_resblock)
        self.G_lidar = UDADecoder(output_nc=1, size=size, f_size=f_size,
                                  down_conv=n_downsample,
                                  n_resblocks=encoder_resblock)
        self.wgan = wgan
        self.DF = (WDiscriminator(activate=False, flatten=False) if wgan
                   else DomainFeatureDiscriminator())
        self.DImg = define_d(ndf, n_layers_d, num_d=num_d, get_interm_feat=True)
        self.size = size
        self.cdt = compute_dtype
        self.tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr,
                                                       b1=beta1, b2=0.999)

    def init_state(self, rng: jax.Array, size: Optional[int] = None) -> R2LAEState:
        from cistar_tpu.core.initutil import conv_init, zeros_nhwc

        size = size or self.size
        r = jax.random.split(rng, 7)
        x = zeros_nhwc(size, 1)
        ve = conv_init(self.E, r[0], x)
        e, stats_e = ve["params"], ve.get("batch_stats", {})
        feat = jax.jit(self.E.apply)(ve, x)
        vgr = conv_init(self.G_radar, r[1], feat)
        vgl = conv_init(self.G_lidar, r[2], feat)
        vdf = conv_init(self.DF, r[3], feat)
        g_radar, g_lidar, df = vgr["params"], vgl["params"], vdf["params"]
        dr = conv_init(self.DImg, r[4], x)["params"]
        dl = conv_init(self.DImg, r[5], x)["params"]
        opts = {k: self.tx.init(v) for k, v in
                {"e": e, "g_radar": g_radar, "g_lidar": g_lidar,
                 "df": df, "dr": dr, "dl": dl}.items()}
        stats = {"e": stats_e, "g_radar": vgr.get("batch_stats", {}),
                 "g_lidar": vgl.get("batch_stats", {}),
                 "df": vdf.get("batch_stats", {})}
        return R2LAEState(e=e, g_radar=g_radar, g_lidar=g_lidar, df=df,
                          dr=dr, dl=dl, opts=opts, stats=stats, rng=r[6],
                          epoch=jnp.zeros((), jnp.int32))

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: R2LAEState, radar: jnp.ndarray,
                   lidar: jnp.ndarray):
        cdt = self.cdt
        bs = radar.shape[0]

        def joint_loss(params):
            e, g_radar, g_lidar, df, dr, dl = (
                params["e"], params["g_radar"], params["g_lidar"],
                params["df"], params["dr"], params["dl"])

            ip = jnp.concatenate([radar, lidar], axis=0)
            feat, ve = self.E.apply(
                {"params": e, "batch_stats": state.stats["e"]},
                ip.astype(cdt), train=True, mutable=["batch_stats"])
            feat = feat.astype(jnp.float32)
            radar_feat, lidar_feat = feat[:bs], feat[bs:]

            pred_f, vdf = self.DF.apply(
                {"params": df, "batch_stats": state.stats["df"]},
                feat.astype(cdt), train=True, mutable=["batch_stats"])
            pred_f = pred_f.astype(jnp.float32)
            ones = jnp.ones_like(pred_f[:bs])
            zeros = jnp.zeros_like(pred_f[:bs])
            target_real = jnp.concatenate([ones, zeros], axis=0)
            target_flip = jnp.concatenate([zeros, ones], axis=0)
            # BCE on sigmoid outputs (DomainFeatureDiscriminator ends in
            # sigmoid); clip for numerical safety. Deliberate deviation: with
            # wgan=True the reference feeds wDiscriminator(activate=False)
            # raw scores into torch BCELoss, which *raises* outside [0,1]
            # (udaModel.py:419,452 + its dead wganGP_loss) — the clip lets
            # that config run instead of crashing. Both loss terms are summed
            # with no detach between encoder and classifier, again matching
            # the reference's accumulated-gradient semantics (the
            # complementary-target pair drives p toward ½ for both nets —
            # the reference's own behavior, kept for parity).
            p = jnp.clip(pred_f, 1e-6, 1 - 1e-6)
            loss_d_encoder = -jnp.mean(target_real * jnp.log(p)
                                       + (1 - target_real) * jnp.log(1 - p))
            loss_encoder = -jnp.mean(target_flip * jnp.log(p)
                                     + (1 - target_flip) * jnp.log(1 - p))

            lidar_gen, vgl = self.G_lidar.apply(
                {"params": g_lidar, "batch_stats": state.stats["g_lidar"]},
                lidar_feat.astype(cdt), train=True, mutable=["batch_stats"])
            radar_gen, vgr = self.G_radar.apply(
                {"params": g_radar, "batch_stats": state.stats["g_radar"]},
                radar_feat.astype(cdt), train=True, mutable=["batch_stats"])
            lidar_gen = lidar_gen.astype(jnp.float32)
            radar_gen = radar_gen.astype(jnp.float32)

            mse_lidar = mse_loss(lidar, lidar_gen)
            mse_radar = mse_loss(radar, radar_gen)

            def dimg(p_, x_):
                outs = self.DImg.apply({"params": p_}, x_.astype(cdt))
                return jax.tree.map(lambda a: a.astype(jnp.float32), outs)

            # No detach anywhere, matching the reference exactly: R2LAE does
            # ONE zero_grad, six backward(retain_graph=True) passes whose
            # gradients ACCUMULATE in shared buffers, then steps all six
            # optimizers (udaModel.py:528-552) — i.e. its effective objective
            # is this joint sum with full gradient flow. For LSGAN that means
            # each image D sees (p-1)² [G term] + p² [D-fake term] on the
            # same prediction (net fake-target ½) — a reference quirk kept
            # for parity, not a bug in this port.
            pred_fake_lidar = dimg(dl, lidar_gen)
            pred_real_lidar = dimg(dl, lidar)
            loss_g_gan_lidar = gan_loss(pred_fake_lidar, True)
            loss_d_lidar = (gan_loss(pred_real_lidar, True)
                            + gan_loss(pred_fake_lidar, False))

            pred_fake_radar = dimg(dr, radar_gen)
            pred_real_radar = dimg(dr, radar)
            loss_g_gan_radar = gan_loss(pred_fake_radar, True)
            loss_d_radar = (gan_loss(pred_real_radar, True)
                            + gan_loss(pred_fake_radar, False))

            loss_gan_lidar = mse_lidar + loss_g_gan_lidar
            loss_gan_radar = mse_radar + loss_g_gan_radar

            total = (loss_gan_lidar + loss_gan_radar + loss_d_lidar
                     + loss_d_radar + loss_d_encoder + loss_encoder)
            metrics = {"gan_radar": loss_gan_radar, "gan_lidar": loss_gan_lidar,
                       "MSE_radar": mse_radar, "MSE_lidar": mse_lidar,
                       "w_distance_F": loss_d_encoder,
                       "d_radar": loss_d_radar, "d_lidar": loss_d_lidar}
            new_stats = {"e": ve["batch_stats"], "df": vdf["batch_stats"],
                         "g_lidar": vgl["batch_stats"],
                         "g_radar": vgr["batch_stats"]}
            return total, (metrics, {"lidar_gen": lidar_gen,
                                     "radar_gen": radar_gen}, new_stats)

        params = {"e": state.e, "g_radar": state.g_radar,
                  "g_lidar": state.g_lidar, "df": state.df,
                  "dr": state.dr, "dl": state.dl}
        (_, (metrics, fakes, new_stats)), grads = jax.value_and_grad(
            joint_loss, has_aux=True)(params)
        # EMA running stats ride along as aux (no gradient flows into them)
        new_stats = jax.lax.stop_gradient(new_stats)

        new_params, new_opts = {}, {}
        for k in params:
            updates, new_opts[k] = self.tx.update(grads[k], state.opts[k],
                                                  params[k])
            new_params[k] = optax.apply_updates(params[k], updates)

        new_state = R2LAEState(
            e=new_params["e"], g_radar=new_params["g_radar"],
            g_lidar=new_params["g_lidar"], df=new_params["df"],
            dr=new_params["dr"], dl=new_params["dl"],
            opts=new_opts, stats=new_stats, rng=state.rng, epoch=state.epoch)
        return new_state, metrics, fakes

    @functools.partial(jax.jit, static_argnums=0)
    def infer(self, state: R2LAEState, radar, lidar):
        """Eval-mode inference: BN uses running averages, so the output of
        each sample is independent of the batch composition (torch eval
        parity; the round-1 per-batch-stats behavior is gone)."""
        bs = radar.shape[0]
        ip = jnp.concatenate([radar, lidar], axis=0)
        feat = self.E.apply(
            {"params": state.e, "batch_stats": state.stats["e"]},
            ip.astype(self.cdt), train=False).astype(jnp.float32)
        lidar_gen = self.G_lidar.apply(
            {"params": state.g_lidar, "batch_stats": state.stats["g_lidar"]},
            feat[bs:].astype(self.cdt), train=False)
        radar_gen = self.G_radar.apply(
            {"params": state.g_radar, "batch_stats": state.stats["g_radar"]},
            feat[:bs].astype(self.cdt), train=False)
        return {"lidar_gen": lidar_gen, "radar_gen": radar_gen}


# --------------------------------------------------------------------------- #
# R2L image critic — Wasserstein distance measurement
# --------------------------------------------------------------------------- #
class CriticState(NamedTuple):
    d: Any
    opt: Any
    rng: jax.Array


class R2LImageCritic:
    """Standalone w-distance meter between lidar and radar images
    (``udaModel.py:309-381``)."""

    def __init__(self, ngf=16, n_layer=5, w_lambda=10.0, lr=1e-4,
                 compute_dtype=jnp.float32):
        self.D = WDiscriminator(ngf=ngf, n_layer=n_layer, flatten=True)
        self.w_lambda = w_lambda
        self.cdt = compute_dtype
        # reference: Adam(lr, betas=(0.5, 0.9), weight_decay=1e-4)
        self.tx = optax.chain(
            optax.add_decayed_weights(1e-4),
            optax.adam(lr, b1=0.5, b2=0.9),
        )

    def init_state(self, rng: jax.Array, size: int = 512) -> CriticState:
        from cistar_tpu.core.initutil import conv_init, zeros_nhwc

        r1, r2 = jax.random.split(rng)
        d = conv_init(self.D, r1, zeros_nhwc(size, 1))["params"]
        return CriticState(d=d, opt=self.tx.init(d), rng=r2)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: CriticState, lidar, radar):
        rng, k_gp = jax.random.split(state.rng)

        def loss_fn(dp):
            def critic(x):
                return self.D.apply({"params": dp}, x.astype(self.cdt))

            lidar_f = critic(lidar).astype(jnp.float32)
            radar_f = critic(radar).astype(jnp.float32)
            gp = gradient_penalty(critic, lidar, radar, k_gp, lam=1.0)
            distance = jnp.mean(lidar_f) - jnp.mean(radar_f) + self.w_lambda * gp
            return distance, (jnp.mean(lidar_f), jnp.mean(radar_f), gp)

        (dist, (lf, rf, gp)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.d)
        updates, opt = self.tx.update(grads, state.opt, state.d)
        d = optax.apply_updates(state.d, updates)
        metrics = {"w_distance": dist, "lidar_F": lf, "radar_F": rf, "gp": gp}
        return CriticState(d=d, opt=opt, rng=rng), metrics
