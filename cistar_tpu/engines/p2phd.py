"""pix2pixHD training/inference engine — one jitted SPMD step.

Reference semantics (``p2pHD/models/pix2pixHD_model.py:9-313`` +
``p2pHD/train.py:78-164``):

  * ``encode_input``: one-hot labels when ``label_nc>0`` and not r2l,
    instance-boundary edge maps appended unless ``no_instance``
    (:119-150, :273-282).
  * forward: fake = G(input); D sees (label ‖ image) pairs; losses =
    D_fake (via pool), D_real, G_GAN, feature matching
    (4/(n_layers+1) · 1/num_D · L1 per D layer · λ), optional VGG loss · λ
    (:160-204).
  * G step always; D step only when ``loss_D = (fake+real)/2 ≥ 0.1``
    (``train.py:113-119``).
  * LR: constant for ``niter`` epochs then linear decay over ``niter_decay``
    (:299-308); ``niter_fix_global`` freezes the global trunk, training only
    the enhancer streams (:93-108).

All of that — including the data-dependent D gate and the optional pool — is
compiled into one jitted step; the batch axis shards across the mesh.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from cistar_tpu.losses.gan import gan_loss, l1_loss
from cistar_tpu.models.pix2pixhd import Encoder, define_d, define_g
from cistar_tpu.utils.image_pool import PoolState, init_pool, push_and_pop


def get_edges(t: jnp.ndarray) -> jnp.ndarray:
    """Instance-boundary map (``pix2pixHD_model.py:273-282``), NHWC."""
    e = jnp.zeros_like(t, dtype=jnp.bool_)
    diff_w = t[:, :, 1:, :] != t[:, :, :-1, :]
    e = e.at[:, :, 1:, :].set(diff_w)
    e = e.at[:, :, :-1, :].set(e[:, :, :-1, :] | diff_w)
    diff_h = t[:, 1:, :, :] != t[:, :-1, :, :]
    e = e.at[:, 1:, :, :].set(e[:, 1:, :, :] | diff_h)
    e = e.at[:, :-1, :, :].set(e[:, :-1, :, :] | diff_h)
    return e.astype(jnp.float32)


class P2PState(NamedTuple):
    g: Any
    d: Any
    opt_g: Any
    opt_d: Any
    pool: Optional[PoolState]
    rng: jax.Array
    epoch: jnp.ndarray
    e: Any = None          # netE params (use_features joint training)
    opt_e: Any = None
    g_stats: Any = None    # G batch_stats (BatchNorm families, e.g. the
                           # define_G multiscale quirk — networks.py:40)


class Pix2PixHD:
    """Builds the G/D pair and exposes jitted train/infer steps."""

    def __init__(
        self,
        net_g: str = "global",
        input_nc: int = 1,
        output_nc: int = 1,
        label_nc: int = 0,
        ngf: int = 64,
        ndf: int = 64,
        n_downsample_global: int = 3,
        n_blocks_global: int = 9,
        n_local_enhancers: int = 1,
        n_blocks_local: int = 3,
        n_layers_d: int = 3,
        num_d: int = 2,
        norm: str = "instance",
        no_instance: bool = True,
        r2l: bool = True,
        use_lsgan: bool = True,
        lambda_feat: float = 10.0,
        use_ganfeat_loss: bool = True,
        vgg_criterion: Optional[Callable] = None,  # losses.perceptual.make_vgg_loss
        lr: float = 1e-4,
        beta1: float = 0.5,
        niter: int = 50,
        niter_decay: int = 50,
        niter_fix_global: int = 0,
        pool_size: int = 0,
        d_loss_floor: float = 0.1,
        image_size: int = 512,
        compute_dtype=jnp.bfloat16,
        instance_feat: bool = False,
        label_feat: bool = False,
        load_features: bool = False,
        feat_num: int = 3,
        nef: int = 16,
        n_downsample_e: int = 4,
        max_instances: int = 64,
        spatial_mesh=None,
    ):
        # use_features / gen_features semantics: pix2pixHD_model.py:26-28
        self.use_features = instance_feat or label_feat
        self.gen_features = self.use_features and not load_features
        self.label_feat = label_feat
        self.load_features = load_features
        self.feat_num = feat_num
        self.max_instances = max_instances
        self.G = define_g(net_g, output_nc, ngf, n_downsample_global,
                          n_blocks_global, n_local_enhancers, n_blocks_local, norm)
        # netE trains jointly with G when generating features
        # (pix2pixHD_model.py:57-59 wiring, :110-117 shared optimizer)
        self.E = (Encoder(feat_num, nef, n_downsample_e, norm)
                  if self.gen_features else None)
        self.D = define_d(ndf, n_layers_d, norm, use_sigmoid=not use_lsgan,
                          num_d=num_d, get_interm_feat=use_ganfeat_loss)
        self.net_g = net_g
        self.norm = norm
        self.n_downsample_global = n_downsample_global
        self.n_blocks_global = n_blocks_global
        self.n_local_enhancers = n_local_enhancers
        self.n_blocks_local = n_blocks_local
        self.input_nc, self.output_nc, self.label_nc = input_nc, output_nc, label_nc
        self.no_instance, self.r2l = no_instance, r2l
        self.use_lsgan = use_lsgan
        self.lambda_feat = lambda_feat
        self.use_ganfeat = use_ganfeat_loss
        self.vgg_criterion = vgg_criterion
        self.n_layers_d, self.num_d = n_layers_d, num_d
        self.lr, self.beta1 = lr, beta1
        self.niter, self.niter_decay = niter, niter_decay
        self.niter_fix_global = niter_fix_global
        self.pool_size = pool_size
        self.d_floor = d_loss_floor
        self.image_size = image_size
        self.cdt = compute_dtype
        # spatial_mesh: a Mesh with a "spatial" axis — the generator forward
        # (train AND inference) runs H-sharded via parallel.spatial_models
        # (halo-exchange convs, psum instance norm); activations of the
        # dominant G stream are then sharded across chips, the 1024²+ HBM
        # relief of SURVEY §5. Instance-norm families only.
        self.spatial_mesh = spatial_mesh
        if spatial_mesh is not None:
            if norm != "instance" or net_g not in ("global", "local", "UNet"):
                raise NotImplementedError(
                    "spatial sharding supports instance-norm global/local/"
                    f"UNet generators (got netG={net_g!r}, norm={norm!r})")
        self.tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr,
                                                       b1=beta1, b2=0.999)

    # -- input encoding ------------------------------------------------------
    def label_input_nc(self) -> int:
        """Channels of the encoded label the DISCRIMINATOR sees (no feat)."""
        nc = self.label_nc if (self.label_nc != 0 and not self.r2l) else self.input_nc
        if not self.no_instance:
            nc += 1
        return nc

    def g_input_nc(self) -> int:
        nc = self.label_input_nc()
        if self.use_features:
            nc += self.feat_num    # netG input grows by the feature channels
        return nc

    def encode_input(self, label, inst=None):
        """One-hot labels (non-r2l semantic mode) + instance edge maps."""
        if self.label_nc != 0 and not self.r2l:
            onehot = jax.nn.one_hot(label[..., 0].astype(jnp.int32), self.label_nc,
                                    dtype=jnp.float32)
            input_label = onehot
        else:
            input_label = label.astype(jnp.float32)
        if not self.no_instance and inst is not None:
            input_label = jnp.concatenate([input_label, get_edges(inst)], axis=-1)
        return input_label

    # -- state ---------------------------------------------------------------
    def init_state(self, rng: jax.Array, image_size: Optional[int] = None) -> P2PState:
        from cistar_tpu.core.initutil import conv_init, zeros_nhwc

        size = image_size or self.image_size
        r = jax.random.split(rng, 3)
        # fully-conv models: init at a capped spatial size (bit-identical
        # params, seconds instead of minutes of compile — see core/initutil)
        xg = zeros_nhwc(size, self.g_input_nc())
        xd = zeros_nhwc(size, self.label_input_nc() + self.output_nc)
        gv = conv_init(self.G, r[0], xg)
        g = gv["params"]
        g_stats = gv.get("batch_stats")
        dv = conv_init(self.D, r[1], xd)
        d = dv["params"]
        if "batch_stats" in dv:
            raise NotImplementedError(
                "BatchNorm discriminators are not threaded through the "
                "jitted step (the reference uses instance norm for D); "
                "set norm='instance'")
        pool = (init_pool(self.pool_size,
                          (size, size, self.label_input_nc() + self.output_nc))
                if self.pool_size > 0 else None)
        e = opt_e = None
        if self.gen_features:
            from cistar_tpu.core.initutil import init_size

            isz = init_size(size)
            xe = jnp.zeros((1, isz, isz, self.output_nc), jnp.float32)
            inst0 = jnp.zeros((1, isz, isz), jnp.int32)
            e = jax.jit(lambda k, x, i: self.E.init(
                k, x, i, self.max_instances))(
                jax.random.fold_in(r[0], 1), xe, inst0)["params"]
            opt_e = self.tx.init(e)
        return P2PState(
            g=g, d=d,
            opt_g=self.tx.init(g), opt_d=self.tx.init(d),
            pool=pool, rng=r[2], epoch=jnp.zeros((), jnp.int32),
            e=e, opt_e=opt_e, g_stats=g_stats,
        )

    # -- helpers -------------------------------------------------------------
    def _g_apply(self, params, x, stats=None, train=False):
        """Generator forward; BatchNorm families thread ``stats``
        (train=True additionally returns the updated running stats)."""
        if self.spatial_mesh is not None and stats is None:
            # H-sharded forward over the spatial mesh (halo-exchange convs,
            # psum IN) — differentiable, so the TRAIN step's G grads flow
            # through the same sharding; outputs are global arrays, the rest
            # of the step (D, losses) is resharded by XLA automatically.
            from cistar_tpu.parallel import spatial_models as sm

            xs = x.astype(self.cdt)
            if self.net_g == "global":
                out = sm.global_generator_sharded_apply(
                    params, xs, self.spatial_mesh,
                    self.n_downsample_global, self.n_blocks_global)
            elif self.net_g == "local":
                out = sm.local_enhancer_sharded_apply(
                    params, xs, self.spatial_mesh,
                    self.n_downsample_global, self.n_blocks_global,
                    self.n_local_enhancers, self.n_blocks_local)
            else:  # "UNet" (guarded in __init__)
                out = sm.unet_msrb_sharded_apply(
                    params, xs, self.spatial_mesh, self.n_blocks_global)
            return out.astype(jnp.float32)
        if stats is None:
            return self.G.apply({"params": params},
                                x.astype(self.cdt)).astype(jnp.float32)
        if train:
            out, mut = self.G.apply(
                {"params": params, "batch_stats": stats},
                x.astype(self.cdt), train=True, mutable=["batch_stats"])
            return out.astype(jnp.float32), mut["batch_stats"]
        return self.G.apply({"params": params, "batch_stats": stats},
                            x.astype(self.cdt),
                            train=False).astype(jnp.float32)

    def _d_apply(self, params, x):
        outs = self.D.apply({"params": params}, x.astype(self.cdt))
        return jax.tree.map(lambda a: a.astype(jnp.float32), outs)

    def lr_at(self, epoch: jnp.ndarray) -> jnp.ndarray:
        """Constant for ``niter`` epochs, then linear decay to 0 over
        ``niter_decay`` (``pix2pixHD_model.py:299-308``). ``niter_decay=0``
        means no decay phase (the closed form would otherwise produce 0/0)."""
        if self.niter_decay <= 0:
            return jnp.asarray(self.lr, jnp.float32)
        e = epoch.astype(jnp.float32)
        decay_steps = jnp.maximum(e - self.niter + 1.0, 0.0)
        return self.lr * jnp.clip(1.0 - decay_steps / self.niter_decay, 0.0, 1.0)

    def _fix_global_mask(self, grads, epoch):
        """Zero global-trunk grads while epoch < niter_fix_global (LocalEnhancer
        finetune schedule — only 'enh*'/'head' params train)."""
        if self.niter_fix_global <= 0 or self.net_g != "local":
            return grads
        fix = (epoch < self.niter_fix_global).astype(jnp.float32)

        def mask_tree(tree, top):
            keep = top.startswith("enh") or top == "head"
            scale = 1.0 if keep else (1.0 - fix)
            return jax.tree.map(lambda g: g * scale, tree)

        return {k: mask_tree(v, k) for k, v in grads.items()}

    # -- the jitted step -----------------------------------------------------
    def _pool_ids(self, label, inst):
        """Instance ids for feature pooling: inst, or the label map when
        label_feat (``pix2pixHD_model.py:148-149``)."""
        ids = label if (self.label_feat or inst is None) else inst
        if ids.ndim == 4:
            ids = ids[..., 0]
        return ids.astype(jnp.int32)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: P2PState, label, inst, image, feat=None):
        rng, k_pool = jax.random.split(state.rng)
        input_label = self.encode_input(label, inst)
        lr_now = self.lr_at(state.epoch)

        feat_w = 4.0 / (self.n_layers_d + 1)
        d_w = 1.0 / self.num_d

        bs = label.shape[0]
        pool_ids = self._pool_ids(label, inst) if self.gen_features else None

        def g_loss_fn(gep):
            gp = gep["g"] if self.gen_features else gep
            if self.gen_features:
                # netE encodes the REAL image, instance-pooled; feat_map is
                # NOT detached — E trains jointly with G through the G losses
                # (pix2pixHD_model.py:166-171, optimizer at :110-117)
                feat_map = self.E.apply(
                    {"params": gep["e"]}, image.astype(jnp.float32),
                    pool_ids, self.max_instances)
                g_in = jnp.concatenate([input_label, feat_map], axis=-1)
            elif self.use_features:
                g_in = jnp.concatenate(
                    [input_label, feat.astype(jnp.float32)], axis=-1)
            else:
                g_in = input_label
            if state.g_stats is not None:
                fake, new_stats = self._g_apply(gp, g_in, state.g_stats,
                                                train=True)
            else:
                fake, new_stats = self._g_apply(gp, g_in), None
            if self.use_ganfeat:
                # one batched D call over (fake ‖ real) pairs — per-sample
                # norms make this bit-identical to two separate calls
                both = self._d_apply(state.d, jnp.concatenate([
                    jnp.concatenate([input_label, fake], axis=-1),
                    jnp.concatenate([input_label, image], axis=-1)], axis=0))
                pred_fake = jax.tree.map(lambda t: t[:bs], both)
                pred_real = jax.tree.map(lambda t: t[bs:], both)
            else:
                pred_fake = self._d_apply(
                    state.d, jnp.concatenate([input_label, fake], axis=-1))
            loss_g_gan = gan_loss(pred_fake, True, self.use_lsgan)

            loss_feat = jnp.float32(0)
            if self.use_ganfeat:
                for i in range(self.num_d):
                    for j in range(len(pred_fake[i]) - 1):
                        loss_feat = loss_feat + d_w * feat_w * self.lambda_feat * \
                            l1_loss(pred_fake[i][j],
                                    jax.lax.stop_gradient(pred_real[i][j]))

            loss_vgg = jnp.float32(0)
            if self.vgg_criterion is not None:
                loss_vgg = self.vgg_criterion(fake, image) * self.lambda_feat

            total = loss_g_gan + loss_feat + loss_vgg
            return total, {"fake": fake, "g_stats": new_stats,
                           "G_GAN": loss_g_gan,
                           "G_GAN_Feat": loss_feat, "G_VGG": loss_vgg}

        g_arg = {"g": state.g, "e": state.e} if self.gen_features else state.g
        (_, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(g_arg)
        if self.gen_features:
            e_grads, g_grads = g_grads["e"], g_grads["g"]
        g_grads = self._fix_global_mask(g_grads, state.epoch)
        opt_g_in = state.opt_g
        opt_g_in.hyperparams["learning_rate"] = lr_now
        g_updates, opt_g = self.tx.update(g_grads, opt_g_in, state.g)
        g_params = optax.apply_updates(state.g, g_updates)
        e_params, opt_e = state.e, state.opt_e
        if self.gen_features:
            opt_e_in = state.opt_e
            opt_e_in.hyperparams["learning_rate"] = lr_now
            e_updates, opt_e = self.tx.update(e_grads, opt_e_in, state.e)
            e_params = optax.apply_updates(state.e, e_updates)

        fake = jax.lax.stop_gradient(aux.pop("fake"))
        g_stats = aux.pop("g_stats")
        if g_stats is not None:
            g_stats = jax.lax.stop_gradient(g_stats)
        fake_concat = jnp.concatenate([input_label, fake], axis=-1)
        real_concat = jnp.concatenate([input_label, image], axis=-1)

        pool = state.pool
        if pool is not None:
            pool, fake_concat = push_and_pop(pool, fake_concat, k_pool)

        def d_loss_fn(dp):
            both = self._d_apply(
                dp, jnp.concatenate([fake_concat, real_concat], axis=0))
            nb = fake_concat.shape[0]
            loss_d_fake = gan_loss(jax.tree.map(lambda t: t[:nb], both),
                                   False, self.use_lsgan)
            loss_d_real = gan_loss(jax.tree.map(lambda t: t[nb:], both),
                                   True, self.use_lsgan)
            return (loss_d_fake + loss_d_real) * 0.5, (loss_d_fake, loss_d_real)

        (loss_d, (loss_d_fake, loss_d_real)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d)
        do_d = loss_d >= self.d_floor
        gate = do_d.astype(jnp.float32)
        opt_d_in = state.opt_d
        opt_d_in.hyperparams["learning_rate"] = lr_now
        d_updates, opt_d_new = self.tx.update(d_grads, opt_d_in, state.d)
        d_params = optax.apply_updates(
            state.d, jax.tree.map(lambda u: u * gate, d_updates))
        opt_d = jax.tree.map(lambda n, o: jnp.where(do_d, n, o), opt_d_new, opt_d_in)

        metrics = {
            "G_GAN": aux["G_GAN"], "G_GAN_Feat": aux["G_GAN_Feat"],
            "G_VGG": aux["G_VGG"],
            "D_real": loss_d_real, "D_fake": loss_d_fake,
            "loss_D": loss_d, "loss_G": aux["G_GAN"] + aux["G_GAN_Feat"] + aux["G_VGG"],
        }
        new_state = P2PState(g=g_params, d=d_params, opt_g=opt_g, opt_d=opt_d,
                             pool=pool, rng=rng, epoch=state.epoch,
                             e=e_params, opt_e=opt_e, g_stats=g_stats)
        return new_state, metrics, fake

    def next_epoch(self, state: P2PState) -> P2PState:
        return state._replace(epoch=state.epoch + 1)

    # -- inference -----------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def infer_step(self, g_params, label, inst=None, g_stats=None):
        """Parity with ``Pix2PixHDModel.inference`` (no-feature path).
        BatchNorm families (netG='multiscale') pass ``g_stats`` so eval uses
        running averages."""
        input_label = self.encode_input(label, inst)
        return self._g_apply(g_params, input_label, stats=g_stats)

    # -- int8 inference tier (the reference's --data_type 8 / TRT-int8 flow,
    #    p2pHD/test.py:45-48, run_engine.py:160-165) --------------------------
    def quantize_generator(self, g_params, g_stats=None):
        """Static int8 quantization of the generator's trunk for
        :meth:`infer_step_int8`. Families: global, local, UNet (instance
        norm), and multiscale (always BatchNorm per the define_G quirk —
        running stats folded into the int8 scales, ``g_stats`` required)."""
        from cistar_tpu.models import fast_infer as fi
        from cistar_tpu.ops.quant_pallas import quantize_global_trunk

        if self.net_g == "multiscale":
            # This family runs with the reference's BatchNorm DEFAULT
            # regardless of opt.norm (networks.py:40 vs :278). Inference BN
            # is a fixed affine, so it folds into the quantized scales.
            if g_stats is None:
                raise ValueError(
                    "multiscale int8 needs the generator's batch_stats "
                    "(pass g_stats; it is part of the checkpoint)")
            return fi.quantize_multiscale_global(g_params, g_stats,
                                                 self.n_blocks_global)
        if self.norm != "instance":
            # The int8 forwards apply instance_norm unconditionally; running
            # them against BatchNorm-trained params/stats would silently
            # produce garbage, so refuse instead.
            raise NotImplementedError(
                f"int8 inference engines assume instance norm; this generator "
                f"was built with norm='{self.norm}'. Run --data_type 16/32.")
        if self.net_g == "global":
            return quantize_global_trunk(g_params, self.n_blocks_global)
        if self.net_g == "local":
            return fi.quantize_local_enhancer(g_params, self.n_blocks_global)
        if self.net_g == "UNet":
            return fi.quantize_unet_msrb(g_params, self.n_blocks_global)
        raise NotImplementedError(
            f"no int8 inference engine for netG='{self.net_g}' "
            "(supported: global, local, UNet, multiscale; 'encoder' is the "
            "offline feature-precompute network — no deployment tier); "
            "run --data_type 16/32")

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def infer_step_int8(self, g_params, qblocks, label, expect_kernel=False,
                        inst=None, g_stats=None):
        """Quantized-engine inference: encode_input exactly as
        :meth:`infer_step`, then the int8-MXU forward for this G family
        (``models.fast_infer``). ``qblocks`` from :meth:`quantize_generator`.
        ``g_stats`` is required by the multiscale family only (BatchNorm
        running stats for the non-quantized bf16 layers; the trunk's BN is
        folded into ``qblocks``)."""
        from cistar_tpu.models import fast_infer as fi

        x = self.encode_input(label, inst).astype(self.cdt)
        if self.net_g == "global":
            out = fi.global_generator_int8_trunk_apply(
                g_params, qblocks, x,
                n_downsampling=self.n_downsample_global,
                n_blocks=self.n_blocks_global, expect_kernel=expect_kernel)
        elif self.net_g == "local":
            out = fi.local_enhancer_int8_apply(
                g_params, qblocks, x,
                n_downsample_global=self.n_downsample_global,
                n_blocks_global=self.n_blocks_global,
                n_local_enhancers=self.n_local_enhancers,
                n_blocks_local=self.n_blocks_local,
                expect_kernel=expect_kernel)
        elif self.net_g == "UNet":
            out = fi.unet_msrb_int8_apply(
                g_params, qblocks, x, n_blocks=self.n_blocks_global,
                expect_kernel=expect_kernel)
        elif self.net_g == "multiscale":
            out = fi.multiscale_global_int8_apply(
                g_params, qblocks, x, g_stats,
                n_blocks=self.n_blocks_global, expect_kernel=expect_kernel)
        else:
            raise NotImplementedError(
                f"no int8 inference engine for netG='{self.net_g}'")
        return out.astype(jnp.float32)

    @functools.partial(jax.jit, static_argnums=0)
    def infer_encoded(self, g_params, e_params, label, inst, image):
        """use_encoded_image inference: feat from netE over the real image
        (``pix2pixHD_model.py:210-214``)."""
        input_label = self.encode_input(label, inst)
        feat_map = self.E.apply({"params": e_params},
                                image.astype(jnp.float32),
                                self._pool_ids(label, inst),
                                self.max_instances)
        return self._g_apply(
            g_params, jnp.concatenate([input_label, feat_map], axis=-1))

    @functools.partial(jax.jit, static_argnums=0)
    def infer_with_features(self, g_params, label, inst, feat_map):
        """Feature-conditioned inference: G(input_label ‖ feat_map)
        (``pix2pixHD_model.py:212-228`` with use_features)."""
        input_label = self.encode_input(label, inst)
        return self._g_apply(
            g_params, jnp.concatenate([input_label, feat_map.astype(jnp.float32)],
                                      axis=-1))


def sample_features(inst: "np.ndarray", clusters: dict, feat_num: int,
                    rng=None):
    """Per-object style sampling from precomputed cluster centers — host-side
    parity with ``Pix2PixHDModel.sample_features`` (:230-249): for each
    instance id, pick a random cluster row of its label (``id//1000`` for ids
    ≥1000) and paint it over the object's pixels.
    """
    import numpy as np

    rng = rng or np.random
    if inst.ndim == 4:
        inst = inst[..., 0]
    n, h, w = inst.shape
    feat_map = np.zeros((n, h, w, feat_num), np.float32)
    for i in np.unique(inst.astype(int)):
        label = i if i < 1000 else i // 1000
        if label not in clusters:
            continue
        feat = clusters[label]
        row = feat[rng.randint(0, feat.shape[0])]
        mask = inst.astype(int) == i
        feat_map[mask] = row[:feat_num]
    return feat_map
