"""CycleGAN training/inference engine — one jitted SPMD train step.

Reference loop (``CycleGAN/train.py:171-272``): per batch, Python-side skip of
sparse radar frames (<300 points), a generator step (identity + GAN×10 +
cycle×2 losses over both directions), then two discriminator steps each gated
on ``loss_D > 0.1``, with 50-image replay buffers feeding D, Adam(lr 2e-4,
β=(0.5, 0.999)) ×3 and per-epoch linear LR decay (``LambdaLR``,
``CycleGAN/utils.py:116-124``).

TPU-native design: the ENTIRE step — both G updates, both D updates, replay
buffers, the data-dependent gates — is a single jitted function. The sparse
-frame skip and the D-loss floors become ``lax.cond``-style masked updates
(no retrace, no host sync); the replay pool lives on device; the batch axis is
sharded across the mesh with gradients reduced by XLA ``psum`` (the reference
uses single-process DataParallel — SURVEY.md §2.5).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from cistar_tpu.losses.gan import count_points, l1_loss, lsgan_loss
from cistar_tpu.models.cyclegan import PatchDiscriminator, build_generator
from cistar_tpu.utils.image_pool import PoolState, init_pool, push_and_pop


def lambda_lr_factor(epoch: jnp.ndarray, n_epochs: int, start_epoch: int,
                     decay_epoch: int) -> jnp.ndarray:
    """``LambdaLR.step`` (``CycleGAN/utils.py:116-124``): linear decay to 0
    from ``decay_epoch`` to ``n_epochs``."""
    if n_epochs <= decay_epoch:
        return jnp.asarray(1.0, jnp.float32)  # no decay phase (avoid 0/0)
    e = epoch.astype(jnp.float32)
    # floor at 0 so stepping past n_epochs can never flip the lr negative
    return jnp.maximum(
        0.0,
        1.0 - jnp.maximum(0.0, e + start_epoch - decay_epoch)
        / (n_epochs - decay_epoch))


class CycleGANState(NamedTuple):
    g_a2b: Any
    g_b2a: Any
    d_a: Any
    d_b: Any
    opt_g: Any
    opt_d_a: Any
    opt_d_b: Any
    pool_a: PoolState
    pool_b: PoolState
    rng: jax.Array
    epoch: jnp.ndarray   # int32, drives the LR schedule


class CycleGAN:
    """Builds params/optimizers and exposes jitted train/infer steps."""

    def __init__(
        self,
        gen_type: str = "bilinear_content",
        input_nc: int = 1,
        output_nc: int = 1,
        in_features: int = 16,
        n_residual_blocks: int = 6,
        dense_decoder: bool = True,
        lr: float = 2e-4,
        n_epochs: int = 10,
        start_epoch: int = 0,
        decay_epoch: int = 9,
        pool_size: int = 50,
        image_size: int = 512,
        batch_size: int = 4,
        cycle_criterion: Optional[Callable] = None,   # default L1; pass VGG content loss
        gan_weight: float = 10.0,
        cycle_weight: float = 2.0,
        identity_weight: float = 1.0,
        min_points: float = 300.0,
        d_loss_floor: float = 0.1,
        compute_dtype=jnp.bfloat16,
    ):
        self.G_a2b = build_generator(gen_type, output_nc, in_features,
                                     n_residual_blocks, dense_decoder)
        self.G_b2a = build_generator(gen_type, input_nc, in_features,
                                     n_residual_blocks, dense_decoder)
        self.D_a = PatchDiscriminator()
        self.D_b = PatchDiscriminator()
        self.gen_type = gen_type
        self.n_residual_blocks = n_residual_blocks
        self.dense_decoder = dense_decoder
        self.input_nc, self.output_nc = input_nc, output_nc
        self.lr, self.n_epochs = lr, n_epochs
        self.start_epoch, self.decay_epoch = start_epoch, decay_epoch
        self.pool_size, self.image_size, self.batch_size = pool_size, image_size, batch_size
        self.criterion = cycle_criterion or l1_loss
        self.gan_w, self.cycle_w, self.id_w = gan_weight, cycle_weight, identity_weight
        self.min_points, self.d_floor = min_points, d_loss_floor
        self.cdt = compute_dtype
        # Adam β matching the reference; LR injected per-epoch via the schedule.
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=lr, b1=0.5, b2=0.999)

    # -- state ---------------------------------------------------------------
    def init_state(self, rng: jax.Array, image_size: Optional[int] = None) -> CycleGANState:
        from cistar_tpu.core.initutil import conv_init, zeros_nhwc

        size = image_size or self.image_size
        r = jax.random.split(rng, 5)
        # fully-conv: init at a capped spatial size under one jit — params
        # are bit-identical to full-size init (core/initutil)
        xa = zeros_nhwc(size, self.input_nc)
        xb = zeros_nhwc(size, self.output_nc)
        g_a2b = conv_init(self.G_a2b, r[0], xa)["params"]
        g_b2a = conv_init(self.G_b2a, r[1], xb)["params"]
        d_a = conv_init(self.D_a, r[2], xa)["params"]
        d_b = conv_init(self.D_b, r[3], xb)["params"]
        return CycleGANState(
            g_a2b=g_a2b, g_b2a=g_b2a, d_a=d_a, d_b=d_b,
            opt_g=self.tx.init({"a2b": g_a2b, "b2a": g_b2a}),
            opt_d_a=self.tx.init(d_a),
            opt_d_b=self.tx.init(d_b),
            pool_a=init_pool(self.pool_size, (size, size, self.input_nc)),
            pool_b=init_pool(self.pool_size, (size, size, self.output_nc)),
            rng=r[4],
            epoch=jnp.asarray(self.start_epoch, jnp.int32),
        )

    # -- forward helpers -----------------------------------------------------
    def _gen(self, module, params, x):
        return module.apply({"params": params}, x.astype(self.cdt)).astype(jnp.float32)

    def _disc(self, module, params, x):
        return module.apply({"params": params}, x.astype(self.cdt)).astype(jnp.float32)

    # -- the jitted step -----------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: CycleGANState, real_a: jnp.ndarray,
                   real_b: jnp.ndarray) -> Tuple[CycleGANState, Dict[str, jnp.ndarray]]:
        rng, k_pool_a, k_pool_b = jax.random.split(state.rng, 3)
        do_step = count_points(real_a) >= self.min_points
        mask = do_step.astype(jnp.float32)

        lr_now = self.lr * lambda_lr_factor(
            state.epoch, self.n_epochs, self.start_epoch, self.decay_epoch)

        # ---- generator update ---------------------------------------------
        # Identity and translation passes through the same generator are
        # batched into one call (instance norm is per-sample, so results are
        # bit-identical to separate calls) — halves launch count and doubles
        # MXU batch utilization at the reference's small batch sizes.
        bs = real_a.shape[0]

        def g_loss_fn(gp):
            ab = self._gen(self.G_a2b, gp["a2b"],
                           jnp.concatenate([real_b, real_a], axis=0))
            same_b, fake_b = ab[:bs], ab[bs:]
            loss_id_b = self.criterion(same_b, real_b) * self.id_w
            ba = self._gen(self.G_b2a, gp["b2a"],
                           jnp.concatenate([real_a, real_b], axis=0))
            same_a, fake_a = ba[:bs], ba[bs:]
            loss_id_a = self.criterion(same_a, real_a) * self.id_w

            pred_fake_b = self._disc(self.D_b, state.d_b, fake_b)
            loss_gan_a2b = lsgan_loss(pred_fake_b, True) * self.gan_w
            pred_fake_a = self._disc(self.D_a, state.d_a, fake_a)
            loss_gan_b2a = lsgan_loss(pred_fake_a, True) * self.gan_w

            rec_a = self._gen(self.G_b2a, gp["b2a"], fake_b)
            loss_cyc_aba = self.criterion(rec_a, real_a) * self.cycle_w
            rec_b = self._gen(self.G_a2b, gp["a2b"], fake_a)
            loss_cyc_bab = self.criterion(rec_b, real_b) * self.cycle_w

            total = (loss_id_a + loss_id_b + loss_gan_a2b + loss_gan_b2a
                     + loss_cyc_aba + loss_cyc_bab)
            aux = {
                "fake_a": fake_a, "fake_b": fake_b,
                "loss_G": total,
                "loss_G_identity": loss_id_a + loss_id_b,
                "loss_G_GAN": loss_gan_a2b + loss_gan_b2a,
                "loss_G_cycle": loss_cyc_aba + loss_cyc_bab,
            }
            return total, aux

        g_params = {"a2b": state.g_a2b, "b2a": state.g_b2a}
        (_, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(g_params)
        # Sparse-frame skip: reference `continue`s before any optimizer work,
        # so both params and optimizer state must be untouched on skip.
        opt_g_in = state.opt_g
        opt_g_in.hyperparams["learning_rate"] = lr_now
        g_updates, opt_g_new = self.tx.update(g_grads, opt_g_in, g_params)
        g_params = optax.apply_updates(
            g_params, jax.tree.map(lambda u: u * mask, g_updates))
        opt_g = jax.tree.map(lambda n, o: jnp.where(do_step, n, o),
                             opt_g_new, opt_g_in)

        fake_a = jax.lax.stop_gradient(aux.pop("fake_a"))
        fake_b = jax.lax.stop_gradient(aux.pop("fake_b"))

        # ---- replay pools (updated only on active steps) -------------------
        def pool_update(pool, fakes, key):
            new_pool, out = push_and_pop(pool, fakes, key)
            keep = lambda a, b: jnp.where(do_step, a, b)
            return PoolState(keep(new_pool.images, pool.images),
                             keep(new_pool.size, pool.size)), out

        pool_a, fake_a_hist = pool_update(state.pool_a, fake_a, k_pool_a)
        pool_b, fake_b_hist = pool_update(state.pool_b, fake_b, k_pool_b)

        # ---- discriminator updates (gated on loss floor) -------------------
        def d_step(module, params, opt_state, real, fake_hist):
            def d_loss_fn(p):
                preds = self._disc(module, p,
                                   jnp.concatenate([real, fake_hist], axis=0))
                loss_real = lsgan_loss(preds[:real.shape[0]], True)
                loss_fake = lsgan_loss(preds[real.shape[0]:], False)
                return (loss_real + loss_fake) * 0.5

            loss_d, grads = jax.value_and_grad(d_loss_fn)(params)
            do_d = (loss_d > self.d_floor) & do_step
            gate = do_d.astype(jnp.float32)
            opt_in = opt_state
            opt_in.hyperparams["learning_rate"] = lr_now
            updates, opt_new = self.tx.update(grads, opt_in, params)
            new_params = optax.apply_updates(
                params, jax.tree.map(lambda u: u * gate, updates))
            opt = jax.tree.map(lambda n, o: jnp.where(do_d, n, o), opt_new, opt_in)
            return new_params, opt, loss_d

        d_a, opt_d_a, loss_d_a = d_step(self.D_a, state.d_a, state.opt_d_a,
                                        real_a, fake_a_hist)
        d_b, opt_d_b, loss_d_b = d_step(self.D_b, state.d_b, state.opt_d_b,
                                        real_b, fake_b_hist)

        metrics = {k: v for k, v in aux.items()}
        metrics.update({
            "loss_D_A": loss_d_a, "loss_D_B": loss_d_b,
            "loss_D": loss_d_a + loss_d_b,
            "skipped": 1.0 - mask,
        })

        new_state = CycleGANState(
            g_a2b=g_params["a2b"], g_b2a=g_params["b2a"], d_a=d_a, d_b=d_b,
            opt_g=opt_g, opt_d_a=opt_d_a, opt_d_b=opt_d_b,
            pool_a=pool_a, pool_b=pool_b, rng=rng, epoch=state.epoch,
        )
        return new_state, metrics

    def next_epoch(self, state: CycleGANState) -> CycleGANState:
        return state._replace(epoch=state.epoch + 1)

    # -- inference -----------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def infer_step(self, state: CycleGANState, real_a, real_b):
        """Parity with ``CycleGAN/test.py:141-145``: fake_B, fake_A, and
        recover_B = G_A2B(Normalize(0.5,0.5)(fake_A))."""
        fake_b = self._gen(self.G_a2b, state.g_a2b, real_a)
        fake_a = self._gen(self.G_b2a, state.g_b2a, real_b)
        renorm = (fake_a - 0.5) / 0.5
        recover_b = self._gen(self.G_a2b, state.g_a2b, renorm)
        return fake_b, fake_a, recover_b

    # -- int8 inference tier (TRT-int8 role, p2pHD/run_engine.py:160-165) ----
    def quantize_generators(self, state: CycleGANState):
        """Static int8 quantization of both generators' residual trunks for
        :meth:`infer_step_int8`. Family-dispatched like the reference's
        TRT int8 builder (any exported network, ``run_engine.py:160-165``):
        'p2p*' quantizes the dense ResNet trunk, 'bilinear*' the atrous res
        trunk, 'atrous*' and 'unet*' the plain res trunk between their
        encoders and skip-concat decoders (the skip activations stay bf16)."""
        from cistar_tpu.models.fast_infer import (quantize_bilinear_trunk,
                                                  quantize_multiscale_trunk,
                                                  quantize_unet_trunk)
        from cistar_tpu.ops.quant_pallas import quantize_resnet_trunk

        if self.gen_type.startswith("p2p"):
            fn = lambda p: quantize_resnet_trunk(p, self.n_residual_blocks)
        elif self.gen_type.startswith("bilinear"):
            fn = lambda p: quantize_bilinear_trunk(p, self.n_residual_blocks)
        elif self.gen_type.startswith("atrous"):
            fn = lambda p: quantize_multiscale_trunk(p, self.n_residual_blocks)
        elif self.gen_type.startswith("unet"):
            fn = lambda p: quantize_unet_trunk(p, self.n_residual_blocks)
        else:
            raise NotImplementedError(
                f"no int8 inference engine for gen_type='{self.gen_type}' "
                "(supported: p2p*, bilinear*, atrous*, unet*); "
                "use the bf16 path")
        return fn(state.g_a2b), fn(state.g_b2a)

    def _int8_fwd(self, params, q, x, expect_kernel: bool):
        from cistar_tpu.models import fast_infer as fi

        if self.gen_type.startswith("p2p"):
            return fi.resnet_generator_int8_trunk_apply(
                params, q, x, self.n_residual_blocks,
                expect_kernel=expect_kernel)
        if self.gen_type.startswith("bilinear"):
            return fi.bilinear_generator_int8_trunk_apply(
                params, q, x, self.n_residual_blocks,
                expect_kernel=expect_kernel)
        if self.gen_type.startswith("unet"):
            return fi.unet_generator_int8_trunk_apply(
                params, q, x, self.n_residual_blocks,
                expect_kernel=expect_kernel)
        return fi.multiscale_generator_int8_trunk_apply(
            params, q, x, self.n_residual_blocks,
            dense_decoder=self.dense_decoder, expect_kernel=expect_kernel)

    @functools.partial(jax.jit, static_argnums=(0, 5))
    def infer_step_int8(self, state: CycleGANState, q_a2b, q_b2a,
                        batch_ab, expect_kernel=False):
        """Quantized :meth:`infer_step`: fake_B, fake_A, recover_B with both
        generators' trunks on the int8 MXU (``models.fast_infer``)."""
        real_a, real_b = batch_ab

        def gen(params, q, x):
            return self._int8_fwd(params, q, x.astype(self.cdt),
                                  expect_kernel).astype(jnp.float32)

        fake_b = gen(state.g_a2b, q_a2b, real_a)
        fake_a = gen(state.g_b2a, q_b2a, real_b)
        recover_b = gen(state.g_a2b, q_a2b, (fake_a - 0.5) / 0.5)
        return fake_b, fake_a, recover_b

    def make_infer_fn(self, params_a2b):
        """Batched pure A→B inference fn (the throughput benchmark path)."""

        def fn(batch):
            return self.G_a2b.apply({"params": params_a2b},
                                    batch.astype(self.cdt))

        return fn

    # -- fleet-scale sharded inference (the v5e-8 deployment program) --------
    def make_sharded_infer(self, mesh, engine: str = "bf16",
                           expect_kernel: bool = False):
        """Batch-sharded SPMD inference program over ``mesh`` — the
        deployment unit behind the ≥10k img/s v5e-8 north star: parameters
        replicated, the batch axis split over the mesh's ``data`` axis, no
        collectives in the step (instance norm is per-sample). The whole
        body runs under ``shard_map`` so the int8 Pallas kernels execute
        per-device instead of tripping the SPMD partitioner on an opaque
        custom call.

        Returns a jitted positional function suitable for
        :func:`cistar_tpu.runtime.aot.save_compiled_sharded`:
        ``bf16``: ``f(g_a2b, g_b2a, a, b)``;
        ``int8``: ``f(g_a2b, g_b2a, q_a2b, q_b2a, a, b)`` —
        each returns ``(fake_b, fake_a, recover_b)``
        (``CycleGAN/test.py:141-145`` semantics). Fleet role of the
        reference's TRT engine driver, ``p2pHD/run_engine.py:134-173``.
        """
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        cdt = self.cdt

        if engine == "int8":
            from cistar_tpu.models.fast_infer import \
                resnet_generator_int8_trunk_apply as int8_fwd
            nrb = self.n_residual_blocks

            def body(g_a2b, g_b2a, q_a2b, q_b2a, a, b):
                def gen(p, q, x):
                    return int8_fwd(p, q, x.astype(cdt), nrb,
                                    expect_kernel=expect_kernel
                                    ).astype(jnp.float32)

                fake_b = gen(g_a2b, q_a2b, a)
                fake_a = gen(g_b2a, q_b2a, b)
                return fake_b, fake_a, gen(g_a2b, q_a2b, (fake_a - 0.5) / 0.5)

            in_specs = (P(), P(), P(), P(), P("data"), P("data"))
        else:

            def body(g_a2b, g_b2a, a, b):
                fake_b = self._gen(self.G_a2b, g_a2b, a)
                fake_a = self._gen(self.G_b2a, g_b2a, b)
                renorm = (fake_a - 0.5) / 0.5
                return fake_b, fake_a, self._gen(self.G_a2b, g_a2b, renorm)

            in_specs = (P(), P(), P("data"), P("data"))

        sharded = shard_map(body, mesh=mesh, in_specs=in_specs,
                            out_specs=P("data"), check_vma=False)
        dsh = NamedSharding(mesh, P("data"))
        rsh = NamedSharding(mesh, P())
        n_repl = len(in_specs) - 2
        return jax.jit(sharded,
                       in_shardings=(rsh,) * n_repl + (dsh, dsh),
                       out_shardings=(dsh, dsh, dsh))
