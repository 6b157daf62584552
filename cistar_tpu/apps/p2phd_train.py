"""pix2pixHD training CLI — parity with ``p2pHD/train.py``.

Resume from ``iter.txt``, debug-mode shrink, periodic print/save, 'latest' +
per-epoch checkpoints, ``update_fixed_params`` schedule and linear LR decay —
with the whole train step (G, multiscale D, feature matching, optional VGG
loss, D-loss gate) compiled to one SPMD program, batch sharded over the mesh.

Usage (radar defaults mirror the shipped ``r2l_MSRB*`` configs):
  python -m cistar_tpu.apps.p2phd_train --name r2l_MSRB --r2l --no_instance \
      --label_nc 0 --input_nc 1 --output_nc 1 --netG UNet --ngf 64 \
      --n_blocks_global 3 --num_D 2 --no_vgg_loss --dataroot DIR
  python -m cistar_tpu.apps.p2phd_train --load_opt path/to/opt.txt --dataroot DIR
"""

from __future__ import annotations

import os


def _opt_fingerprint(opt) -> str:
    """Stable fingerprint of every option that can shape the compiled train
    step. Output paths / logging cadence / host-side knobs are excluded so
    renaming an experiment doesn't force a recompile; anything unknown is
    INCLUDED (a false miss only costs one compile, a false hit would run the
    wrong program)."""
    skip = {"name", "dataroot", "checkpoints_dir", "results_dir",
            "load_opt", "load_pretrain", "which_epoch", "continue_train",
            "display_freq", "display_winsize", "print_freq",
            "save_latest_freq", "save_epoch_freq", "nThreads", "how_many",
            "compile_timeout", "serial_batches", "no_flip", "tf_log",
            "no_html", "debug", "max_dataset_size", "phase", "gpu_ids",
            "verbose", "isTrain"}
    items = sorted((k, repr(v)) for k, v in vars(opt).items()
                   if k not in skip)
    return repr(items)


def main(argv=None):
    from cistar_tpu.apps.p2phd_options import TrainOptions

    opt = TrainOptions().parse(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.core import checkpoint as ckpt
    from cistar_tpu.data.datasets import Loader, Radar2LidarDataset
    from cistar_tpu.engines.p2phd import Pix2PixHD
    from cistar_tpu.losses.perceptual import make_vgg_loss
    from cistar_tpu.parallel.sharding import make_mesh, pad_batch_to_multiple, shard_batch
    from cistar_tpu.utils.metrics import MetricsLogger

    save_dir = os.path.join(opt.checkpoints_dir, opt.name)
    os.makedirs(save_dir, exist_ok=True)

    start_epoch, epoch_iter = 1, 0
    if opt.continue_train:
        start_epoch, epoch_iter = ckpt.load_iter(save_dir)
        print(f"Resuming from epoch {start_epoch} at iteration {epoch_iter}")

    if opt.debug:
        opt.display_freq = opt.print_freq = opt.niter = opt.niter_decay = 1
        opt.max_dataset_size = 10

    if opt.uda:
        return _train_uda(opt, save_dir, start_epoch)

    size = opt.r2l_res if opt.r2l else opt.fineSize
    vgg_criterion = None if opt.no_vgg_loss else make_vgg_loss()
    spatial_mesh = None
    if opt.spatial_shard:
        from jax.sharding import Mesh as _Mesh

        devs = np.asarray(jax.devices())
        spatial_mesh = _Mesh(devs, ("spatial",))
        print(f"spatial sharding: generator H axis split over "
              f"{devs.size} device(s) (halo-exchange convs, psum IN)")
    engine = Pix2PixHD(
        spatial_mesh=spatial_mesh,
        net_g=opt.netG, input_nc=opt.input_nc, output_nc=opt.output_nc,
        label_nc=opt.label_nc, ngf=opt.ngf, ndf=opt.ndf,
        n_downsample_global=opt.n_downsample_global,
        n_blocks_global=opt.n_blocks_global,
        n_local_enhancers=opt.n_local_enhancers,
        n_blocks_local=opt.n_blocks_local,
        n_layers_d=opt.n_layers_D, num_d=opt.num_D, norm=opt.norm,
        no_instance=opt.no_instance, r2l=opt.r2l,
        use_lsgan=not opt.no_lsgan, lambda_feat=opt.lambda_feat,
        use_ganfeat_loss=not opt.no_ganFeat_loss, vgg_criterion=vgg_criterion,
        lr=opt.lr, beta1=opt.beta1, niter=opt.niter, niter_decay=opt.niter_decay,
        niter_fix_global=opt.niter_fix_global, pool_size=opt.pool_size,
        image_size=size,
        # bf16 is the shipped default (VERDICT r4 #2; parity evidence in
        # benchmarks/bf16_train_overlay.json). --compute fp32 opts out;
        # the reference-parity flags (--fp16 / --data_type 16) force bf16.
        compute_dtype=jnp.float32 if (getattr(opt, "compute", "bf16") == "fp32"
                                      and not (opt.fp16 or opt.data_type == 16))
        else jnp.bfloat16,
    )
    state = engine.init_state(jax.random.PRNGKey(0), image_size=size)
    if opt.continue_train or opt.load_pretrain:
        pre = opt.load_pretrain or save_dir
        state = state._replace(
            g=ckpt.load_network(pre, "G", opt.which_epoch, state.g),
            d=ckpt.load_network(pre, "D", opt.which_epoch, state.d))
        if state.g_stats is not None:
            # BatchNorm G families (netG=multiscale) save EMA running stats
            # alongside the params; a resume that drops them would silently
            # re-warm the averages and skew post-resume eval/inference
            stats_path = os.path.join(
                pre, f"{opt.which_epoch}_net_G_stats.npz")
            if os.path.exists(stats_path):
                state = state._replace(g_stats=ckpt.load_network(
                    pre, "G_stats", opt.which_epoch, state.g_stats))
            else:
                print(f"warning: {stats_path} not found; BatchNorm running "
                      "stats re-warm from init", flush=True)
        print("loaded networks from", pre)

    mesh = make_mesh()
    n_dev = mesh.devices.size

    dataset = Radar2LidarDataset(opt.dataroot, size=size, mode="train")
    if opt.max_dataset_size != float("inf"):
        dataset.radar = dataset.radar[: int(opt.max_dataset_size)]
        dataset.lidar = dataset.lidar[: int(opt.max_dataset_size)]
    loader = Loader(dataset, opt.batchSize, shuffle=not opt.serial_batches)
    logger = MetricsLogger(save_dir, opt.niter + opt.niter_decay, len(loader),
                           start_epoch=start_epoch, log_every=max(1, opt.print_freq))

    print(f"#training images = {len(dataset)}", flush=True)

    import time as _time

    from cistar_tpu.core.compile_guard import CompileWatchdog

    _t_first = _time.time()
    first_step = True
    watchdog = CompileWatchdog("p2pHD train step",
                               timeout=opt.compile_timeout).start()
    total_iter = (start_epoch - 1) * len(dataset) + epoch_iter
    _cached_step, _cached_shape = None, None
    if len(dataset) == 0:
        # nothing will ever reach the first-step done(); disarm so the
        # checkpoint-saving epoch loop below can't trip a bogus timeout
        watchdog.done()
    for epoch in range(start_epoch, opt.niter + opt.niter_decay + 1):
        # derive the new epoch scalar FROM the existing leaf so its
        # placement/sharding/dtype are inherited — a fresh host scalar in an
        # otherwise device-resident state changes the jit signature and
        # recompiles the whole step every epoch (~80 s each on the tunneled
        # backend), while committing it to one device breaks mesh runs
        state = state._replace(
            epoch=(state.epoch * 0 + (epoch - 1)).astype(jnp.int32))
        for batch in loader:
            arrs = {"label": batch["label"], "image": batch["image"]}
            if spatial_mesh is None:
                arrs, _ = pad_batch_to_multiple(arrs, n_dev)
                dev = shard_batch(arrs, mesh)
            else:
                # devices are spent on the SPATIAL axis; the batch stays
                # whole and the G forward reshards H inside the step
                dev = {k: jnp.asarray(v) for k, v in arrs.items()}
            if _cached_step is None:
                # Disk-backed EXECUTABLE cache: on this backend the XLA
                # persistent cache is unusable, so a fresh process repaid
                # the full train-step compile (~4 min for the shipped 512²
                # UNet-MSRB recipe). The first process serializes the
                # compiled step; later ones load it in ~0.1 s (core.cache).
                from cistar_tpu.core.cache import exec_cache_compile

                _cached_step = exec_cache_compile(
                    type(engine).train_step,
                    (engine, state, dev["label"], None, dev["image"]),
                    key="p2phd_train:" + _opt_fingerprint(opt))
                _cached_shape = dev["label"].shape
            if dev["label"].shape == _cached_shape:
                state, metrics, _fake = _cached_step(
                    state, dev["label"], None, dev["image"])
            else:  # padded tail batch of a different shape: plain jit path
                state, metrics, _fake = engine.train_step(
                    state, dev["label"], None, dev["image"])
            if first_step:
                # force the compile+execute to finish so the message is honest
                jax.device_get(metrics)
                watchdog.done()
                print(f"first step done (compile+run "
                      f"{_time.time() - _t_first:.1f}s)", flush=True)
                first_step = False
            total_iter += opt.batchSize
            logger.log({k: v for k, v in metrics.items()},
                       n_images=arrs["label"].shape[0])
            if total_iter % opt.save_latest_freq < opt.batchSize:
                ckpt.save_network(save_dir, "G", "latest", state.g)
                ckpt.save_network(save_dir, "D", "latest", state.d)
                if state.g_stats is not None:  # keep resume-loadable mid-epoch
                    ckpt.save_network(save_dir, "G_stats", "latest",
                                      state.g_stats)
                ckpt.save_iter(save_dir, epoch, total_iter)
        logger.end_epoch()
        ckpt.save_network(save_dir, "G", "latest", state.g)
        ckpt.save_network(save_dir, "D", "latest", state.d)
        if state.g_stats is not None:  # BatchNorm G families (multiscale)
            ckpt.save_network(save_dir, "G_stats", "latest", state.g_stats)
        ckpt.save_iter(save_dir, epoch + 1, 0)
        if epoch % opt.save_epoch_freq == 0:
            ckpt.save_network(save_dir, "G", epoch, state.g)
            ckpt.save_network(save_dir, "D", epoch, state.d)
            if state.g_stats is not None:
                ckpt.save_network(save_dir, "G_stats", epoch, state.g_stats)
            print(f"saved model at end of epoch {epoch}")


def _train_uda(opt, save_dir, start_epoch):
    """UDA training loop (parity: ``p2pHD/train.py`` with ``--uda``):
    dispatches by ``--training_module`` to the R2LAE shared-encoder trainer or
    the standalone Wasserstein image critic."""
    import jax
    import jax.numpy as jnp

    from cistar_tpu.core import checkpoint as ckpt
    from cistar_tpu.data.datasets import Loader, UDADataset
    from cistar_tpu.engines.factory import create_uda_model
    from cistar_tpu.parallel.sharding import make_mesh, pad_batch_to_multiple, shard_batch
    from cistar_tpu.utils.metrics import MetricsLogger

    engine = create_uda_model(opt)
    state = engine.init_state(jax.random.PRNGKey(0), opt.r2l_res) \
        if opt.training_module == "discriminator" else \
        engine.init_state(jax.random.PRNGKey(0), size=opt.r2l_res)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    dataset = UDADataset(opt.dataroot, size=opt.r2l_res, mode="train")
    loader = Loader(dataset, opt.batchSize, shuffle=not opt.serial_batches)
    logger = MetricsLogger(save_dir, opt.niter + opt.niter_decay, len(loader),
                           start_epoch=start_epoch,
                           log_every=max(1, opt.print_freq))

    for epoch in range(start_epoch, opt.niter + opt.niter_decay + 1):
        for batch in loader:
            arrs = {"radar": batch["radar"], "lidar": batch["lidar"]}
            arrs, _ = pad_batch_to_multiple(arrs, n_dev)
            dev = shard_batch(arrs, mesh)
            if opt.training_module == "discriminator":
                state, metrics = engine.train_step(state, dev["lidar"], dev["radar"])
            else:
                state, metrics, _fakes = engine.train_step(
                    state, dev["radar"], dev["lidar"])
            logger.log({k: v for k, v in metrics.items()},
                       n_images=arrs["radar"].shape[0])
        logger.end_epoch()
        if opt.training_module == "discriminator":
            ckpt.save_network(save_dir, "img_D", "latest", state.d)
        else:
            for label, field in (("E", "e"), ("DF", "df"), ("DR", "dr"),
                                 ("DL", "dl"), ("GL", "g_lidar"),
                                 ("GR", "g_radar")):
                ckpt.save_network(save_dir, label, "latest",
                                  getattr(state, field))
        if epoch % opt.save_epoch_freq == 0:
            print(f"saved UDA model at end of epoch {epoch}")


if __name__ == "__main__":
    main()
