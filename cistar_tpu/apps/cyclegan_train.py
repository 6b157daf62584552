"""CycleGAN training CLI — parity with ``CycleGAN/train.py``.

Same flags and defaults as the reference argparse block
(``CycleGAN/train.py:24-42``); the training loop drives the single jitted
SPMD train step (sparse-frame skip, D-loss gates, replay buffers all compiled
in), shards the batch across the device mesh, and writes per-epoch + latest
checkpoints in Orbax-compatible ``.npz`` form alongside loss logs.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epoch", type=int, default=0, help="starting epoch")
    p.add_argument("--n_epochs", type=int, default=10)
    p.add_argument("--batchSize", type=int, default=4)
    p.add_argument("--dataroot", type=str, required=True,
                   help="root with radar/ and lidar/ png dirs")
    p.add_argument("--lr", type=float, default=0.0002)
    p.add_argument("--decay_epoch", type=int, default=9)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--input_nc", type=int, default=1)
    p.add_argument("--output_nc", type=int, default=1)
    p.add_argument("--n_cpu", type=int, default=8)
    p.add_argument("--gen_type", type=str, default="bilinear_content")
    p.add_argument("--output_dir", type=str, default="./thesis/")
    p.add_argument("--content_loss", action="store_true",
                   help="VGG16 content loss for cycle/identity instead of L1")
    p.add_argument("--dense_decoder", type=lambda s: s != "False", default=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--platform", default="", choices=["", "cpu", "tpu", "axon"],
                   help="force a JAX platform (the baked sitecustomize pins the TPU)")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--min_points", type=float, default=300.0,
                   help="sparse-radar-frame skip threshold (reference value "
                        "300 is calibrated for 512^2 frames)")
    p.add_argument("--compile_timeout", type=float, default=None,
                   help="abort if the first train step is still compiling "
                        "after this many seconds (default: no limit, env "
                        "CISTAR_COMPILE_TIMEOUT)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms",
                          "axon" if args.platform == "tpu" else args.platform)
    from cistar_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from cistar_tpu.core import checkpoint as ckpt
    from cistar_tpu.data.datasets import CycleGANImageDataset, Loader
    from cistar_tpu.engines.cyclegan import CycleGAN
    from cistar_tpu.losses.perceptual import make_content_criterion
    from cistar_tpu.parallel.sharding import make_mesh, pad_batch_to_multiple, shard_batch
    from cistar_tpu.utils.metrics import MetricsLogger

    output_dir = args.output_dir + "_" + args.gen_type
    os.makedirs(output_dir, exist_ok=True)

    criterion = make_content_criterion() if args.content_loss else None
    engine = CycleGAN(
        gen_type=args.gen_type, input_nc=args.input_nc, output_nc=args.output_nc,
        in_features=16, lr=args.lr, n_epochs=args.n_epochs,
        start_epoch=args.epoch, decay_epoch=args.decay_epoch,
        image_size=args.size, batch_size=args.batchSize,
        dense_decoder=args.dense_decoder, cycle_criterion=criterion,
        min_points=args.min_points,
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
    )
    state = engine.init_state(jax.random.PRNGKey(0), image_size=args.size)
    if args.resume:
        state = ckpt.load_cyclegan_state(output_dir, state)
        print("resumed from", output_dir)

    mesh = make_mesh()
    n_dev = mesh.devices.size

    dataset = CycleGANImageDataset(args.dataroot, size=args.size,
                                   unaligned=True, mode="train")
    loader = Loader(dataset, args.batchSize, shuffle=False)
    logger = MetricsLogger(output_dir, args.n_epochs, len(loader),
                           start_epoch=args.epoch, log_every=args.log_every)

    from cistar_tpu.core.compile_guard import CompileWatchdog

    watchdog = CompileWatchdog("CycleGAN train step",
                               timeout=args.compile_timeout).start()
    first_step = True
    cached_step, cached_shape = None, None
    step_key = repr(sorted((k, repr(v)) for k, v in vars(args).items()
                           if k not in {"dataroot", "output_dir", "resume",
                                        "log_every", "compile_timeout"}))
    try:
        for epoch in range(args.epoch, args.n_epochs):
            for batch in loader:
                arrs = {"A": batch["A"], "B": batch["B"]}
                arrs, _ = pad_batch_to_multiple(arrs, n_dev)
                dev_batch = shard_batch(arrs, mesh)
                if cached_step is None:
                    # disk-backed executable cache — fresh processes skip
                    # the multi-minute XLA compile (core.cache)
                    from cistar_tpu.core.cache import exec_cache_compile

                    cached_step = exec_cache_compile(
                        type(engine).train_step,
                        (engine, state, dev_batch["A"], dev_batch["B"]),
                        key="cyclegan_train:" + step_key)
                    cached_shape = dev_batch["A"].shape
                if dev_batch["A"].shape == cached_shape:
                    state, metrics = cached_step(state, dev_batch["A"],
                                                 dev_batch["B"])
                else:  # padded tail batch: plain jit path
                    state, metrics = engine.train_step(state, dev_batch["A"],
                                                       dev_batch["B"])
                if first_step:
                    jax.device_get(metrics)  # make the watchdog window honest
                    watchdog.done()
                    first_step = False
                logger.log({k: v for k, v in metrics.items()},
                           n_images=arrs["A"].shape[0])
            logger.end_epoch()
            state = engine.next_epoch(state)
            ckpt.save_cyclegan_state(output_dir, state, epoch=epoch)
            print(f"saved checkpoints for epoch {epoch}")
    finally:
        watchdog.done()  # empty dataset / loader failure must disarm the timer


if __name__ == "__main__":
    main()
