"""CycleGAN inference CLI — parity with ``CycleGAN/test.py``.

Loads a generator pair, runs the test split, writes recovered-lidar PNGs and
5-panel comparison strips (fake_lidar | real_radar | real_lidar | fake_radar |
recover_lidar — ``CycleGAN/test.py:132,147``). Inference is batched and
AOT-compiled; this is the throughput configuration of the headline benchmark.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batchSize", type=int, default=1)
    p.add_argument("--dataroot", type=str, required=True)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--input_nc", type=int, default=1)
    p.add_argument("--output_nc", type=int, default=1)
    p.add_argument("--gen_type", type=str, default="p2p-content")
    p.add_argument("--dense_decoder", type=lambda s: s != "False", default=True)
    p.add_argument("--model_dir", type=str, required=True,
                   help="dir containing netG_A2B.npz / netG_B2A.npz")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--engine", default="default", choices=["default", "int8"],
                   help="int8 = quantized res-trunk MXU engine (p2p* "
                   "generators; the TRT-int8-role fast tier)")
    p.add_argument("--compile_timeout", type=float, default=None,
                   help="abort if the first inference is still compiling "
                        "after this many seconds (default: no limit, env "
                        "CISTAR_COMPILE_TIMEOUT)")
    p.add_argument("--shard", action="store_true",
                   help="batch-shard inference over ALL visible devices "
                        "(jax.sharding mesh; the v5e-8 fleet configuration "
                        "— params replicated, batch split over ICI)")
    p.add_argument("--export_engine", type=str, default="",
                   help="AOT-export the (sharded) inference program to this "
                        "path and exit — the TPU-native TensorRT-engine-"
                        "build role (run_engine.py:160-173); requires "
                        "--batchSize divisible by the device count")
    p.add_argument("--engine_file", type=str, default="",
                   help="run a previously exported program instead of "
                        "jitting (TRT load_engine role, run_engine.py:104); "
                        "must match the current device count and batch size")
    p.add_argument("--platform", default="", choices=["", "cpu", "tpu", "axon"],
                   help="force a JAX platform (the baked sitecustomize pins the TPU)")
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
    from cistar_tpu.data.transforms import array_to_pil, denormalize
    from cistar_tpu.engines.cyclegan import CycleGAN
    from cistar_tpu.utils.metrics import save_image_grid

    engine = CycleGAN(
        gen_type=args.gen_type, input_nc=args.input_nc, output_nc=args.output_nc,
        in_features=16, image_size=args.size, batch_size=args.batchSize,
        dense_decoder=args.dense_decoder,
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
    )
    state = engine.init_state(jax.random.PRNGKey(0), image_size=args.size)
    state = ckpt.load_cyclegan_state(args.model_dir, state)

    sharded = args.shard or args.export_engine or args.engine_file
    if sharded:
        from jax.sharding import PartitionSpec as P

        from cistar_tpu.parallel.sharding import make_mesh
        from cistar_tpu.runtime.aot import (load_compiled_sharded,
                                            save_compiled_sharded)

        mesh = make_mesh()
        n_dev = mesh.devices.size
        if args.batchSize % n_dev:
            raise SystemExit(f"--batchSize {args.batchSize} must divide the "
                             f"device count {n_dev} for --shard/--export_engine")
        if args.engine == "int8":
            q_a2b, q_b2a = engine.quantize_generators(state)
            print("int8 engine: quantized both generators' residual trunks")
            extra = (state.g_a2b, state.g_b2a, q_a2b, q_b2a)
        else:
            extra = (state.g_a2b, state.g_b2a)
        specs = (P(),) * len(extra) + (P("data"), P("data"))
        program = engine.make_sharded_infer(mesh, engine=args.engine)
        if args.export_engine:
            za = jnp.zeros((args.batchSize, args.size, args.size,
                            args.input_nc), jnp.float32)
            zb = jnp.zeros((args.batchSize, args.size, args.size,
                            args.output_nc), jnp.float32)
            nbytes = save_compiled_sharded(
                program, extra + (za, zb), args.export_engine)
            print(f"exported {n_dev}-device {args.engine} inference program "
                  f"(batch {args.batchSize}, {args.size}^2) to "
                  f"{args.export_engine} ({nbytes} bytes)")
            return
        if args.engine_file:
            program = load_compiled_sharded(args.engine_file, mesh, specs)
            print(f"loaded serialized {n_dev}-device program from "
                  f"{args.engine_file}")
        infer = lambda a, b: program(*extra, a, b)
        print(f"sharded inference over {n_dev} device(s): batch axis split "
              f"across the 'data' mesh axis, params replicated")
    elif args.engine == "int8":
        q_a2b, q_b2a = engine.quantize_generators(state)
        print("int8 engine: quantized both generators' residual trunks")
        infer = lambda a, b: engine.infer_step_int8(state, q_a2b, q_b2a,
                                                    (a, b))
    else:
        infer = lambda a, b: engine.infer_step(state, a, b)

    save_dir = os.path.join(args.model_dir, "img_gen_test_rec")
    os.makedirs(save_dir, exist_ok=True)

    from cistar_tpu.core.compile_guard import CompileWatchdog

    dataset = CycleGANImageDataset(args.dataroot, size=args.size, mode="test")
    loader = Loader(dataset, args.batchSize)
    watchdog = CompileWatchdog("inference step",
                               timeout=args.compile_timeout).start()
    try:
        for i, batch in enumerate(loader):
            a = jnp.asarray(batch["A"])
            b = jnp.asarray(batch["B"])
            n0 = a.shape[0]
            if sharded and n0 != args.batchSize:
                # pad the tail batch: sharded/serialized programs are fixed
                # shape (batch must divide the mesh); extra rows are dropped
                pad = [(0, args.batchSize - n0)] + [(0, 0)] * (a.ndim - 1)
                a = jnp.pad(a, pad, mode="edge")
                b = jnp.pad(b, pad, mode="edge")
            fake_b, fake_a, rec_b = infer(a, b)
            if i == 0:
                jax.block_until_ready(rec_b)
                watchdog.done()
            for j in range(n0):
                name = batch["name"][j]
                arr = np.clip(denormalize(np.asarray(rec_b[j])), 0, 1)
                array_to_pil(arr).save(os.path.join(save_dir, name))
                save_image_grid(
                    {"fake_lidar": np.asarray(fake_b[j]), "real_radar": batch["A"][j],
                     "real_lidar": batch["B"][j], "fake_radar": np.asarray(fake_a[j]),
                     "recover_lidar": np.asarray(rec_b[j])},
                    os.path.join(save_dir, "panel_" + name))
            sys.stdout.write(f"\rGenerated images {i + 1:05d} of {len(loader):05d}")
    finally:
        # An empty test split (or a loader failure) must not leave the
        # watchdog's daemon thread armed — it would os._exit(3) with a
        # misleading "still compiling" message and skip output flushes.
        watchdog.done()
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
