"""pix2pixHD inference CLI — parity with ``p2pHD/test.py``.

Batch-1 serial inference over the test split, HTML gallery of
input/synthesized/real triplets (``test.py:82-89``), and the deployment path:
``--export_onnx PATH`` AOT-compiles and serializes the generator executable
(the TPU-native replacement for ONNX export), ``--engine PATH`` loads and runs
a serialized executable with per-run profiling (replacing the TensorRT
engine driver ``run_engine.py``).
"""

from __future__ import annotations

import os
import time


def main(argv=None):
    from cistar_tpu.apps.p2phd_options import TestOptions

    opt = TestOptions().parse(argv, save=False)
    opt.nThreads = 1
    opt.batchSize = 1
    opt.serial_batches = True
    opt.no_flip = True

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.core import checkpoint as ckpt
    from cistar_tpu.data.datasets import Loader, Radar2LidarDataset
    from cistar_tpu.data.transforms import array_to_pil, denormalize
    from cistar_tpu.engines.p2phd import Pix2PixHD
    from cistar_tpu.runtime.aot import load_compiled, save_compiled, profile_fn
    from cistar_tpu.utils.metrics import HTMLGallery

    size = opt.r2l_res if opt.r2l else opt.fineSize
    spatial_mesh = None
    if opt.spatial_shard:
        import numpy as _np
        from jax.sharding import Mesh as _Mesh

        devs = _np.asarray(jax.devices())
        spatial_mesh = _Mesh(devs, ("spatial",))
        if opt.data_type == 8:
            raise SystemExit("--spatial_shard and --data_type 8 are separate "
                             "tiers (the int8 kernels run whole-image)")
        print(f"spatial sharding: generator H axis split over "
              f"{devs.size} device(s) (halo-exchange convs, psum IN)")
    engine = Pix2PixHD(
        spatial_mesh=spatial_mesh,
        net_g=opt.netG, input_nc=opt.input_nc, output_nc=opt.output_nc,
        label_nc=opt.label_nc, ngf=opt.ngf,
        n_downsample_global=opt.n_downsample_global,
        n_blocks_global=opt.n_blocks_global,
        n_local_enhancers=opt.n_local_enhancers,
        n_blocks_local=opt.n_blocks_local, norm=opt.norm,
        no_instance=opt.no_instance, r2l=opt.r2l, image_size=size,
        # data_type 8 = int8 trunk engine (non-quantized layers run bf16)
        compute_dtype=jnp.bfloat16
        if (opt.fp16 or opt.data_type in (8, 16)) else jnp.float32,
    )
    state = engine.init_state(jax.random.PRNGKey(0), image_size=size)
    save_dir = os.path.join(opt.checkpoints_dir, opt.name)
    g_params = ckpt.load_network(save_dir, "G", opt.which_epoch, state.g)
    g_stats = None
    if state.g_stats is not None:  # BatchNorm G families (multiscale)
        g_stats = ckpt.load_network(save_dir, "G_stats", opt.which_epoch,
                                    state.g_stats)
    qblocks = None
    if opt.data_type == 8:
        # the reference's int8 tier (test.py:45-48 → TRT int8 engines,
        # run_engine.py:160-165): statically quantize the trunk once, then
        # every inference below runs the int8-MXU forward
        qblocks = engine.quantize_generator(g_params, g_stats=g_stats)
        print(f"int8 engine: quantized {len(qblocks)} trunk blocks "
              f"(netG={opt.netG})")

    web_dir = os.path.join(opt.results_dir, opt.name,
                           f"{opt.phase}_{opt.which_epoch}")
    gallery = HTMLGallery(web_dir, f"Experiment = {opt.name}, "
                          f"Phase = {opt.phase}, Epoch = {opt.which_epoch}")

    # what the dataset actually yields: 1-channel label-id maps in semantic
    # mode and grayscale radar in r2l mode (encode_input one-hots inside the
    # traced program), full input_nc only for plain image-conditional G
    label_ch = 1 if (opt.r2l or opt.label_nc > 0) else opt.input_nc
    example = jnp.zeros((1, size, size, label_ch), jnp.float32)

    if opt.export_onnx:
        if qblocks is not None:
            save_compiled(lambda label: engine.infer_step_int8(
                g_params, qblocks, label), (example,), opt.export_onnx)
        else:
            save_compiled(lambda label: engine.infer_step(
                g_params, label, g_stats=g_stats), (example,), opt.export_onnx)
        print("AOT-serialized generator executable ->", opt.export_onnx)
        return

    if opt.engine or opt.onnx:
        path = opt.engine or opt.onnx
        run = load_compiled(path)
        stats = profile_fn(lambda x: run(x), example, iters=100)
        print(f"engine {path}: {stats['mean_ms']:.3f} ms/iter "
              f"(p50 {stats['p50_ms']:.3f}, p95 {stats['p95_ms']:.3f})")
        # per-op device-time table — the TRT Profiler printout
        # (run_engine.py:35-59,112-117)
        from cistar_tpu.runtime.profiler import (format_op_table,
                                                 profile_op_table)

        try:
            rows, totals = profile_op_table(run, example, iters=10)
            print(format_op_table(rows, totals))
        except Exception as e:  # backend without trace support
            print(f"(per-op trace unavailable: {e})")
        infer = run
    elif qblocks is not None:
        infer = lambda label: engine.infer_step_int8(g_params, qblocks, label,
                                                     g_stats=g_stats)
    else:
        infer = lambda label: engine.infer_step(g_params, label,
                                                g_stats=g_stats)

    if opt.r2l:
        dataset = Radar2LidarDataset(opt.dataroot, size=size, mode="test")
    else:
        # semantic/aligned mode (reference dispatch:
        # custom_dataset_data_loader.py:5-19)
        from cistar_tpu.data.aligned import AlignedDataset

        dataset = AlignedDataset(opt)
    from cistar_tpu.core.compile_guard import CompileWatchdog

    loader = Loader(dataset, 1)
    watchdog = CompileWatchdog("inference step",
                               timeout=opt.compile_timeout).start()
    try:
        _p2phd_test_loop(opt, loader, watchdog, infer, qblocks, engine,
                         g_params, g_stats, gallery)
    finally:
        watchdog.done()  # empty split / loader failure must disarm the timer
    gallery.save()


def _p2phd_test_loop(opt, loader, watchdog, infer, qblocks, engine,
                     g_params, g_stats, gallery):
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.data.transforms import array_to_pil, denormalize

    warned_engine_bypass = False
    for i, batch in enumerate(loader):
        if i >= opt.how_many:
            break
        label = jnp.asarray(batch["label"])
        inst = (jnp.asarray(batch["inst"]) if batch["inst"].ndim == 4
                else None)
        if inst is not None and (opt.engine or opt.onnx) \
                and not warned_engine_bypass:
            # the serialized executable was exported label-only; be explicit
            # rather than silently profiling one path and rendering another
            print("note: instance maps present — gallery images use the JIT "
                  "path, not the loaded engine (export with instance inputs "
                  "to profile that path)")
            warned_engine_bypass = True
        if inst is None:
            fake = np.asarray(infer(label))
        elif qblocks is not None:
            fake = np.asarray(engine.infer_step_int8(g_params, qblocks,
                                                     label, inst=inst,
                                                     g_stats=g_stats))
        else:
            fake = np.asarray(engine.infer_step(g_params, label, inst,
                                                g_stats=g_stats))
        watchdog.done()  # np.asarray above is a synchronizing fetch
        name = os.path.splitext(os.path.basename(batch["path"][0]))[0]
        ims, txts, links = [], [], []
        tiles = [("input_label", batch["label"][0]),
                 ("synthesized_image", fake[0])]
        if batch["image"].ndim == 4:  # real image present (r2l / encoded mode)
            tiles.append(("real_image", batch["image"][0]))
        for tag, arr in tiles:
            fn = f"{name}_{tag}.png"
            if tag == "input_label" and opt.label_nc > 0:
                # semantic mode: colorize the label map like the reference
                # gallery (util/util.py:27-35 tensor2label)
                from PIL import Image

                from cistar_tpu.utils.label_viz import tensor2label

                Image.fromarray(tensor2label(np.asarray(arr),
                                             opt.label_nc)).save(
                    os.path.join(gallery.img_dir, fn))
            else:
                array_to_pil(np.clip(denormalize(np.asarray(arr)), 0, 1)).save(
                    os.path.join(gallery.img_dir, fn))
            ims.append(fn), txts.append(tag), links.append(fn)
        gallery.add_header(f"process image... {name}")
        gallery.add_images(ims, txts, links, width=opt.display_winsize)
        print(f"process image... {batch['path'][0]}")


if __name__ == "__main__":
    main()
