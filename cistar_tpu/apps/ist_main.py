"""Gatys IST batch CLI — parity with ``IST/main.py``.

Sweeps a directory of radar PNGs against one fixed lidar style image, with
optional polar / inverse-polar warping and an optional coarse-to-fine
high-resolution second pass. Per-frame timing is printed like the reference
(``IST/main.py:244-248``), but the optimization itself is one compiled XLA
program per frame size (compile once, reuse across the sweep).

Usage:
  python -m cistar_tpu.apps.ist_main --content-dir DIR --style-image F \
      --save-dir OUT [--config-file cfg.yaml] [--opts KEY VAL ...] \
      [--polar] [--hr] [--dtype bf16|fp32]
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU Gatys image style transfer")
    p.add_argument("--config-file", default="", help="YAML config overrides")
    p.add_argument("--content-dir", required=True, help="directory of content PNGs")
    p.add_argument("--style-image", required=True, help="style image path")
    p.add_argument("--save-dir", required=True)
    p.add_argument("--vgg-weights", default="", help="vgg_conv .pth/.npz (else random init)")
    p.add_argument("--polar", action="store_true", help="polar-warp before, inverse after")
    p.add_argument("--hr", action="store_true", help="coarse-to-fine high-res pass")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--platform", default="", choices=["", "cpu", "tpu", "axon"],
                   help="force a JAX platform (the baked sitecustomize pins the TPU)")
    p.add_argument("--max-iters", type=int, default=0, help="override LOSS.MAX_ITER")
    p.add_argument("--limit", type=int, default=0, help="process at most N frames")
    p.add_argument("--frames_per_batch", type=int, default=1,
                   help="vmap N frames into ONE compiled L-BFGS program "
                        "(aggregate frames/sec; the reference sweeps one "
                        "frame at a time, IST/main.py:186-238)")
    p.add_argument("--history", type=int, default=100,
                   help="L-BFGS history size (torch default 100; smaller "
                        "trades ~10%% speed at 1024^2 for a trajectory "
                        "deviation — fidelity delta in docs/DESIGN.md)")
    p.add_argument("--history_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="store the L-BFGS S/Y history at reduced precision "
                        "(halves optimizer HBM traffic)")
    p.add_argument("opts", nargs="*", default=[], help="KEY VALUE config overrides")
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms",
                          "axon" if args.platform == "tpu" else args.platform)

    from cistar_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    from cistar_tpu.core.config import get_ist_cfg_defaults
    from cistar_tpu.data.transforms import load_image, pil_polar_transform
    from cistar_tpu.engines.ist import GatysEngine
    from cistar_tpu.models import vgg as vgg_lib
    from cistar_tpu.utils.metrics import setup_logger

    cfg = get_ist_cfg_defaults()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    os.makedirs(args.save_dir, exist_ok=True)
    logger = setup_logger("style-transfer", args.save_dir, "log.txt")
    logger.info("config:\n%s", cfg.dump())

    if args.vgg_weights:
        if args.vgg_weights.endswith(".npz"):
            data = dict(np.load(args.vgg_weights))
            params = {}
            for k, v in data.items():
                layer, kind = k.rsplit(".", 1)
                params.setdefault(layer, {})["w" if kind == "weight" else "b"] = jnp.asarray(v)
        else:
            from cistar_tpu.core.torch_import import load_state_dict
            params = vgg_lib.torch_vgg_conv_to_params(load_state_dict(args.vgg_weights))
        logger.info("loaded VGG weights from %s", args.vgg_weights)
    else:
        params = vgg_lib.init_vgg_params(seed=0)
        logger.warning("no --vgg-weights given: using RANDOM VGG init "
                       "(outputs will not match the pretrained reference)")

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    engine = GatysEngine(cfg, params, compute_dtype=dtype,
                         history_size=args.history,
                         history_dtype=getattr(jnp, args.history_dtype))

    style_img = load_image(args.style_image, "RGB")
    content_list = sorted(glob.glob(os.path.join(args.content_dir, "*.png")))
    if args.limit:
        content_list = content_list[: args.limit]
    max_iters = args.max_iters or None

    from cistar_tpu.core.compile_guard import CompileWatchdog

    fpb = max(1, args.frames_per_batch)
    style_in = pil_polar_transform(style_img) if args.polar else style_img
    sweep_start = time.time()
    watchdog = CompileWatchdog("L-BFGS transfer program").start()
    try:
        for start in range(0, len(content_list), fpb):
            paths = content_list[start:start + fpb]
            t0 = time.time()
            content_imgs = []
            for path in paths:
                img = load_image(path, "RGB")
                if args.polar:
                    img = pil_polar_transform(img)
                content_imgs.append(img)
            if fpb == 1:
                outs = [engine.transfer_style(content_imgs[0], style_in,
                                              max_iters=max_iters)]
            else:
                outs = engine.transfer_style_batch(content_imgs, style_in,
                                                   max_iters=max_iters)
            watchdog.done()  # both drivers return fetched PIL images
            for path, content_img, out in zip(paths, content_imgs, outs):
                if args.hr:
                    out = engine.hr_transfer_style(content_img, style_in, out)
                if args.polar:
                    out = pil_polar_transform(out, reverse=True)
                name = os.path.basename(path)
                out.save(os.path.join(args.save_dir, name))
            dt = time.time() - t0
            logger.info("frames %d-%d/%d: %.3f s (%.3f s/frame)",
                        start + 1, start + len(paths), len(content_list),
                        dt, dt / max(1, len(paths)))
    finally:
        watchdog.done()  # empty directory must not leave the timer armed
    n = max(1, len(content_list))
    logger.info("avg seconds per frame: %.3f", (time.time() - sweep_start) / n)


if __name__ == "__main__":
    main()
