"""Headline benchmark for the driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric: CycleGAN 256² radar→lidar inference throughput on a single
chip (9-block ResNet generator, the BASELINE.json throughput config). Both
engines are measured — the plain bf16 XLA path and the int8 MXU engine
(``ops/quant_pallas.py``; the reference's own fast-inference tier is
TensorRT int8, ``p2pHD/run_engine.py:160-165``) — and the HEADLINE is the
fastest *working* engine, so a kernel regression can never drag the
committed number below the bf16 floor. The int8 engine runs with
``expect_kernel=True``: a silent fallback to XLA emulation raises instead
of being quietly timed. If int8 measures slower than bf16 a regression
warning goes to stderr (that is a signal to fix kernels, not a number to
record). North-star target is ≥10,000 img/s on a v5e-8, i.e. 1,250
img/s/chip; ``vs_baseline`` is measured-throughput / per-chip-target.

Run: python bench.py  [--batch N] [--iters N] [--size 256]
                      [--engine best|int8|bf16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--blocks", type=int, default=9)
    p.add_argument("--features", type=int, default=64)
    p.add_argument("--engine", choices=["best", "int8", "bf16"],
                   default="best")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from cistar_tpu.models.cyclegan import ResnetGenerator
    from cistar_tpu.models.fast_infer import resnet_generator_int8_trunk_apply
    from cistar_tpu.ops.quant_pallas import quantize_resnet_trunk

    model = ResnetGenerator(output_nc=1, n_residual_blocks=args.blocks,
                            in_features=args.features)
    rng = np.random.RandomState(0)
    x_init = jnp.zeros((1, args.size, args.size, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x_init)["params"]
    qblocks = quantize_resnet_trunk(params, args.blocks)

    @jax.jit
    def infer_bf16(params, batch):
        # fp32 in/out signature so chained calls reuse one executable
        return model.apply({"params": params},
                           batch.astype(jnp.bfloat16)).astype(jnp.float32)

    @jax.jit
    def infer_int8(params, qblocks, batch):
        return resnet_generator_int8_trunk_apply(
            params, qblocks, batch.astype(jnp.bfloat16),
            args.blocks, expect_kernel=True).astype(jnp.float32)

    batch = jnp.asarray(rng.rand(args.batch, args.size, args.size, 1)
                        .astype(np.float32) * 2 - 1)

    # Disk-backed executable cache: repeat bench runs skip the 1-2 min
    # compiles (the XLA persistent cache is unusable on this backend).
    # Steady-state throughput is unaffected — only the warmup is. Failures
    # (e.g. a Mosaic regression) fall back to the plain jitted fn so the
    # engine-level error handling below still sees them at call time.
    from cistar_tpu.core.cache import exec_cache_compile

    def _try_cache(fn, fn_args, key):
        try:
            return exec_cache_compile(fn, fn_args, key=key, verbose=False)
        except Exception:
            return fn

    from cistar_tpu.models.fast_infer import ENGINE_REV

    if args.engine != "int8":
        infer_bf16 = _try_cache(infer_bf16, (params, batch),
                                f"bench_bf16:{args.blocks}:{args.features}")
    if args.engine != "bf16":
        # Experimental kernel-path env flags AND the engine code revision
        # must key the executable cache, or a flag flip / code change would
        # silently reload the previous configuration's binary.
        exp = (f":r{ENGINE_REV}"
               f":in{os.environ.get('CISTAR_FUSED_STAGE_IN', '0')}"
               f":hd{os.environ.get('CISTAR_HEAD_KERNEL', '-')}")
        infer_int8 = _try_cache(infer_int8, (params, qblocks, batch),
                                f"bench_int8:{args.blocks}:{args.features}"
                                + exp)

    # NOTE on timing: on the axon-tunneled TPU backend, block_until_ready
    # returns before execution finishes — only a host fetch synchronizes.
    # We chain calls (output feeds the next input, same dtype signature) and
    # force one tiny scalar fetch at the end, so the measured window contains
    # exactly N back-to-back device executions and a single RTT.
    def measure(f, *extra):
        x = f(*extra, batch)
        float(jnp.sum(x))  # compile + sync
        for _ in range(args.warmup):
            x = f(*extra, x)
        float(jnp.sum(x))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            x = f(*extra, x)
        float(jnp.sum(x))  # forces completion of the whole chain
        return args.batch * args.iters / (time.perf_counter() - t0)

    bf16_img_s = measure(infer_bf16, params) if args.engine != "int8" else None
    int8_img_s = None
    int8_error = None
    if args.engine != "bf16":
        try:
            int8_img_s = measure(infer_int8, params, qblocks)
        except Exception as e:  # expect_kernel raise / Mosaic compile failure
            int8_error = f"{type(e).__name__}: {e}"
            print(f"int8 engine failed, falling back to bf16: {int8_error}",
                  file=sys.stderr)
            if bf16_img_s is None:  # --engine int8: fall back for real
                bf16_img_s = measure(infer_bf16, params)

    candidates = {}
    if bf16_img_s is not None:
        candidates["bf16"] = bf16_img_s
    if int8_img_s is not None:
        candidates["int8"] = int8_img_s
    if not candidates:
        print(json.dumps({"metric": (f"cyclegan_resnet{args.blocks}"
                                     f"_{args.size}sq_infer_throughput"),
                          "value": 0,
                          "unit": "images/sec/chip", "vs_baseline": 0,
                          "error": int8_error}))
        return None
    best = max(candidates, key=candidates.get)
    images_per_sec = candidates[best]
    if int8_img_s is not None and bf16_img_s is not None \
            and int8_img_s < bf16_img_s:
        print(f"REGRESSION SIGNAL: int8 engine ({int8_img_s:.1f} img/s) is "
              f"slower than plain bf16 ({bf16_img_s:.1f} img/s) — the int8 "
              "kernels should always win at this shape", file=sys.stderr)

    # The metric name is stable regardless of which engine wins — tooling
    # that keys runs against BASELINE.json must not see a discontinuity when
    # the winner flips; the winning engine is in the "engine" field.
    per_chip_target = 10000.0 / 8.0  # v5e-8 north star, per chip
    result = {
        "metric": (f"cyclegan_resnet{args.blocks}_{args.size}sq"
                   f"_infer_throughput"),
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / per_chip_target, 3),
        "engine": best,
    }
    if bf16_img_s is not None:
        result["bf16_img_s"] = round(bf16_img_s, 1)
    if int8_img_s is not None:
        result["int8_img_s"] = round(int8_img_s, 1)
    if int8_error:
        result["int8_error"] = int8_error
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
