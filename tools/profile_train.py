"""Per-op chip profile of the TRAIN steps (the four suite train configs).

VERDICT r4 #2: training MFU is 6-29% across the board and no train-step
per-op profile had been committed. This is the TRT-layer-profiler treatment
(reference role: ``p2pHD/run_engine.py:35-59``) applied to the jitted train
steps instead of the inference engines: capture an xprof trace of
steady-state steps and aggregate the device plane per-op, so the layout /
fusion / dtype offenders are named instead of guessed.

Run (real chip):
    python tools/profile_train.py --config unet512 [--dtype bf16] \
        [--out benchmarks/profile_train_unet512.json] [--dump_hlo F]

Configs mirror benchmarks/run_suite.py rows exactly (same engine args,
same batch/shape), so a profile here explains the corresponding suite row.
"""
from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def build(config: str, dtype):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    if config.startswith("cyclegan"):
        from cistar_tpu.engines.cyclegan import CycleGAN

        size, batch = 256, 4
        eng = CycleGAN(gen_type="p2p", in_features=64, n_residual_blocks=9,
                       image_size=size, batch_size=batch, min_points=1.0,
                       compute_dtype=dtype)
        state = eng.init_state(jax.random.PRNGKey(0), image_size=size)
        a = jnp.asarray(np.sign(rng.randn(batch, size, size, 1))
                        .astype(np.float32))
        b = jnp.asarray(np.sign(rng.randn(batch, size, size, 1))
                        .astype(np.float32))
        # same executable-cache key as benchmarks/run_suite.py so profiles
        # and suite runs share compiled binaries (identical engine + shapes)
        from benchmarks.run_suite import _cached_step
        step_c, _ = _cached_step(eng, f"suite_cyclegan:{size}:{batch}",
                                 state, a, b)
        hold = {"s": state}  # train_step DONATES the state buffer; thread it

        def step():
            hold["s"], m = step_c(hold["s"], a, b)
            return m
        return step, dict(size=size, batch=batch)

    from cistar_tpu.engines.p2phd import Pix2PixHD
    from cistar_tpu.losses.perceptual import make_vgg_loss

    size, net_g, num_d = {"p2phd512": (512, "global", 2),
                          "p2phd1024": (1024, "local", 3),
                          "unet512": (512, "UNet", 2)}[config]
    kw = {"n_blocks_global": 3} if net_g == "UNet" else {}
    eng = Pix2PixHD(net_g=net_g, ngf=32 if net_g == "local" else 64,
                    num_d=num_d, image_size=size, compute_dtype=dtype,
                    vgg_criterion=(make_vgg_loss()
                                   if net_g == "global" else None), **kw)
    state = eng.init_state(jax.random.PRNGKey(0), image_size=size)
    label = jnp.asarray(rng.rand(1, size, size, 1).astype(np.float32) * 2 - 1)
    image = jnp.asarray(rng.rand(1, size, size, 1).astype(np.float32) * 2 - 1)
    from benchmarks.run_suite import _cached_step
    mfu_engine = "bf16" if dtype == jnp.bfloat16 else "fp32"
    step_c, _ = _cached_step(eng, f"suite_p2phd:{net_g}:{size}:{num_d}:"
                             f"{mfu_engine}", state, label, None, image)
    hold = {"s": state}  # train_step DONATES the state buffer; thread it

    def step():
        hold["s"], m, _ = step_c(hold["s"], label, None, image)
        return m

    def lower():
        return type(eng).train_step.lower(eng, state, label, None, image)
    return step, dict(size=size, batch=1, net_g=net_g, num_d=num_d,
                      lower=lower)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True,
                   choices=["cyclegan256", "p2phd512", "p2phd1024",
                            "unet512"])
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--out", default=None)
    p.add_argument("--dump_hlo", default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    from cistar_tpu.runtime.profiler import format_op_table, profile_op_table

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    step, meta = build(args.config, dtype)
    if args.dump_hlo:
        lower = meta.pop("lower", None)
        if lower is None:
            p.error("--dump_hlo is only supported for the p2phd configs")
        txt = lower().compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"optimized HLO -> {args.dump_hlo} ({len(txt)} bytes)")
    meta.pop("lower", None)
    rows, totals = profile_op_table(step, iters=args.iters)
    print(format_op_table(rows, totals, top=40))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "totals": totals,
                       "config": {**vars(args), **meta}}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
