"""Per-op chip profile of the headline CycleGAN int8 engine (bench.py shape).

Prints the TRT-style per-op table plus a JSON summary; used to target the
round-5 kernel work (head conv, stage INs). Run:
    python tools/profile_headline.py [--batch 256] [--size 256]
"""
from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--blocks", type=int, default=9)
    p.add_argument("--features", type=int, default=64)
    p.add_argument("--engine", choices=["int8", "bf16"], default="int8")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--out", default=None)
    p.add_argument("--dump_hlo", default=None,
                   help="write the optimized HLO text here (maps the "
                        "profiler's fusion.N names to real ops)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.models.cyclegan import ResnetGenerator
    from cistar_tpu.models.fast_infer import resnet_generator_int8_trunk_apply
    from cistar_tpu.ops.quant_pallas import quantize_resnet_trunk
    from cistar_tpu.runtime.profiler import (format_op_table,
                                             profile_op_table)

    model = ResnetGenerator(output_nc=1, n_residual_blocks=args.blocks,
                            in_features=args.features)
    rng = np.random.RandomState(0)
    x_init = jnp.zeros((1, args.size, args.size, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x_init)["params"]
    qblocks = quantize_resnet_trunk(params, args.blocks)
    batch = jnp.asarray(rng.rand(args.batch, args.size, args.size, 1)
                        .astype(np.float32) * 2 - 1)

    if args.engine == "int8":
        @jax.jit
        def fn(batch):
            return resnet_generator_int8_trunk_apply(
                params, qblocks, batch.astype(jnp.bfloat16),
                args.blocks, expect_kernel=True).astype(jnp.float32)
    else:
        @jax.jit
        def fn(batch):
            return model.apply({"params": params},
                               batch.astype(jnp.bfloat16)).astype(jnp.float32)

    if args.dump_hlo:
        txt = fn.lower(batch).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"optimized HLO -> {args.dump_hlo} ({len(txt)} bytes)")

    rows, totals = profile_op_table(fn, batch, iters=args.iters)
    print(format_op_table(rows, totals, top=40))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows[:60], "totals": totals,
                       "config": vars(args)}, f, indent=1)


if __name__ == "__main__":
    main()
